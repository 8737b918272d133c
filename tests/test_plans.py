"""Physical-plan regression tests: a correct-but-shuffling plan is a
regression at 100 TB even when results match. These pin the plan
properties the engine's scale story depends on."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators import (
    relational,
    similarity,
    text as tx,
)
from streaming_data_pipeline_azure_spark.operators.enrich import enrich_orders
from streaming_data_pipeline_azure_spark.plans.inspect import physical_plan


def _enriched(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return enrich_orders(
        orders, customer,
        order_id_col="o_orderkey", customer_fk_col="o_custkey",
        amount_col="o_totalprice", customer_pk_col="c_custkey",
        customer_name_col="c_name", city_col="c_mktsegment",
    )


def test_city_filter_pushes_through_join_to_scan(spark, sf_dir):
    """F1 on the joined view must reach the customer parquet scan as a
    pushed filter — at scale this skips row groups before the join."""
    df = relational.filter_by_city(_enriched(spark, sf_dir), "BUILDING")
    plan = physical_plan(df)
    assert re.search(r"PushedFilters:.*c_mktsegment.*BUILDING", plan), plan


def test_projection_prunes_parquet_columns(spark, sf_dir):
    """token_stats reads a 2-column slice of documents — the scan schema
    must not include lang/source/n_chars."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select("doc_id", tx.token_count("text").alias("n_tokens"))
    plan = physical_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, cols


def test_topk_avoids_global_sort(spark, sf_dir):
    """Brute-force top-k must plan as TakeOrderedAndProject (per-partition
    heaps), never a full Sort + Exchange of the corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = similarity.topk_bruteforce(emb, "embedding", [0.0] * 64, k=10)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_groupby_has_partial_aggregation(spark, sf_dir):
    """A2/A3 shapes must partial-aggregate map-side: two HashAggregate
    nodes around one Exchange, so shuffle volume is O(groups) not O(rows)."""
    df = relational.avg_purchase_by_city(_enriched(spark, sf_dir))
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan, plan


def test_enrichment_join_never_shuffles_stream_side(spark, sf_dir):
    """The orders side of J1 must not appear below an Exchange — broadcast
    of the dimension is the whole scale story for the flagship join."""
    plan = physical_plan(_enriched(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the only Exchange allowed is the BroadcastExchange of the dimension
    exchanges = re.findall(r"(\w*Exchange)", plan)
    assert set(exchanges) <= {"BroadcastExchange"}, exchanges


def test_scalar_agg_is_two_phase(spark, sf_dir):
    """A1 (whole-table AVG) must reduce per-partition then merge — a
    single-partition pre-shuffle would serialize the scan."""
    df = relational.avg_purchase(_enriched(spark, sf_dir), "BUILDING")
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_skewed_join_query_uses_salted_path(spark, sf_dir):
    """The registered skewed_join_totals query must actually run through
    salted_join: the join keys include the deterministic salt (xxhash64
    on the big side, an exploded salt sequence replicating the dim), so
    the hot key's rows spread over n_salts tasks instead of one
    straggler."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["skewed_join_totals"](spark, sf_dir)
    plan = physical_plan(df)
    assert "xxhash64" in plan, plan
    assert re.search(r"[Ee]xplode", plan), plan
    # still an equi-join on (key, salt) — not a degenerate cross product
    assert "CartesianProduct" not in plan, plan


def test_incremental_dedup_corpus_stays_narrow(spark, sf_dir):
    """dedup_incremental's corpus side must collapse to a broadcast
    DISTINCT fingerprint set before the anti-join — the corpus scan reads
    only the fingerprint inputs (text [+ the source split column]), never
    doc_id/lang/n_chars, and the batch side anti-joins without an
    exchange of its own."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["dedup_incremental"](spark, sf_dir)
    plan = physical_plan(df)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    narrow = [s for s in schemas if "doc_id" not in s and "text" in s]
    assert narrow, schemas  # at least one corpus scan pruned to fp inputs


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    """The corpus side of decontamination must probe a broadcast of the
    eval grams — a shuffle of the corpus' exploded n-grams would be the
    dominant cost at scale. Also: exactly one Exchange (the final
    per-doc count), nothing shuffles pre-join."""
    from streaming_data_pipeline_azure_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    plan = physical_plan(corpus.ngram_overlap(train, ev, n=5))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # formatted mode renders each shuffle as an "(N) Exchange" block
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    # one for the eval-side distinct, one for the final per-doc count;
    # the exploded corpus grams themselves never hash-partition
    assert 1 <= n_exchanges <= 2, plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    from streaming_data_pipeline_azure_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = physical_plan(corpus.chunk_documents(docs))
    assert "Exchange" not in plan, plan


def test_quantization_is_shuffle_free(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = physical_plan(
        similarity.quantize_int8_stats(emb, "vec_id", "embedding")
    )
    assert "Exchange" not in plan, plan


def test_centroids_aggregate_partially_before_shuffle(spark, sf_dir):
    """Element sums must collapse map-side (partial_sum before the
    exchange) so the shuffle carries (group, dim) partials, not every
    exploded element."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = physical_plan(
        similarity.groupwise_centroids(emb, "label", "embedding")
    )
    assert "partial_sum" in plan, plan


def test_skewed_agg_query_uses_two_phase_salted_path(spark, sf_dir):
    """The registered skewed_agg_totals query must actually take the
    salted path: a deterministic xxhash64 row salt and two hash
    aggregations (per-(key,salt) then per-key merge) across two
    exchanges — not a single-stage group-by on the hot key."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        str(pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    plan = physical_plan(mod._skewed_agg_totals(spark, sf_dir))
    assert "xxhash64" in plan, plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 2, plan
    assert re.search(r"hashpartitioning\(grp_key\S* __salt", plan), plan


def test_incremental_neardup_probe_reads_only_index(spark, tmp_path):
    """MinHashCorpusIndex probe (VERDICT r2 #1): the corpus participates
    ONLY through its persisted signature index — every parquet scan in
    the probe plan points at the index directory (the corpus text is
    never re-read), the batch side broadcasts into both corpus-side
    joins, and nothing sort-merge-joins (zero corpus shuffle)."""
    from streaming_data_pipeline_azure_spark.operators import dedup

    docs = [(i, f"corpus document number {i} about topic {i % 7} with shared words") for i in range(40)]
    idx = dedup.MinHashCorpusIndex(str(tmp_path / "idx"), "doc_id", threshold=0.5)
    idx.build(spark.createDataFrame(docs, ["doc_id", "text"]), "text")

    batch = spark.createDataFrame(
        [(100 + i, f"new crawl delta doc {i} with some shared words") for i in range(5)],
        ["doc_id", "text"],
    )  # local relation: any parquet scan in the plan must be the index
    plan = physical_plan(idx.probe_pairs(batch, "text"))
    locations = re.findall(r"Location:.*\[(.*)\]", plan)
    parquet_locs = [loc for loc in locations if loc]
    assert parquet_locs, plan
    for loc in parquet_locs:
        assert str(tmp_path / "idx") in loc, (loc, plan)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_gram_index_scrub_reads_only_index(spark, tmp_path):
    """GramCorpusIndex.scrub (r5): the corpus participates ONLY through
    its persisted gram-hash set — every parquet scan in the probe plan
    points at the index directory, the delta side broadcasts into the
    index scan and the matched hashes broadcast back, and nothing
    sort-merge-joins (zero corpus shuffle per delta)."""
    from streaming_data_pipeline_azure_spark.operators import corpus

    docs = [(i, f"corpus document number {i} about topic {i % 7} with shared words")
            for i in range(40)]
    idx = corpus.GramCorpusIndex(str(tmp_path / "gidx"), n=5)
    idx.build(spark.createDataFrame(docs, ["doc_id", "text"]), "doc_id", "text")

    batch = spark.createDataFrame(
        [(100 + i, f"new crawl delta doc {i} with some shared words") for i in range(5)],
        ["doc_id", "text"],
    )  # local relation: any parquet scan in the plan must be the index
    plan = physical_plan(idx.scrub(batch, "doc_id", "text"))
    locations = re.findall(r"Location:.*\[(.*)\]", plan)
    parquet_locs = [loc for loc in locations if loc]
    assert parquet_locs, plan
    for loc in parquet_locs:
        assert str(tmp_path / "gidx") in loc, (loc, plan)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_ivf_probe_pairs_reads_only_index_partitions(spark, tmp_path):
    """IvfIndex.probe_pairs (VERDICT r3 #2): the corpus participates ONLY
    through its persisted IVF layout — every parquet scan in the probe
    plan points at the index directory (the source table is never
    re-read), the vectors scan is partition-pruned to the probed
    centroids, the batch side broadcasts into the corpus-side join, and
    nothing sort-merge-joins (zero corpus shuffle)."""
    from streaming_data_pipeline_azure_spark.operators import similarity

    rows = [
        (i, [float(10.0 * (i % 4 == d)) + 0.01 * ((i * 7 + d) % 5)
             for d in range(8)])
        for i in range(64)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), dim=8, n_planes=3, seed=5)
    idx.build(corpus, "embedding")

    batch = spark.createDataFrame(
        rows[:4], "vec_id long, embedding array<double>"
    )  # local relation: any parquet scan in the plan must be the index
    plan = physical_plan(idx.probe_pairs(batch, threshold=0.9, n_probe=2))
    locations = re.findall(r"Location:.*\[(.*)\]", plan)
    parquet_locs = [loc for loc in locations if loc]
    assert parquet_locs, plan
    for loc in parquet_locs:
        assert str(tmp_path / "ivf") in loc, (loc, plan)
    assert re.search(r"PartitionFilters: \[.*centroid_id", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_exact_anchor_probes_never_shuffle_corpus_side(spark, sf_dir):
    """The corpus-probe stage of both incremental exact anchors keeps the
    batch side broadcast — the anchors' linear-per-delta cost is the
    corpus SCAN, never a corpus join shuffle. (The subsequent
    within-batch dedup pass shuffles only the delta, which is out of
    this contract.)"""
    import importlib.util
    import pathlib

    from streaming_data_pipeline_azure_spark.operators import dedup

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        str(pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    corpus, batch = mod._doc_delta_split(spark, sf_dir)
    text_plan = physical_plan(
        dedup.batch_corpus_jaccard_pairs(corpus, batch, "doc_id", "text")
    )
    assert "SortMergeJoin" not in text_plan, text_plan
    assert text_plan.count("BroadcastHashJoin") >= 2, text_plan

    emb_plan = physical_plan(
        mod._embedding_neardup_incremental_exact(spark, sf_dir)
    )
    # the cosine kernel is mapInPandas over the corpus scan; the only
    # join is the broadcast anti-join dropping matched batch rows
    assert "SortMergeJoin" not in emb_plan, emb_plan
    assert re.search(r"BroadcastHashJoin .*LeftAnti", emb_plan), emb_plan


def test_no_cartesian_products_across_query_surface(spark, sf_dir):
    """Plan-regression guard: none of the representative queries may
    plan a CartesianProduct (a non-broadcast cross join — the one join
    shape that is always a scale-killer). Broadcast nested-loop joins
    against one-row stat frames are fine and not flagged. Runs on plan
    generation only (no noop execution), so the sweep stays cheap."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    # representative non-index-backed queries across every operator
    # family (index probes have their own dedicated plan tests)
    names = [
        "enriched_orders", "pricing_summary", "orders_by_nation",
        "nation_trade_flows", "nation_market_share", "skewed_join_totals",
        "skewed_agg_totals", "events_sessionized", "events_in_sessions",
        "asof_latest_click", "funnel_conversion", "cohort_retention",
        "span_dedup", "span_decontaminate", "source_mirror_overlap",
        "bm25_search", "hybrid_search", "dedup_jaccard_exact",
        "dedup_incremental", "embedding_neardup_exact", "similarity_topk",
        "multiquery_topk", "pack_documents", "tfidf_top_terms",
        "decontaminate_ngrams", "cross_doc_repetition", "price_histogram",
        "daily_gapfill", "user_activity_similarity", "compression_stats",
        # r5 continuation
        "scd2_order_status", "cdc_apply_snapshot", "fuzzy_customer_pairs",
        "pq_codes", "event_transitions", "events_value_outliers",
        "copurchase_lift", "priority_sample_orders",
        "priority_sample_estimate", "copurchase_graph_stats",
        "top_session_paths", "price_trend_regression", "decontaminate_bloom",
    ]
    queries = entry.queries()
    offenders = {}
    for name in names:
        plan = physical_plan(queries[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders[name] = plan.splitlines()[0]
    assert not offenders, offenders
