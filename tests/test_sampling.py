"""Deterministic split/sample tests: key-pure assignment, engine
agreement (verified against python hashlib), stable proportions."""

from __future__ import annotations

import hashlib

from streaming_data_pipeline_azure_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
)


def test_split_matches_reference_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    got = {
        r["k"]: r["split"]
        for r in train_test_split(df, "k", 0.25).collect()
    }
    for k in range(500):
        want = (
            "test"
            if hashlib.md5(str(k).encode()).hexdigest()[:8] < "40000000"
            else "train"
        )
        assert got[k] == want, k


def test_split_is_repartition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], ["k"])
    a = {r["k"]: r["split"] for r in train_test_split(df, "k", 0.1).collect()}
    b = {
        r["k"]: r["split"]
        for r in train_test_split(df.repartition(7), "k", 0.1).collect()
    }
    assert a == b


def test_sample_fraction_approximate(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], ["k"])
    n = deterministic_sample(df, "k", 0.2).count()
    assert 0.15 * 5000 <= n <= 0.25 * 5000


def test_cap_per_group_limits_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        cap_per_group,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(88)],
        "doc_id long, source string",
    )
    capped = cap_per_group(df, "source", "doc_id", 10)
    counts = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # the 80-row group is capped; the 8-row group keeps all rows
    assert counts == {"big": 10, "small": 8}
    ids1 = sorted(r["doc_id"] for r in capped.collect())
    ids2 = sorted(
        r["doc_id"] for r in cap_per_group(df, "source", "doc_id", 10).collect()
    )
    assert ids1 == ids2  # same survivors every run
    # survivors at k=5 nest inside survivors at k=10 (rank stability)
    ids5 = {r["doc_id"] for r in cap_per_group(df, "source", "doc_id", 5).collect()}
    assert ids5 <= set(ids1)


def test_sqrt_temperature_sample_rebalances_domains(spark):
    """alpha=0.5 mixing: the smallest domain keeps rate 1.0 (all rows);
    a domain 16x larger keeps ~1/4 of its rows; the kept set is a pure
    function of (id, domain counts) — rerun-identical."""
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        sqrt_temperature_rates,
        sqrt_temperature_sample,
    )

    rows = [(i, "big") for i in range(1600)] + [
        (10000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {r["lang"]: r["keep_rate"]
             for r in sqrt_temperature_rates(df, "lang").collect()}
    assert rates["small"] == 1.0
    assert rates["big"] == 0.25  # sqrt(100/1600)

    kept1 = {r["doc_id"] for r in sqrt_temperature_sample(df, "doc_id", "lang").collect()}
    kept2 = {r["doc_id"] for r in sqrt_temperature_sample(df, "doc_id", "lang").collect()}
    assert kept1 == kept2  # deterministic
    n_small = sum(1 for k in kept1 if k >= 10000)
    n_big = len(kept1) - n_small
    assert n_small == 100          # smallest domain intact
    assert 300 <= n_big <= 500     # ~0.25 * 1600 under the Knuth uniform


def test_assign_shards_deterministic_and_spread(spark):
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        assign_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(4000)], ["doc_id"])
    a = {r["doc_id"]: r["shard"] for r in assign_shards(df, "doc_id", 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in assign_shards(df, "doc_id", 8).collect()}
    assert a == b
    assert set(a.values()) == set(range(8))
    from collections import Counter
    sizes = Counter(a.values())
    # contiguous ids scatter near-uniformly: every shard within 25% of ideal
    assert all(abs(s - 500) < 125 for s in sizes.values()), sizes


def test_knuth_uniform_full_int64_domain(spark):
    """Overflow-safe over the WHOLE int64 key domain (ADVICE r4): keys
    past 2^63/A and negative keys must neither overflow (ANSI would
    throw) nor go negative, and must equal the big-int reference
    (key mod 2^32) * A mod 2^32 / 2^32 computed in Python."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        assign_shards,
        knuth_uniform,
    )

    keys = [
        0,
        1,
        4_000_000_000,           # > 2^63 / 2654435761 — old formula overflowed
        2**32 - 1,
        2**32,
        2**63 - 1,               # int64 max
        -1,
        -4_000_000_000,
        -(2**63),                # int64 min
    ]
    df = spark.createDataFrame([(k,) for k in keys], ["doc_id"])
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", knuth_uniform("doc_id").alias("u")
        ).collect()
    }
    for k in keys:
        ref = ((k % 2**32) * 2654435761 % 2**32) / 2**32
        assert got[k] == ref, (k, got[k], ref)
        assert 0.0 <= got[k] < 1.0
    # assign_shards never emits a negative or out-of-range shard
    shards = {
        r["shard"] for r in assign_shards(df, "doc_id", 8).collect()
    }
    assert shards <= set(range(8)), shards
    # ANSI mode would have raised on the old formula; prove it stays safe
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df.select(knuth_uniform("doc_id")).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_knuth_uniform_matches_duckdb_oracle_fragment(spark):
    """The DuckDB SQL fragment used by the shard/alpha oracles computes
    bit-identical uniforms to the Spark column across the int64 domain."""
    import duckdb

    import __spark_entry__ as se
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        knuth_uniform,
    )

    keys = [0, 1, 7, 4_000_000_000, 2**32, 2**63 - 1, -1, -(2**63)]
    df = spark.createDataFrame([(k,) for k in keys], ["doc_id"])
    spark_vals = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", knuth_uniform("doc_id").alias("u")
        ).collect()
    }
    con = duckdb.connect()
    for k in keys:
        (duck,) = con.execute(
            f"SELECT {se._knuth_sql(str(k))}"
        ).fetchone()
        assert spark_vals[k] == duck, (k, spark_vals[k], duck)


def test_priority_sample_weighted_and_deterministic(spark):
    from streaming_data_pipeline_azure_spark.operators import sampling

    rows = [(i, 1.0) for i in range(1, 200)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sampling.priority_sample(df, "id", "w", 20)
    ids = {r["id"] for r in got.collect()}
    assert len(ids) == 20
    assert 999 in ids  # the heavy row enters (priority >= w = 1e9)
    again = {
        r["id"]
        for r in sampling.priority_sample(df.repartition(7), "id", "w", 20).collect()
    }
    assert again == ids  # key-pure: partitioning-independent


def test_priority_sample_estimator_accuracy_and_plan(spark):
    from streaming_data_pipeline_azure_spark.operators import sampling
    from streaming_data_pipeline_azure_spark.plans.inspect import physical_plan

    rows = [(i, float((i * 37) % 100 + 1)) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "id long, w double")
    true_total = sum(w for _, w in rows)
    est = sampling.priority_sample_estimate(df, "id", "w", 200).collect()[0]
    assert est["n_sampled"] == 200 and est["threshold"] > 0
    assert abs(est["est_total"] - true_total) / true_total < 0.15, (
        est["est_total"],
        true_total,
    )
    plan = physical_plan(sampling.priority_sample(df, "id", "w", 10))
    assert "TakeOrderedAndProject" in plan, plan


def test_priority_sample_small_population_no_threshold(spark):
    """k >= n: everything is sampled, threshold 0, estimate exact."""
    from streaming_data_pipeline_azure_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, 5.0)], "id long, w double"
    )
    est = sampling.priority_sample_estimate(df, "id", "w", 10).collect()[0]
    assert est["n_sampled"] == 3
    assert est["threshold"] == 0.0
    assert est["est_total"] == 10.0


def test_priority_sample_weight_monotonicity(spark):
    """Raising one row's weight can never evict it from the sample
    (its priority scales with w while every other priority is fixed) —
    the defining monotonicity of weighted sampling schemes."""
    from streaming_data_pipeline_azure_spark.operators import sampling

    rows = [(i, float((i * 13) % 7 + 1)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, w double")
    base_ids = {
        r["id"] for r in sampling.priority_sample(df, "id", "w", 15).collect()
    }
    target = sorted(base_ids)[0]
    from pyspark.sql import functions as F

    boosted = df.withColumn(
        "w",
        F.when(F.col("id") == target, F.col("w") * 100).otherwise(F.col("w")),
    )
    boosted_ids = {
        r["id"]
        for r in sampling.priority_sample(boosted, "id", "w", 15).collect()
    }
    assert target in boosted_ids


def test_priority_sample_per_group_semantics(spark):
    """Per-group sampling must (a) keep exactly min(k, group size) rows
    per group, (b) select within each group the SAME rows a global
    priority_sample restricted to that group would, and (c) be
    partition-invariant."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators import sampling

    df = spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") % 17 + 1).cast("double").alias("w"),
    )
    out = sampling.priority_sample_per_group(df, "grp", "k", "w", 10)
    rows = out.collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], set()).add(r["k"])
    assert set(by_grp) == {"0", "1", "2"}
    assert all(len(v) == 10 for v in by_grp.values())

    for g in ("0", "1", "2"):
        solo = {
            r["k"]
            for r in sampling.priority_sample(
                df.filter(F.col("grp") == g), "k", "w", 10
            ).collect()
        }
        assert by_grp[g] == solo, g

    re_part = {
        (r["grp"], r["k"])
        for r in sampling.priority_sample_per_group(
            df.repartition(7), "grp", "k", "w", 10
        ).collect()
    }
    assert re_part == {(r["grp"], r["k"]) for r in rows}

    # small group: fewer rows than k -> keep all of them
    small = df.filter((F.col("grp") == "0") & (F.col("k") < 9))
    kept = sampling.priority_sample_per_group(small, "grp", "k", "w", 10)
    assert kept.count() == small.count()


def test_bottomk_merge_parity_and_uniformity(spark):
    """Bottom-k is mergeable state: partials of ANY slicing merge to
    the bit-identical one-pass sample; the sample is a pure function
    of the id set (partition-invariant); and as a uniform sampler the
    keep-rate of an id range tracks its share of the population."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        bottomk_sample,
        merge_bottomk,
    )

    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    direct = sorted(
        tuple(r) for r in bottomk_sample(df, "k", 500).collect()
    )
    parts = [
        bottomk_sample(df.filter(f"k % 4 = {i}"), "k", 500) for i in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = sorted(
        tuple(r) for r in merge_bottomk(u, "k", 500).collect()
    )
    assert merged == direct and len(direct) == 500

    repart = sorted(
        tuple(r)
        for r in bottomk_sample(df.repartition(13), "k", 500).collect()
    )
    assert repart == direct

    # plans as per-partition heaps, never a global sort
    plan = bottomk_sample(df, "k", 500)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    # uniformity: the first half of the id domain should hold ~half
    # the sample (binomial(500, .5): +/-5 sigma ~ 56)
    first_half = sum(1 for k, _ in direct if k < 10_000)
    assert 194 <= first_half <= 306, first_half


def test_neyman_allocation_hamilton_and_clamp(spark):
    """Quotas follow N_h*S_h, integers sum to total_n via largest
    remainder, zero-variance and singleton strata get 0, allocations
    clamp to the population."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        allocated_sample,
        neyman_allocation,
    )

    rows = []
    # 'wide': 100 rows, high spread; 'tight': 200 rows, low spread;
    # 'flat': constant (std 0); 'solo': one row
    for i in range(100):
        rows.append(("wide", float((i % 10) * 100)))
    for i in range(200):
        rows.append(("tight", float(i % 2)))
    for _ in range(50):
        rows.append(("flat", 7.0))
    rows.append(("solo", 3.0))
    df = spark.createDataFrame(rows, "stratum string, v double")
    got = {
        r["stratum"]: r
        for r in neyman_allocation(df, "stratum", "v", 60).collect()
    }
    assert got["flat"]["alloc_n"] == 0
    assert got["solo"]["alloc_n"] == 0
    assert got["wide"]["alloc_n"] + got["tight"]["alloc_n"] == 60
    # wide has ~300x the std on half the rows: dominates
    assert got["wide"]["alloc_n"] > got["tight"]["alloc_n"]

    # clamp: tiny stratum with huge variance cannot exceed its size
    few = spark.createDataFrame(
        [("big", float(i % 5)) for i in range(1000)]
        + [("rare", 0.0), ("rare", 1e6)],
        "stratum string, v double",
    )
    a = {
        r["stratum"]: r["alloc_n"]
        for r in neyman_allocation(few, "stratum", "v", 100).collect()
    }
    assert a["rare"] == 2  # clamped to population, not redistributed

    # the draw honors the allocation exactly and is deterministic
    alloc = neyman_allocation(df, "stratum", "v", 60)
    keyed = df.withColumn(
        "k", F.monotonically_increasing_id()
    ).localCheckpoint()
    s1 = allocated_sample(keyed, "stratum", "k", alloc)
    sizes = {
        r["stratum"]: r["n"]
        for r in s1.groupBy("stratum").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    expected = {
        s: r["alloc_n"] for s, r in got.items() if r["alloc_n"] > 0
    }
    assert sizes == expected
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, allocated_sample(keyed, "stratum", "k", alloc).collect())
    )


def test_ring_negative_samples_contract(spark):
    """Exactly k negatives per query, never a positive, deterministic
    across runs, buffer absorbs positive-saturated windows, wrap
    guard raises."""
    import pytest as _pytest

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        ring_negative_samples,
    )

    items = spark.createDataFrame(
        [(i,) for i in range(40)], "item_id long"
    )
    queries = spark.createDataFrame(
        [(q,) for q in range(12)], "query_id long"
    )
    # every query's positives: 6 spread items
    pos = spark.createDataFrame(
        [(q, (q * 7 + j * 5) % 40) for q in range(12) for j in range(6)],
        "query_id long, item_id long",
    ).distinct()
    out = ring_negative_samples(
        queries, items, pos, k=5, buffer=10
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["neg_rank"], r["item_id"])
        )
    pos_set = {(r["query_id"], r["item_id"]) for r in pos.collect()}
    assert set(by_q) == set(range(12))
    for q, lst in by_q.items():
        assert sorted(r for r, _ in lst) == [1, 2, 3, 4, 5]
        for _, item in lst:
            assert (q, item) not in pos_set
    # deterministic
    again = ring_negative_samples(
        queries, items, pos, k=5, buffer=10
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    with _pytest.raises(ValueError, match="wrap"):
        ring_negative_samples(queries, items, pos, k=30, buffer=20)


def test_match_distribution_uniform_and_targeted(spark):
    """Uniform target: binding (smallest) group keeps everything, others
    downsample toward its size; explicit shares: zero-share groups drop,
    kept set is key-pure deterministic (two runs identical)."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        match_distribution,
    )

    rows = [(i, "big" if i < 400 else "small") for i in range(450)]
    df = spark.createDataFrame(rows, "id long, g string")
    kept = match_distribution(df, "id", "g")
    counts = {r["g"]: r["n"] for r in
              kept.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["small"] == 50          # binding group keeps all
    assert 20 <= counts["big"] <= 90      # ~50 in expectation
    again = match_distribution(df, "id", "g")
    assert sorted(r["id"] for r in kept.collect()) == sorted(
        r["id"] for r in again.collect()
    )
    only_small = match_distribution(df, "id", "g", {"small": 1.0})
    got = {r["g"] for r in only_small.collect()}
    assert got == {"small"}
    import pytest

    with pytest.raises(ValueError):
        match_distribution(df, "id", "g", {"small": 0.0})


def test_sample_size_sweep_nested_and_monotone(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        sample_size_sweep,
    )

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    out = {
        r["pct"]: r
        for r in sample_size_sweep(df, "k", "v").collect()
    }
    assert out[100]["n_rows"] == 5000
    # nested thresholds -> counts monotone in pct
    ns = [out[p]["n_rows"] for p in (1, 2, 5, 10, 25, 50, 100)]
    assert ns == sorted(ns)
    # uniformity sanity: 10% sample within 3x of expectation
    assert 150 <= out[10]["n_rows"] <= 1500


def test_rendezvous_rebalance_moves_about_one_over_n(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        rendezvous_rebalance_report,
    )

    df = spark.range(0, 9000).select(F.col("id").alias("k"))
    (r,) = rendezvous_rebalance_report(df, "k").collect()
    assert r["n_keys"] == 9000
    # rendezvous: ~1/9 ≈ 11.1% moved (loose band), modulo: ~8/9 ≈ 89%
    assert 0.07 * 9000 <= r["moved_rendezvous"] <= 0.16 * 9000
    assert r["moved_mod"] >= 0.8 * 9000
    assert r["moved_rendezvous"] < r["moved_mod"] / 5


def test_rendezvous_assignment_is_stable_for_unmoved_keys(spark):
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        _rendezvous_assign,
    )

    # growing the ring must NEVER reassign a key between two OLD
    # shards — a moved key can only move TO the new shard (the
    # monotone property that makes rendezvous "consistent")
    df = spark.range(0, 3000).select(F.col("id").alias("k"))
    out = df.select(
        _rendezvous_assign("k", 8).alias("b"),
        _rendezvous_assign("k", 9).alias("a"),
    ).collect()
    for r in out:
        if r["b"] != r["a"]:
            assert r["a"] == 8, (r["b"], r["a"])


def test_preference_pairs_hand_case(spark):
    """Max-margin pair per bucket with id tie-breaks: chosen = max
    score then MIN id; rejected = min score among the rest; singleton
    buckets absent; an all-tied 2-item bucket still forms a (0-margin)
    pair."""
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        preference_pairs,
    )

    df = spark.createDataFrame(
        [("b1", 1, 5), ("b1", 2, 9), ("b1", 3, 9),
         ("b2", 7, 4),
         ("b3", 1, 7), ("b3", 2, 7)],
        "bucket string, id long, s long",
    )
    rows = {r["bucket"]: r for r in
            preference_pairs(df, "bucket", "id", "s").collect()}
    assert set(rows) == {"b1", "b3"}  # singleton b2 absent
    b1 = rows["b1"]
    assert (b1["chosen_id"], b1["rejected_id"]) == (2, 1)
    assert (b1["chosen_score"], b1["rejected_score"]) == (9, 5)
    assert b1["margin"] == 4 and b1["n_items"] == 3
    b3 = rows["b3"]
    assert (b3["chosen_id"], b3["rejected_id"]) == (1, 2)
    assert b3["margin"] == 0


def test_preference_pairs_excludes_null_scores(spark):
    """A NULL score must never be picked as the 'rejected' item
    (Spark ranks NULLS FIRST ascending — the worst item is the lowest
    NON-NULL score) and does not count toward n_items."""
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        preference_pairs,
    )

    df = spark.createDataFrame(
        [("b", 1, 9), ("b", 2, 3), ("b", 3, None)],
        "bucket string, id long, s long",
    )
    [r] = preference_pairs(df, "bucket", "id", "s").collect()
    assert (r["chosen_id"], r["rejected_id"]) == (1, 2)
    assert r["rejected_score"] == 3 and r["margin"] == 6
    assert r["n_items"] == 2


def test_dsir_importance_weights_hand_replay(spark):
    """r12: per-doc weight replays exactly in python (same smoothed
    ratios, same position-ordered left fold), and docs made of
    target-heavy grams outweigh off-target docs."""
    import pytest
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        dsir_importance_weights,
    )

    rows = [
        (1, True, "alpha beta alpha beta alpha"),
        (2, True, "alpha beta gamma alpha beta"),
        (3, False, "delta epsilon delta epsilon delta"),
        (4, False, "alpha beta alpha beta gamma"),  # target-like raw doc
        (5, False, "zeta"),  # single token -> no bigram -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, is_t boolean, text string")
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            df, "doc_id", "text", target_filter=F.col("is_t"), n_buckets=64
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}

    # python replay
    B = 64
    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    grams = {}  # doc -> [bucket,...] in position order
    for did, is_t, text in rows:
        toks = text.lower().split()
        grams[did] = (is_t, [bucket(" ".join(toks[i:i + 2]))
                             for i in range(len(toks) - 1)])
    cs, ct = {}, {}
    for did, (is_t, bs) in grams.items():
        for b in bs:
            cs[b] = cs.get(b, 0) + 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
    S = sum(cs.values())
    T = sum(ct.values())
    for did, (is_t, bs) in grams.items():
        if not bs:
            continue
        w = 1.0
        for b in bs:
            w = w * ((float(ct.get(b, 0) + 1) * (float(S) + 64.0))
                     / (float(cs[b] + 1) * (float(T) + 64.0)))
        assert out[did]["weight"] == w, (did, out[did]["weight"], w)
        assert out[did]["n_grams"] == len(bs)
    # the target-like raw doc outweighs the off-target doc
    assert out[4]["weight"] > out[3]["weight"]
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance_weights(
            df, "doc_id", "text", target_filter=F.col("is_t"), n_buckets=0
        )


def test_token_budget_selection_invariants(spark):
    """r12: (a) selected token mass never exceeds the integer budget,
    (b) the selection is maximal in the declared order — the first
    unselected doc in (bucket desc, doc_id asc) order would cross the
    budget, (c) higher-bucket docs are never dropped in favor of
    lower-bucket docs, (d) guards."""
    import pytest

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        token_budget_selection,
    )

    # diversity d/t spread: repeated words lower the bucket
    rows = [
        (i, " ".join(f"w{j}" for j in range(10)) if i % 3 == 0
         else "dup " * 9 + f"tail{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_budget_selection(df, budget_pct=40, n_buckets=1000).collect()
    total = sum(r["n_tokens"] for r in out)
    budget = total * 40 // 100
    sel = [r for r in out if r["selected"]]
    assert sum(r["n_tokens"] for r in sel) <= budget
    # maximality: walk docs in selection order; selected must be the
    # exact greedy prefix-with-skips of the boundary rule
    ordered = sorted(out, key=lambda r: (-r["quality_bucket"], r["doc_id"]))
    cum, expect = 0, {}
    by_bucket = {}
    for r in ordered:
        by_bucket.setdefault(r["quality_bucket"], []).append(r)
    for b in sorted(by_bucket, reverse=True):
        btok = sum(r["n_tokens"] for r in by_bucket[b])
        if cum + btok <= budget:
            for r in by_bucket[b]:
                expect[r["doc_id"]] = True
            cum += btok
        elif cum < budget:
            # STRICT positional prefix (the operator's rule): the
            # cumsum counts every preceding doc in id order, so the
            # first doc crossing the line also blocks later smaller
            # docs — no skip-ahead packing (deterministic contiguous
            # prefix; skip-greedy would make the boundary set depend
            # on doc-size interleavings)
            dcum = 0
            for r in by_bucket[b]:
                expect[r["doc_id"]] = dcum + r["n_tokens"] <= budget - cum
                dcum += r["n_tokens"]
            cum += btok
        else:
            for r in by_bucket[b]:
                expect[r["doc_id"]] = False
    for r in out:
        assert r["selected"] == expect[r["doc_id"]], r
    assert any(r["selected"] for r in out)
    assert any(not r["selected"] for r in out)
    with pytest.raises(ValueError, match="budget_pct"):
        token_budget_selection(df, budget_pct=101)
    with pytest.raises(ValueError, match="n_buckets"):
        token_budget_selection(df, n_buckets=0)


def test_budget_selection_by_source_consistency(spark):
    """r12: the per-source mixture report must tie out exactly with
    the underlying selection — same totals, and a source whose docs
    are all low-diversity keeps a smaller token share than one with
    high-diversity docs (the mixture-shift the report exists to
    expose)."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        token_budget_selection,
    )

    rows = [
        (i, "srcA", " ".join(f"w{i}x{j}" for j in range(10)))
        for i in range(10)
    ] + [
        (100 + i, "srcB", "dup " * 9 + f"t{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sel = token_budget_selection(df, budget_pct=50, n_buckets=1000)
    report = (
        sel.join(df.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum(F.col("selected").cast("long")).alias("n_sel"),
            F.sum(F.when(F.col("selected"), F.col("n_tokens")).otherwise(0)).alias("tok_sel"),
            F.sum("n_tokens").alias("tok"),
        )
    ).collect()
    r = {x["source"]: x for x in report}
    total_sel = sum(x["tok_sel"] for x in report)
    budget = sum(x["tok"] for x in report) * 50 // 100
    assert total_sel <= budget
    # high-diversity srcA dominates the kept mix
    assert r["srcA"]["tok_sel"] / r["srcA"]["tok"] > r["srcB"]["tok_sel"] / r["srcB"]["tok"]
    assert r["srcA"]["n_sel"] == 10  # all of srcA fits in half the budget
