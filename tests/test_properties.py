"""Property-based tests (hypothesis): algebraic invariants that must hold
for arbitrary inputs, not just fixtures. Example counts are kept small
because each example runs a Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.vector import (
    cosine_similarity,
    literal_vector,
    to_double_array,
)
from streaming_data_pipeline_azure_spark.operators.dedup import exact_dedup, jaccard
from streaming_data_pipeline_azure_spark.operators.skew import salted_groupby_agg
from streaming_data_pipeline_azure_spark.operators.temporal import asof_join

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(alphabet="abcde ", min_size=0, max_size=12)
vecs = st.lists(
    st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=4
)


@SETTINGS
@given(a=st.lists(words, max_size=8), b=st.lists(words, max_size=8))
def test_jaccard_bounds_and_symmetry(spark, a, b):
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    [r] = df.select(
        jaccard(F.col("a"), F.col("b")).alias("ab"),
        jaccard(F.col("b"), F.col("a")).alias("ba"),
        jaccard(F.col("a"), F.col("a")).alias("aa"),
    ).collect()
    assert 0.0 <= r["ab"] <= 1.0
    assert r["ab"] == r["ba"]
    assert r["aa"] == (1.0 if set(a) else 0.0)


@SETTINGS
@given(v=vecs, w=vecs)
def test_cosine_bounds(spark, v, w):
    df = spark.createDataFrame([(v,)], "v array<float>")
    [r] = df.select(
        cosine_similarity(to_double_array(F.col("v")), literal_vector(w)).alias("c"),
        cosine_similarity(
            to_double_array(F.col("v")), literal_vector(v)
        ).alias("self"),
    ).collect()
    assert -1.0 - 1e-9 <= r["c"] <= 1.0 + 1e-9
    if any(x != 0.0 for x in v):
        assert abs(r["self"] - 1.0) < 1e-6


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_exact_dedup_keeps_min_id_per_key(spark, rows):
    df = spark.createDataFrame(
        [(k, i) for k, i in rows], "k int, id int"
    )
    out = {r["k"]: r["id"] for r in exact_dedup(df, ["k"], "id").collect()}
    want = {}
    for k, i in rows:
        want[k] = min(want.get(k, i), i)
    assert out == want


@SETTINGS
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 9)),
        max_size=15,
    ),
)
def test_asof_join_matches_naive(spark, lefts, rights):
    # dedup right on (key, ts) like production callers must
    rmap = {}
    for k, ts, val in rights:
        rmap[(k, ts)] = max(rmap.get((k, ts), val), val)
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lefts)], "lid int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in rmap.items()] or [(99, 0, 0)],
        "k int, ts int, v int",
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v"]
        ).collect()
    }
    for i, (k, ts) in enumerate(lefts):
        cands = [v for (rk, rts), v in rmap.items() if rk == k and rts <= ts]
        best = max(
            ((rts, v) for (rk, rts), v in rmap.items() if rk == k and rts <= ts),
            default=None,
        )
        assert got[i] == (best[1] if best else None)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50)),
        min_size=1,
        max_size=25,
    )
)
def test_salted_agg_equals_plain(spark, rows):
    df = spark.createDataFrame(rows, "g int, x int")
    plain = {
        r["g"]: (r["s"], r["mn"])
        for r in df.groupBy("g")
        .agg(F.sum("x").alias("s"), F.min("x").alias("mn"))
        .collect()
    }
    salted = {
        r["g"]: (r["s"], r["mn"])
        for r in salted_groupby_agg(
            df, ["g"], {"s": ("sum", "x"), "mn": ("min", "x")}, n_salts=4
        ).collect()
    }
    assert salted == plain


@SETTINGS
@given(
    corpus_texts=st.lists(words, min_size=0, max_size=6),
    batch_texts=st.lists(words, min_size=1, max_size=6),
)
def test_incremental_dedup_equals_global_dedup(spark, corpus_texts, batch_texts):
    """Invariant: for a pre-deduped corpus with ids below all batch ids,
    corpus + incremental(batch, corpus) == normalized_dedup(corpus UNION
    batch). Incremental processing must never change the final corpus."""
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        incremental_dedup,
        normalized_dedup,
    )

    corpus_raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)] or [(0, "seed")],
        "doc_id long, text string",
    )
    corpus = normalized_dedup(corpus_raw, "doc_id", "text")
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    incremental = {
        r["doc_id"]
        for r in incremental_dedup(batch, corpus, "doc_id", "text").collect()
    }
    union_kept = {
        r["doc_id"]
        for r in normalized_dedup(
            corpus.unionByName(batch), "doc_id", "text"
        ).collect()
    }
    corpus_ids = {r["doc_id"] for r in corpus.collect()}
    assert corpus_ids | incremental == union_kept


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=8
    ),
    st.integers(min_value=2, max_value=5),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_word_ngrams_match_python_reference(spark, texts, n):
    """word_ngrams over arbitrary whitespace-y text equals the obvious
    Python sliding window over the same normalized tokens."""
    from streaming_data_pipeline_azure_spark.operators.corpus import word_ngrams
    from streaming_data_pipeline_azure_spark.operators.text import (
        normalized_text,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["g"]
        for r in df.select(
            "i",
            word_ngrams(F.split(normalized_text("t"), " "), n).alias("g"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = " ".join(t.split()).lower().split(" ")
        expect = [
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        ]
        assert got[i] == expect, (t, n)


@given(
    st.integers(min_value=0, max_value=60),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=10),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_matches_python_reference(spark, n_tokens, chunk, overlap):
    """chunk_documents equals the reference sliding window for any
    (length, chunk_size, overlap) with overlap < chunk_size."""
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        chunk_documents,
    )

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (
            (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
            for r in chunk_documents(
                df, chunk_size=chunk, overlap=overlap
            ).collect()
        )
    )
    # reference: tokens of the trimmed text ('' -> [''], matching \s+ split)
    toks = text.split(" ") if text else [""]
    n = len(toks)
    n_chunks = 1 + max(0, -(-(n - chunk) // stride))
    expect = []
    for ci in range(n_chunks):
        s = ci * stride
        piece = toks[s : s + chunk]
        expect.append((ci, s, len(piece), " ".join(piece)))
    assert rows == expect, (n_tokens, chunk, overlap)


def _pv_docs(spark, parts):
    rows = [
        (i, f"shared template header words {'alpha beta gamma' if i % 3 else 'delta five six'} "
            f"plus unique tail {i} {i*7} {i*13}")
        for i in range(24)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(parts)


def test_cross_doc_shared_ngrams_partition_invariant(spark):
    """Corpus-wide gram statistics are pure functions of the data — the
    input's partitioning must not change a single row."""
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        cross_doc_shared_ngrams,
    )

    def run(parts):
        return {
            (r["doc_id"], r["n_grams"], r["n_shared"], r["shared_frac"])
            for r in cross_doc_shared_ngrams(_pv_docs(spark, parts)).collect()
        }

    assert run(1) == run(7)


def test_batch_corpus_jaccard_pairs_partition_invariant(spark):
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        batch_corpus_jaccard_pairs,
    )

    def run(parts):
        corpus = _pv_docs(spark, parts)
        batch = corpus.filter(F.col("doc_id") % 4 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000
        ).repartition(max(1, parts - 2) if parts > 1 else 1)
        return {
            (r["batch_id"], r["corpus_id"])
            for r in batch_corpus_jaccard_pairs(
                corpus, batch, "doc_id", "text", threshold=0.6
            ).collect()
        }

    one = run(1)
    assert one  # planted re-crawls guarantee matches
    assert one == run(7)


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(2, 3),
)
def test_span_dedup_invariants(spark, texts, n):
    """drop_duplicate_spans invariants for arbitrary corpora:
    (1) the lowest-id document never loses a token (keep-first);
    (2) every clean_text is an order-preserving token subsequence of
        the normalized original;
    (3) 0 <= n_removed <= n_tokens and the arithmetic is consistent."""
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        drop_duplicate_spans,
    )
    from streaming_data_pipeline_azure_spark.operators.text import (
        normalized_text,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    norm = {
        r["doc_id"]: r["nt"]
        for r in df.select(
            "doc_id", normalized_text("text").alias("nt")
        ).collect()
    }
    out = {r["doc_id"]: r for r in drop_duplicate_spans(df, n=n).collect()}
    assert set(out) == set(norm)
    assert out[0]["n_removed"] == 0  # first doc keeps everything
    assert out[0]["clean_text"] == norm[0]
    for d, r in out.items():
        orig = norm[d].split(" ")
        assert 0 <= r["n_removed"] <= r["n_tokens"]
        assert r["n_tokens"] == len(orig)
        expected = r["n_tokens"] - r["n_removed"]
        if r["clean_text"] == "":
            # "" is concat_ws of either [] (fully scrubbed) or [""]
            # (normalized-empty doc's single empty token)
            assert expected <= 1
            kept = [""] if expected == 1 else []
        else:
            kept = r["clean_text"].split(" ")
            assert len(kept) == expected
        # order-preserving subsequence check
        it = iter(orig)
        assert all(tok in it for tok in kept)


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=25
    ),
    gap=st.integers(min_value=1, max_value=120),
)
def test_debounce_idempotent_and_heads_spaced(spark, offsets, gap):
    """Debounce properties over arbitrary event times: (1) kept rows
    are a subset of the input with the earliest event always kept;
    (2) consecutive KEPT events are strictly more than gap apart
    (burst heads are separated by real silence); (3) debouncing is
    IDEMPOTENT — running it on its own output changes nothing."""
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        debounce_events,
    )

    rows = [
        (i, 1, "t", f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}")
        for i, s in enumerate(sorted(set(offsets)))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    kept = debounce_events(
        df, ["user_id", "event_type"], "ts",
        gap_seconds=gap, tiebreak_cols=["event_id"],
    )
    krows = sorted(
        (r["event_id"], int(r["ts"].timestamp())) for r in kept.collect()
    )
    all_ids = {r[0] for r in rows}
    assert {i for i, _ in krows} <= all_ids
    assert krows[0][0] == 0                       # earliest always kept
    for (_, a), (_, b) in zip(krows, krows[1:]):
        assert b - a > gap, (krows, gap)          # heads truly spaced
    again = sorted(
        (r["event_id"], int(r["ts"].timestamp()))
        for r in debounce_events(
            kept, ["user_id", "event_type"], "ts",
            gap_seconds=gap, tiebreak_cols=["event_id"],
        ).collect()
    )
    assert again == krows                         # idempotent


snap = st.dictionaries(
    st.integers(0, 12),
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),
        st.one_of(st.none(), st.sampled_from(["x", "y"])),
    ),
    max_size=8,
)


@SETTINGS
@given(old=snap, new=snap)
def test_diff_then_cdc_apply_reconstructs_new_snapshot(spark, old, new):
    """CDC <-> diff duality: a change feed DERIVED from
    diff_snapshots(old, new) — upserts of the new payload for
    added/changed keys, delete markers for removed keys, on top of the
    old snapshot at a lower sequence — must apply_changes() back to
    EXACTLY the new snapshot, for arbitrary snapshots including null
    attribute transitions. This pins the two operators to one
    consistent notion of change."""
    from streaming_data_pipeline_azure_spark.operators.cdc import (
        apply_changes,
    )
    from streaming_data_pipeline_azure_spark.operators.validate import (
        diff_snapshots,
    )

    schema = "k int, a int, b string"
    old_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in old.items()], schema
    )
    new_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in new.items()], schema
    )
    d = diff_snapshots(old_df, new_df, ["k"])
    upserts = (
        d.filter(F.col("status").isin("added", "changed"))
        .select("k")
        .join(new_df, "k")
        .select("k", "a", "b", F.lit("U").alias("op"), F.lit(1).alias("seq"))
    )
    deletes = d.filter(F.col("status") == "removed").select(
        "k",
        F.lit(None).cast("int").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.lit("D").alias("op"),
        F.lit(1).alias("seq"),
    )
    base = old_df.select(
        "k", "a", "b", F.lit("U").alias("op"), F.lit(0).alias("seq")
    )
    feed = base.unionByName(upserts).unionByName(deletes)
    applied = apply_changes(
        feed, key_cols=["k"], seq_cols=["seq"], op_col="op"
    )
    got = sorted(tuple(r) for r in applied.select("k", "a", "b").collect())
    want = sorted((k, v[0], v[1]) for k, v in new.items())
    assert got == want


@SETTINGS
@given(
    n=st.integers(20, 300),
    k=st.integers(1, 40),
    n_slices=st.integers(1, 6),
)
def test_bottomk_merge_parity_any_slicing(spark, n, k, n_slices):
    """Property: for ANY population size, sample size and slicing
    arity, merging per-slice bottom-k partials reproduces the one-pass
    bottom-k exactly (the KMV mergeability law)."""
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        bottomk_sample,
        merge_bottomk,
    )

    df = spark.range(0, n).select(F.col("id").alias("key"))
    direct = sorted(
        r["key"] for r in bottomk_sample(df, "key", k).collect()
    )
    parts = None
    for i in range(n_slices):
        p = bottomk_sample(
            df.filter(f"key % {n_slices} = {i}"), "key", k
        )
        parts = p if parts is None else parts.unionByName(p)
    merged = sorted(
        r["key"] for r in merge_bottomk(parts, "key", k).collect()
    )
    assert merged == direct
    assert len(direct) == min(n, k)


group_vals = st.lists(
    st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 50)),
    min_size=4,
    max_size=24,
)


@SETTINGS
@given(rows=group_vals)
def test_anova_invariants(spark, rows):
    """SSB, SSW ≥ 0 (up to fold ulps), F ≥ 0 when defined, eta² in
    [0,1], and SSB+SSW equals the direct total sum of squares."""
    from streaming_data_pipeline_azure_spark.operators.experiment import (
        anova_oneway,
    )

    df = spark.createDataFrame(rows, "g string, v long")
    [r] = anova_oneway(df, "g", "v").collect()
    assert r["ssb"] >= -1e-6 and r["ssw"] >= -1e-6
    if r["f_stat"] is not None:
        assert r["f_stat"] >= 0.0
    if r["eta2"] is not None:
        assert -1e-12 <= r["eta2"] <= 1.0 + 1e-12
    vals = [v for _, v in rows]
    mean = sum(vals) / len(vals)
    sst = sum((v - mean) ** 2 for v in vals)
    assert abs((r["ssb"] + r["ssw"]) - sst) < 1e-6 * max(1.0, sst)


@SETTINGS
@given(rows=group_vals)
def test_partial_correlation_bounds(spark, rows):
    """Every reported correlation (marginal and partial) lies in
    [−1, 1] up to IEEE ulps, for arbitrary integer triples."""
    from streaming_data_pipeline_azure_spark.operators.profile import (
        partial_correlation,
    )

    trip = [(v, (v * 3 + i) % 17, (i * 7) % 11)
            for i, (_, v) in enumerate(rows)]
    df = spark.createDataFrame(trip, "x long, y long, z long")
    [r] = partial_correlation(df, "x", "y", "z").collect()
    for c in ("r_xy", "r_xz", "r_yz", "r_xy_given_z"):
        if r[c] is not None:
            assert -1.0 - 1e-9 <= r[c] <= 1.0 + 1e-9


@SETTINGS
@given(
    vals=st.lists(st.integers(0, 10_000), min_size=2, max_size=40),
)
def test_haar_energy_conservation(spark, vals):
    """Parseval for the unnormalized transform: Σ_level 2^level·E_level
    + 2^k·(top approx)² = 2^k·Σv² over the dyadic prefix — checked via
    the exact integer energies the operator publishes."""
    import datetime as _dt

    from streaming_data_pipeline_azure_spark.operators.temporal import (
        haar_energy,
    )

    d0 = _dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(d0 + _dt.timedelta(days=i), v) for i, v in enumerate(vals)],
        "d date, v long",
    )
    rows = haar_energy(df, "d", "v").collect()
    k = len(rows)
    m = 1 << k
    prefix = vals[:m]
    # unnormalized Parseval: m·Σv² = Σ_l 2^(l-1)·... derive directly:
    # at each level, Σ s² + Σ d² = 2·Σ (inputs)², so unrolling gives
    # 2^k Σv² = (Σ_{l=1..k} 2^(k-l)·E_l) + (top approx)²
    top = sum(prefix)
    lhs = (2 ** k) * sum(v * v for v in prefix)
    rhs = sum((2 ** (k - r["level"])) * int(r["energy"]) for r in rows)
    rhs += top * top
    assert lhs == rhs


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["b1", "b2"]),
            st.integers(0, 9999),
            st.integers(0, 1000),
        ),
        min_size=0,
        max_size=16,
    )
)
def test_preference_pairs_invariants(spark, rows):
    """margin ≥ 0 always; chosen ≠ rejected; every returned bucket has
    ≥2 items; chosen score is the bucket max and rejected ≤ every
    other member's score."""
    from streaming_data_pipeline_azure_spark.operators.sampling import (
        preference_pairs,
    )

    uniq = {(b, i): s for b, i, s in rows}
    data = [(b, i, s) for (b, i), s in uniq.items()]
    if not data:
        return
    df = spark.createDataFrame(data, "bucket string, id long, s long")
    out = preference_pairs(df, "bucket", "id", "s").collect()
    by_bucket: dict = {}
    for b, i, s in data:
        by_bucket.setdefault(b, []).append((i, s))
    for r in out:
        members = by_bucket[r["bucket"]]
        assert len(members) >= 2
        assert r["margin"] >= 0
        assert r["chosen_id"] != r["rejected_id"]
        assert r["chosen_score"] == max(s for _, s in members)
