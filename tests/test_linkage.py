from __future__ import annotations

import pytest

from streaming_data_pipeline_azure_spark.operators import linkage


def _lev(a: str, b: str) -> int:
    # reference Levenshtein for the brute-force expectation
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


NAMES = [
    (1, "kitten"),
    (2, "kitte"),     # deletion of 1
    (3, "kittex"),    # substitution of 1
    (4, "mitten"),    # substitution of 1
    (5, "zebra"),     # unrelated
    (6, "kitten"),    # exact duplicate of 1
    (7, "ab"),
    (8, "ba"),        # distance 2 from 7 but shares deletion variants
    (9, "a"),         # distance 1 from 7 and 8 (deletion side)
]


def _expected(max_d: int) -> set:
    out = set()
    for i, (ia, na) in enumerate(NAMES):
        for ib, nb in NAMES[i + 1:]:
            d = _lev(na, nb)
            if d <= max_d:
                lo, hi = sorted((ia, ib))
                out.add((lo, hi, d))
    return out


def test_matches_bruteforce_distance_1(spark):
    df = spark.createDataFrame(NAMES, "id int, name string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in linkage.fuzzy_match_pairs(df, "id", "name").collect()
    }
    exp = _expected(1)
    assert got == exp
    # the adversarial transposition pair must be verified away
    assert (7, 8, 2) not in got and not any(
        a == 7 and b == 8 for a, b, _ in got
    )
    # and the exact-duplicate pair present at distance 0
    assert (1, 6, 0) in got


def test_distance_zero_is_exact_match_only(spark):
    df = spark.createDataFrame(NAMES, "id int, name string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in linkage.fuzzy_match_pairs(
            df, "id", "name", max_distance=0
        ).collect()
    }
    assert got == _expected(0) == {(1, 6, 0)}


def test_unsupported_distance_raises(spark):
    # depth 2 became supported in r6; depth 3 is the contract boundary
    df = spark.createDataFrame(NAMES, "id int, name string")
    with pytest.raises(ValueError, match="max_distance"):
        linkage.fuzzy_match_pairs(df, "id", "name", max_distance=3)


def test_partition_invariance(spark):
    df = spark.createDataFrame(NAMES, "id int, name string")
    a = linkage.fuzzy_match_pairs(df.repartition(5), "id", "name")
    b = linkage.fuzzy_match_pairs(df.coalesce(1), "id", "name")
    assert sorted(map(repr, a.collect())) == sorted(map(repr, b.collect()))


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(NAMES, "id int, name string")
    plan = (
        linkage.fuzzy_match_pairs(df, "id", "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_depth2_exact_pair_set_and_guard(spark):
    """Depth-2 deletion blocking must find EXACTLY the brute-force
    levenshtein<=2 pair set (completeness incl. transpositions,
    adjacent deletions, double substitutions), and depth 3 stays a
    clear contract error."""
    import itertools

    import pytest

    rows = [
        (1, "abcd"), (2, "abd"), (3, "ab"), (4, "xbcd"),
        (5, "abce"), (6, "ba"), (7, "zzzz"), (8, "dcba"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")

    def lev(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            dp[i][0] = i
        for j in range(len(b) + 1):
            dp[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = min(
                    dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                    dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return dp[-1][-1]

    want = {
        (a[0], b[0], lev(a[1], b[1]))
        for a, b in itertools.combinations(rows, 2)
        if lev(a[1], b[1]) <= 2
    }
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in linkage.fuzzy_match_pairs(
            df, "id", "name", max_distance=2
        ).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="0, 1 or 2"):
        linkage.fuzzy_match_pairs(df, "id", "name", max_distance=3)


def test_jaro_winkler_known_values_and_nulls(spark):
    """Textbook JW values, the empty-string (DuckDB) convention, NULL
    pass-through, and the out_col collision guard."""
    df = spark.createDataFrame(
        [
            (1, "martha", "marhta"),
            (2, "dixon", "dicksonx"),
            (3, "same", "same"),
            (4, "", ""),
            (5, "abc", None),
        ],
        "pair_id long, name_a string, name_b string",
    )
    out = {r["pair_id"]: r["jw"] for r in
           linkage.jaro_winkler_score(df, "name_a", "name_b").collect()}
    assert out[1] == 0.9611111111111111
    assert abs(out[2] - 0.8133333333333332) < 1e-12
    assert out[3] == 1.0
    assert out[4] == 0.0  # DuckDB convention: empty -> 0, not 1
    assert out[5] is None
    with pytest.raises(ValueError):
        linkage.jaro_winkler_score(
            df.withColumnRenamed("pair_id", "jw"), "name_a", "name_b"
        )


def test_jaro_winkler_bit_parity_with_duckdb(spark):
    """The portable-oracle claim: the kernel is BIT-identical to
    DuckDB's jaro_winkler_similarity across randomized edits (the 3.5k
    pinning run, sampled down for suite speed)."""
    import random
    import struct

    import duckdb

    rng = random.Random(7)
    alpha = "abcdefghij"
    cases = []
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        b = list(a)
        for _ in range(rng.randint(0, 3)):
            op = rng.choice("sid")
            if not b:
                b = [rng.choice(alpha)]
                continue
            p = rng.randrange(len(b))
            if op == "s":
                b[p] = rng.choice(alpha)
            elif op == "i":
                b.insert(p, rng.choice(alpha))
            else:
                del b[p]
        cases.append((a, "".join(b)))
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)],
        "i long, a string, b string",
    )
    got = {r["i"]: r["jw"] for r in
           linkage.jaro_winkler_score(df, "a", "b").collect()}
    for i, (a, b) in enumerate(cases):
        want = duckdb.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert struct.pack("<d", got[i]) == struct.pack("<d", want), (a, b)


def test_sorted_neighborhood_pairs_window_and_blocks(spark):
    """Neighbors within the window pair up inside a block; cross-block
    pairs never form (the documented boundary blind spot); rank_gap is
    the sort distance."""
    df = spark.createDataFrame(
        [(1, "aa1"), (2, "aa2"), (3, "aa3"), (4, "aa4"), (5, "bb1")],
        "id long, name string",
    )
    pairs = linkage.sorted_neighborhood_pairs(
        df, "id", "name", window=2, block_chars=2
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["rank_gap"] for r in pairs}
    assert got == {
        (1, 2): 1, (1, 3): 2, (2, 3): 1, (2, 4): 2, (3, 4): 1,
    }
    with pytest.raises(ValueError):
        linkage.sorted_neighborhood_pairs(
            df, "id", "name", window=0, block_chars=2
        )


def test_fuzzy_blocking_shuffles_hashed_keys_not_names(spark):
    """The r8 rework's scale claim, metrics-backed: the blocking join
    and the pair-distinct shuffle (id, 8-byte xxhash64(variant)) rows
    — never name strings — so per-record shuffle width stays ~fixed
    regardless of name length. Verified by feeding names padded 10x
    longer and asserting the pre-verify exchanges' byte volume barely
    moves (the name-carrying design scaled bytes with name length)."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators import linkage
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        shuffle_write_metrics,
    )

    short = spark.createDataFrame(
        [(i, f"name{i:04d}") for i in range(300)], "id int, name string"
    )
    # same ids, same variant STRUCTURE, names 10x longer
    long = short.select(
        "id", F.concat(F.lit("x" * 72), "name").alias("name")
    )

    def blocking_bytes(df):
        # measure ONLY the candidate-generation phase (pair_ids):
        # rebuild it exactly as fuzzy_match_pairs does, stop before
        # the name re-join
        base = df.selectExpr("id AS __id", "name AS __name")
        keyed = base.selectExpr(
            "__id",
            "explode(transform(sequence(0, length(__name)), i -> "
            "CASE WHEN i = 0 THEN __name ELSE concat(substring(__name,"
            " 1, i-1), substring(__name, i+1)) END)) AS __v",
        ).selectExpr("__id", "xxhash64(__v) AS __blk")
        a = keyed.toDF("id_a", "__blk")
        b = keyed.toDF("id_b", "__blk")
        pair_ids = (
            a.join(b, "__blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return sum(m["bytes"] for m in shuffle_write_metrics(pair_ids))

    bs, bl = blocking_bytes(short), blocking_bytes(long)
    # long names explode ~10x more variants (one per char), so allow
    # linear-in-variants growth; the old name-carrying design grew
    # ~10x * 10x = ~100x. Bytes per VARIANT must stay ~flat:
    n_var_s, n_var_l = 300 * (8 + 2), 300 * (80 + 2)
    assert bl / n_var_l < 2.0 * (bs / n_var_s), (bs, bl)
    # end-to-end results stay correct on the padded names
    out = linkage.fuzzy_match_pairs(long, "id", "name")
    assert out.filter("distance = 0").count() == 0


def test_fellegi_sunter_hand_values(spark):
    """m = 3/4 on matches, u = 1/4 on non-matches → fs_weight =
    (3·3)/(1·1) = 9 exactly; a field that never agrees on non-matches
    (u = 0) reports NULL weight (infinite evidence), never ±inf."""
    from streaming_data_pipeline_azure_spark.operators.linkage import (
        fellegi_sunter_weights,
    )

    matched = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 0), (0, 1)], "f long, g long"
    )
    nonmatched = spark.createDataFrame(
        [(1, 0), (0, 0), (0, 0), (0, 0)], "f long, g long"
    )
    rows = {r["field"]: r for r in
            fellegi_sunter_weights(matched, nonmatched, ["f", "g"])
            .collect()}
    f = rows["f"]
    assert (f["n_match"], f["n_agree_match"]) == (4, 3)
    assert (f["n_nonmatch"], f["n_agree_nonmatch"]) == (4, 1)
    assert abs(f["m"] - 0.75) < 1e-15 and abs(f["u"] - 0.25) < 1e-15
    assert abs(f["fs_weight"] - 9.0) < 1e-12
    g = rows["g"]
    assert g["n_agree_nonmatch"] == 0 and g["fs_weight"] is None
