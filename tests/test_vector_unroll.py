"""Bit-parity of the unrolled (dim=) codegen form of the vector
primitives against the interpreted HOF fold they replace (r13
optimization round): same multiply/add sequence → identical IEEE
doubles, including NaN/inf propagation and signed-zero handling."""

import math
import struct

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.vector import (
    cosine_similarity,
    dot,
    literal_vector,
    norm,
)

DIM = 8

ADVERSARIAL = [
    [0.1, -0.2, 0.3, -0.4, 1e-300, -1e-300, 1e15, -1e15],
    [0.0, -0.0, 0.0, -0.0, 0.0, -0.0, 0.0, -0.0],
    [float("nan"), 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
    [float("inf"), 1.0, -1.0, 2.0, -2.0, 3.0, -3.0, 4.0],
    [float("-inf"), float("inf"), 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    [5e-324, -5e-324, 2.2250738585072014e-308, 1.0, -1.0, 0.5, 0.25, 0.125],
    [1.0000000000000002, 0.9999999999999999, 3.141592653589793,
     2.718281828459045, -1.414213562373095, 7.0, 11.0, 13.0],
]


def _bits(x):
    if x is None:
        return "NULL"
    return struct.pack("<d", x).hex()


def _compare(df, unrolled_col, hof_col):
    rows = df.select(
        unrolled_col.alias("u"), hof_col.alias("h")
    ).collect()
    assert rows, "empty comparison"
    for r in rows:
        assert _bits(r["u"]) == _bits(r["h"]), (r["u"], r["h"])


def test_dot_unrolled_bit_identical(spark):
    df = spark.createDataFrame(
        [(a, b) for a in ADVERSARIAL for b in ADVERSARIAL],
        "a array<double>, b array<double>",
    )
    _compare(df, dot(F.col("a"), F.col("b"), DIM), dot(F.col("a"), F.col("b")))


def test_norm_and_cosine_unrolled_bit_identical(spark):
    df = spark.createDataFrame(
        [(a, b) for a in ADVERSARIAL for b in ADVERSARIAL],
        "a array<double>, b array<double>",
    )
    _compare(df, norm(F.col("a"), DIM), norm(F.col("a")))
    _compare(
        df,
        cosine_similarity(F.col("a"), F.col("b"), DIM),
        cosine_similarity(F.col("a"), F.col("b")),
    )


def test_cosine_unrolled_against_literal_query(spark):
    q = [0.5, -1.5, 2.5, 0.0, -0.0, 1e10, -1e-10, 3.0]
    df = spark.createDataFrame([(a,) for a in ADVERSARIAL], "a array<double>")
    _compare(
        df,
        cosine_similarity(F.col("a"), literal_vector(q), DIM),
        cosine_similarity(F.col("a"), literal_vector(q)),
    )


def test_unrolled_dot_runs_in_codegen(spark):
    """The unrolled form must NOT contain HOF nodes (aggregate/zip_with
    are CodegenFallback — the whole point of the rewrite)."""
    df = spark.createDataFrame([([1.0] * DIM, [2.0] * DIM)],
                               "a array<double>, b array<double>")
    plan = df.select(
        dot(F.col("a"), F.col("b"), DIM).alias("d")
    )._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" not in plan and "zip_with(" not in plan


def test_sign_bucket_unrolled_matches_hof(spark):
    """dedup.sign_bucket now unrolls the per-plane dot; pin it against
    the reference HOF fold on random-ish data including zeros."""
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        random_hyperplanes,
        sign_bucket,
    )

    planes = random_hyperplanes(DIM, 5, seed=7)
    df = spark.createDataFrame([(a,) for a in ADVERSARIAL], "v array<double>")

    def hof_bucket(vec_col, planes):
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(planes):
            p = F.array(*[F.lit(x) for x in plane])
            d = F.aggregate(
                F.zip_with(vec_col, p, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket.bitwiseOR(
                F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i))
                .otherwise(F.lit(0).cast("long"))
            )
        return bucket

    rows = df.select(
        sign_bucket(F.col("v"), planes).alias("new"),
        hof_bucket(F.col("v"), planes).alias("old"),
    ).collect()
    for r in rows:
        assert r["new"] == r["old"]
    # sanity: NaN-free rows land in non-degenerate buckets
    assert not math.isnan(float(rows[0]["new"]))
