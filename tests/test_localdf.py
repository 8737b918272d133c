"""Parity and speed-shape tests for functions.localdf.local_rows_df —
the r13-opt Arrow-batch replacement for small driver-local
createDataFrame calls (params tables, centroids, spec rows)."""

import math

import pytest

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df


def _collected(df):
    return [tuple(r) for r in df.collect()], df.schema


@pytest.mark.parametrize(
    "rows, schema",
    [
        # params-table shapes actually used by the index classes
        (
            [("doc_id", 0.8, 32, 8, 3, "word", "classic")],
            "id_col string, threshold double, num_perm int, bands int, "
            "shingle_n int, shingle_kind string, sig_method string",
        ),
        ([(16, "custkey")], "n_buckets int, id_col string"),
        (
            [(["a", "b"], "v")],
            "group_cols array<string>, value_col string",
        ),
        # centroid matrix shape (array<double> payload)
        (
            [(int(i), [float(i), float(i) / 3.0, -1.5]) for i in range(5)],
            "centroid_id long, centroid array<double>",
        ),
        # mondrian split-spec shape
        (
            [(0, 1, 2.5, 1, 2), (3, 0, -0.5, 4, 5)],
            "__box long, __di int, __med double, __lid long, __rid long",
        ),
        # empty row list
        ([], "a long, b string"),
    ],
)
def test_local_rows_df_matches_classic_path(spark, rows, schema):
    got_rows, got_schema = _collected(local_rows_df(spark, rows, schema))
    exp_rows, exp_schema = _collected(spark.createDataFrame(rows, schema))
    assert got_schema == exp_schema
    assert sorted(map(repr, got_rows)) == sorted(map(repr, exp_rows))


def test_local_rows_df_preserves_nan_vs_null(spark):
    """The pandas Arrow route folds NaN into NULL — the pa.Table route
    must NOT: None -> SQL NULL, nan -> NaN, exactly like the classic
    pickled path (published doubles depend on it)."""
    rows = [(1, 1.0), (2, float("nan")), (3, None)]
    got = {
        r["k"]: r["v"]
        for r in local_rows_df(spark, rows, "k long, v double").collect()
    }
    assert got[1] == 1.0
    assert math.isnan(got[2])
    assert got[3] is None


def test_local_rows_df_single_arrow_partition_evaluates_fast(spark):
    """The Arrow table must evaluate without per-parent-partition Python
    workers: structurally, the plan contains no Python eval nodes."""
    df = local_rows_df(
        spark, [(i, float(i)) for i in range(64)], "a long, b double"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert df.count() == 64
