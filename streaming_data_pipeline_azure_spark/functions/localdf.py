"""Driver-local small-table construction through one Arrow batch.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the pickled
rows into ``defaultParallelism`` partitions whose evaluation round-trips a
Python worker PER PARENT PARTITION inside whatever task reads them. On
local[32] that makes every action over such a table pay ~32 sequential
worker round-trips when coalesced: a 64-row ``coalesce(1).write`` measured
**4.9-7.0 s**, and even ``coalesce(1).count()`` 5.4 s — pure fixed cost,
independent of data size (r13 optimization round, guide §4.1/§6 "Arrow for
driver transfers").

:func:`local_rows_df` routes the same rows through ONE ``pyarrow.Table``
(Spark 4 accepts it in ``createDataFrame``): the batch lands in the JVM as
Arrow — no Python workers at evaluation — and the same 64-row write
measures ~0.3 s. Value semantics are EXACT, unlike the pandas route:
``None`` → SQL NULL and ``float('nan')`` → NaN (pandas folds NaN into
null, which would change published values), ints stay exact, and the
declared Spark schema is converted field-by-field via
``pyspark.sql.pandas.types.to_arrow_schema`` so int vs bigint vs double
and nested array element types are preserved bit-for-bit. Parity with the
classic path is pinned in tests/test_localdf.py.

Any failure to convert (exotic type, missing pyarrow) falls back to the
classic path — slower, never wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL driver-side row
    lists (params tables, centroid matrices, spec/stat rows) through one
    Arrow batch. ``rows`` is a list of tuples aligned with ``schema``
    (a DDL string or StructType)."""
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        a_schema = to_arrow_schema(st)
        data = [tuple(r) for r in rows]
        cols = (
            list(zip(*data)) if data else [() for _ in st.fields]
        )
        arrays = [
            pa.array(list(col), type=a_schema.field(i).type)
            for i, col in enumerate(cols)
        ]
        return spark.createDataFrame(
            pa.Table.from_arrays(arrays, schema=a_schema)
        )
    except Exception:
        return spark.createDataFrame(rows, st)
