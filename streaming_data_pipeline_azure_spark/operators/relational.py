"""F1/A1/A2/A3/T1 — the ad-hoc analytical queries over the enriched sink.

Reference (README.md:227-245, Cosmos SQL over the enriched documents):

    F1: SELECT * FROM c WHERE c.city = "Chicago"
    A1: SELECT VALUE AVG(c.purchase_amount) FROM c WHERE c.city = "Chicago"
    A2: SELECT AVG(c.purchase_amount) AS avg_purchase, c.city FROM c GROUP BY c.city
    A3: SELECT SUM(c.purchase_amount) AS total_purchase, c.city FROM c GROUP BY c.city
    T1: SELECT TOP 10 * FROM Crm.Customers           (README.md:100)

Scale notes (100 TB):
- F1's equality predicate is a plain Catalyst filter → pushed into the
  parquet scan (PushedFilters), so a city-partitioned layout prunes whole
  files.
- A2/A3 are hash aggregations over a 14-key domain — partial (map-side)
  aggregation reduces each input partition to ≤14 rows before the shuffle,
  so the shuffle volume is O(partitions × cities), independent of row count.
- Numeric determinism: double summation is order-dependent, so aggregate
  outputs exposed to the driver's value-hash go through an exact
  DECIMAL(18,4) accumulation and only then cast to double (bit-identical on
  any engine and any partitioning — see oracle notes in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_by_city(enriched: DataFrame, city: str, city_col: str = "city") -> DataFrame:
    """F1 — equality filter; predicate pushes down to the scan."""
    return enriched.filter(F.col(city_col) == city)


def _exact_sum(col: str) -> F.Column:
    """Exact decimal sum of a double column — deterministic across engines
    and partitionings (double sums are not associative; decimal sums are)."""
    return F.sum(F.col(col).cast("decimal(18,4)"))


def avg_purchase(enriched: DataFrame, city: str | None = None,
                 amount_col: str = "purchase_amount") -> DataFrame:
    """A1 — scalar AVG, optionally filtered (`VALUE AVG(...)` in Cosmos SQL
    unwraps to a bare scalar; here it is a 1×1 DataFrame)."""
    df = filter_by_city(enriched, city) if city is not None else enriched
    return df.agg(
        (_exact_sum(amount_col).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avg_purchase")
    )


def avg_purchase_by_city(enriched: DataFrame, amount_col: str = "purchase_amount",
                         city_col: str = "city") -> DataFrame:
    """A2 — hash group-by + AVG (partial agg map-side, 14-key domain)."""
    return enriched.groupBy(city_col).agg(
        (_exact_sum(amount_col).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avg_purchase")
    )


def sum_purchase_by_city(enriched: DataFrame, amount_col: str = "purchase_amount",
                         city_col: str = "city") -> DataFrame:
    """A3 — hash group-by + SUM."""
    return enriched.groupBy(city_col).agg(
        _exact_sum(amount_col).cast("double").alias("total_purchase")
    )


def top_n(df: DataFrame, n: int, order_col: str | None = None) -> DataFrame:
    """T1 — TOP/LIMIT. The reference's ``SELECT TOP 10 *`` is unordered;
    pass ``order_col`` for a deterministic (testable) variant. A global
    ordered limit plans as TakeOrderedAndProject — per-partition top-n then
    a driver-side merge of n×partitions rows, no full sort at scale."""
    if order_col is not None:
        df = df.orderBy(order_col)
    return df.limit(n)


def unpivot(df: DataFrame, id_cols: list[str], value_cols: list[str],
            var_name: str = "metric", value_name: str = "value") -> DataFrame:
    """Wide→long reshape (UNPIVOT/melt) via ``stack``: each input row
    yields len(value_cols) output rows (id_cols…, metric, value).
    A pure projection+generate — narrow, no shuffle, survives any
    scale; the declarative twin of pandas' melt for feeding
    metric-generic downstream operators (per-metric aggregation,
    long-format exports). Values are cast to double first (unpivot
    requires a common type across the melted columns). Delegates to
    the built-in ``DataFrame.unpivot`` (same Expand plan, no
    hand-assembled SQL string to escape — r10 review)."""
    casted = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    )
    return casted.unpivot(id_cols, value_cols, var_name, value_name)
