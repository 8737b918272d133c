"""2-D Pareto frontier (skyline): the rows no other row dominates.

A row p is DOMINATED when some row q is at least as good on both
dimensions and strictly better on one (maximization; pass
``maximize=(False, ...)`` to flip a dimension — handled by negation).
Duplicate points tie and are all kept.

Scale design (the 100 TB contract):

- The naive formulation is the O(n²) dominance anti-join — correct only
  as the DuckDB oracle. Distributed shape here is the classic two-phase
  skyline:

  1. **batch-local prefilter** (Arrow ``mapInPandas``): each record
     batch keeps only its OWN non-dominated rows. Dominance is global —
     a batch's local frontier is always a superset of its contribution
     to the global frontier — so the filter is lossless, touches each
     row once, shuffles nothing, and typically collapses millions of
     rows to a few dozen candidates per batch (frontier size of random
     2-D data is O(log n)).
  2. **exact relational finish** over the surviving candidates: group
     to one (x, max y) row per distinct x (ONE hash shuffle with
     map-side combine), a cumulative-max window over the distinct-x
     series sorted x-descending (a frontier x survives iff its group
     max-y strictly beats every higher-x group's best), then a
     broadcast semi-join back to the candidates so ties and duplicate
     frontier points return intact with all their columns.

- The single-partition window in (2) runs over DISTINCT candidate x
  values, not input rows — bounded by Σ per-batch frontier sizes. A
  pathological all-diagonal input (every row on the frontier) degrades
  to the input size; that input's ANSWER is the whole input, so no
  algorithm does better.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_frontier(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact non-dominated filter within one pandas frame (maximize
    both __x and __y): sort x desc / y desc, a group's max-y row beats
    lower-y same-x rows, and the running max of STRICTLY-higher-x
    group maxima dominates across groups. Vectorized, no Python loop
    over rows."""
    if len(pdf) == 0:
        return pdf
    s = pdf.sort_values(["__x", "__y"], ascending=[False, False])
    gmax = s.groupby("__x", sort=False)["__y"].transform("max")
    # cummax of group maxima over strictly-higher x: shift the per-group
    # max series by one GROUP. Build per-group cummax then shift groups.
    grp_first = ~s["__x"].duplicated()
    grp_id = grp_first.cumsum()
    group_max = s.loc[grp_first, "__y"].cummax()
    best_higher = group_max.shift(1)  # NaN for the highest-x group
    best_for_row = best_higher.iloc[grp_id - 1].to_numpy()
    y = s["__y"].to_numpy()
    import numpy as np

    not_cross_dominated = ~(best_for_row >= y)  # NaN compares False
    not_within_dominated = y >= gmax.to_numpy()
    keep = np.logical_and(not_cross_dominated, not_within_dominated)
    return s[keep]


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    maximize: tuple[bool, bool] = (True, True),
) -> DataFrame:
    """All input rows not dominated on (``x_col``, ``y_col``) — see
    module docstring for semantics and the two-phase distributed
    shape. Null coordinates are rejected (a null can neither dominate
    nor be dominated coherently)."""
    if df.filter(
        F.col(x_col).isNull() | F.col(y_col).isNull()
    ).limit(1).count() > 0:
        raise ValueError(
            "pareto_frontier: null coordinates present — filter or "
            "impute them explicitly"
        )
    sx = F.col(x_col).cast("double") * (1 if maximize[0] else -1)
    sy = F.col(y_col).cast("double") * (1 if maximize[1] else -1)
    work = df.select(
        sx.alias("__x"), sy.alias("__y"), F.struct(*df.columns).alias("__r")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _local_frontier(pdf)

    cand = work.mapInPandas(gen, schema=work.schema)
    per_x = cand.groupBy("__x").agg(F.max("__y").alias("__gy"))
    w = Window.orderBy(F.desc("__x")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_pts = (
        per_x.withColumn("__best_higher", F.max("__gy").over(w))
        .filter(
            F.col("__best_higher").isNull()
            | (F.col("__gy") > F.col("__best_higher"))
        )
        .select("__x", F.col("__gy").alias("__y"))
    )
    kept = cand.join(F.broadcast(frontier_pts), ["__x", "__y"], "left_semi")
    return kept.select("__r.*")
