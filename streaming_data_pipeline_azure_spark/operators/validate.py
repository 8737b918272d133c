"""Declarative data-quality validation — the expectation-check stage
(Great Expectations / Deequ-style) every production pipeline runs before
publishing a table.

Design: a rule is just ``(name, boolean Column)`` where the column is
TRUE when the row PASSES. All rules evaluate in ONE scan — each becomes
a conditional count inside a single aggregate, so a 100-rule suite over
100 TB costs exactly one pass with a one-row-per-rule result (conditional
aggregation is pure codegen; no per-rule jobs, no driver loops). NULL
predicate results count as failures (a NULL check outcome means the rule
could not verify the row — the conservative reading).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate every rule in one scan. Returns one row per rule:
    (rule, n_rows, n_violations, violation_frac, passed) — ``passed``
    is violation-free, and the frame is driver-tiny (O(rules) rows)."""
    if not rules:
        raise ValueError("check_rules needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(pred.isNull() | ~pred, 1).otherwise(0)
            ).alias(f"__v{i}")
        )
    wide = df.agg(*aggs)
    # unpivot the one-row aggregate with a single explode — a per-rule
    # union would re-plan (and re-scan) the aggregate subtree per branch
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"__v{i}").alias("v")
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return wide.select(
        F.col("__n"), F.explode(entries).alias("e")
    ).select(
        F.col("e.rule").alias("rule"),
        F.col("__n").cast("long").alias("n_rows"),
        F.col("e.v").cast("long").alias("n_violations"),
        (F.col("e.v").cast("double") / F.col("__n")).alias(
            "violation_frac"
        ),
        (F.col("e.v") == 0).alias("passed"),
    )


def failing_rows(
    df: DataFrame, rules: list[tuple[str, Column]], *, limit: int = 100
) -> DataFrame:
    """Debugging companion to :func:`check_rules`: up to ``limit``
    offending rows per rule with the violated rule name attached (one
    filtered scan per rule — use after the one-scan summary says which
    rules fail, on whatever predicate subset needs samples)."""
    out = None
    for name, pred in rules:
        bad = df.filter(pred.isNull() | ~pred).limit(limit).withColumn(
            "violated_rule", F.lit(name)
        )
        out = bad if out is None else out.unionByName(bad)
    if out is None:
        raise ValueError("failing_rows needs at least one rule")
    return out


def check_referential(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (name, child, fk_col,
    parent, pk_col), one row (relation, n_child, n_orphans,
    orphan_frac) where an orphan is a child row whose non-null foreign
    key has no parent. NULL foreign keys are not orphans (SQL FK
    semantics); count them separately upstream if required.

    Each pair is a LEFT ANTI join on the key — the parent side's
    distinct keys broadcast when small, and AQE shuffles cleanly when
    not; no row data moves beyond the keys. Results union into one
    tiny report frame."""
    out = None
    for name, child, fk, parent, pk in pairs:
        keyed = child.select(F.col(fk).alias("__fk")).filter(
            F.col("__fk").isNotNull()
        )
        orphans = keyed.join(
            parent.select(F.col(pk).alias("__fk")).distinct(), "__fk", "anti"
        )
        row = (
            keyed.agg(F.count(F.lit(1)).alias("__n"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("__o")))
            .select(
                F.lit(name).alias("relation"),
                F.col("__n").cast("long").alias("n_child"),
                F.col("__o").cast("long").alias("n_orphans"),
                (
                    F.col("__o").cast("double") / F.col("__n").cast("double")
                ).alias("orphan_frac"),
            )
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("check_referential needs at least one pair")
    return out
