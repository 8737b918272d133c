"""Change-data-capture operators: CDC apply (latest-wins snapshot
materialization) and SCD2 history build.

The reference pipeline's serving sink is a keyed document upsert with
deletes (Cosmos DB container keyed by the order id — reference
README.md:107-129); ``sources/sinks.py`` implements that physically.
These operators are the RELATIONAL formulation of the same semantics:

- :func:`apply_changes` turns a change feed (insert/update/delete rows
  with a per-key sequence) into the current snapshot — the ``APPLY
  CHANGES INTO`` / ``MERGE`` shape every lakehouse pipeline runs to
  materialize a CDC stream into a queryable table.
- :func:`scd2_history` turns the same feed into a type-2
  slowly-changing-dimension table (``valid_from``/``valid_to``/
  ``is_current``), collapsing consecutive rows whose tracked attributes
  did not change — the audit-history counterpart of the snapshot.

Scale design (the 100 TB contract):

- Both operators are ONE shuffle on the key followed by window passes
  over that single sort order — no joins, no driver state. ``lag`` /
  ``lead`` / ``row_number`` over (key, seq) are incremental within the
  sorted run, so memory per task is O(1) beyond the sort.
- :func:`scd2_history`'s change-detection ``lag`` and validity
  ``lead`` windows share one partitioning and ordering, so Catalyst
  plans a single Exchange + sort and the second window rides it.
- Determinism: callers must make ``seq_cols`` a total order per key
  (append a unique id as tie-break); both operators then produce
  identical row multisets on any partitioning — the partition-
  invariance tests pin this.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str]) -> list[Column]:
    return [F.col(n) for n in names]


def apply_changes(
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Materialize the current snapshot of a change feed: for every key,
    the payload of its highest-``seq_cols`` row — unless that row is a
    delete, in which case the key is absent (a later upsert resurrects
    it). Out-of-order delivery is handled by the sequence ordering, and
    replaying any prefix of the feed is idempotent (latest-wins).

    A NULL ``op_col`` is treated as an UPSERT, not a delete: the
    survivor filter is null-safe (``~eqNullSafe(delete_op)``), so a
    malformed feed row with a missing op marker keeps its key visible
    instead of silently reading as a takedown (ADVICE r5).

    Returns the surviving rows minus the ``op_col`` marker, one row per
    live key.
    """
    w = Window.partitionBy(*_cols(key_cols)).orderBy(
        *[c.desc() for c in _cols(seq_cols)]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(~F.col(op_col).eqNullSafe(F.lit(delete_op)))
        .drop("__rn", op_col)
    )


def scd2_history(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    seq_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a
    versioned record stream: consecutive rows (ordered by ``seq_col``
    then ``tiebreak_cols`` within each key) whose ``attr_cols`` are
    unchanged collapse into one validity interval; each emitted row
    carries ``valid_from`` (its own sequence value), ``valid_to`` (the
    next change's sequence value, NULL while open) and ``is_current``.

    NULL attribute transitions are compared null-safely (NULL→NULL is
    "no change"; NULL→value and value→NULL both open a new interval).
    """
    order = [F.col(seq_col)] + _cols(tiebreak_cols)
    w = Window.partitionBy(*_cols(key_cols)).orderBy(*order)
    attrs = F.struct(*_cols(attr_cols))
    changed = (
        df.withColumn("__prev", F.lag(attrs).over(w))
        .filter(
            F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(attrs)
        )
        .drop("__prev")
    )
    # second window over the same (key, seq) partitioning/order — the
    # filter preserves the sort, so no new Exchange is needed
    valid_to = F.lead(F.col(seq_col)).over(w)
    return changed.select(
        *key_cols,
        *attr_cols,
        F.col(seq_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
