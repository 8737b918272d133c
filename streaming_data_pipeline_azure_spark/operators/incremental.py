"""Incrementally-maintained aggregates: a persisted materialized view
that folds new data in WITHOUT rescanning history — the aggregation
member of the incremental family (exact/MinHash/IVF/gram/postings
indexes for dedup & retrieval; this for analytics serving).

Mechanism: the view stores MERGEABLE PARTIALS — per group, one
(count, sum, min, max) row per build/refresh — and the read path
re-aggregates the partials (sum of counts, sum of sums, min of mins,
max of maxs) and finalizes derived measures (avg = sum/count). Partial
rows are the classic algebraic-aggregate decomposition, so

- :meth:`refresh` touches ONLY the delta (one map-side-combined
  groupBy of the new rows + a parquet append: O(delta + groups), zero
  history re-read);
- :meth:`read` scans O(groups × refreshes) partial rows, collapsed
  back to O(groups) by :meth:`compact`'s crash-safe generation swap;
- sums accumulate in DECIMAL (38,4 on disk), so the served numbers are
  bit-identical to a full recompute on any engine — the oracle query
  literally runs the full-data aggregation.

Contract: a delta must be NOVEL rows (same as the index family —
re-refreshing the same data double-counts; route replays through the
sink's idempotent upsert first). AVG/derived measures are finalized at
read and never stored, which is what makes the partials mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df

from streaming_data_pipeline_azure_spark.functions.generations import (
    GenerationalDir,
    TombstoneSet,
)


class IncrementalAgg:
    """Materialized (group_cols → count/sum/avg/min/max of value_col)
    view with O(delta) refresh."""

    def __init__(self, path: str, group_cols: list[str], value_col: str):
        self.path = path
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self._gens = GenerationalDir(f"{path}/partials")
        self._params_verified = False

    # ---- bookkeeping ----

    def _partials_path(self, spark) -> str:
        return self._gens.gen_path(spark)

    def _check_params(self, spark) -> None:
        if self._params_verified:
            return
        p = spark.read.json(f"{self.path}/params").collect()[0]
        on_disk = (list(p["group_cols"]), p["value_col"])
        if on_disk != (self.group_cols, self.value_col):
            raise ValueError(
                f"IncrementalAgg params mismatch at {self.path}: view is "
                f"({on_disk[0]}, {on_disk[1]!r}), instance has "
                f"({self.group_cols}, {self.value_col!r}); reopen via "
                f"IncrementalAgg.load()"
            )
        self._params_verified = True

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IncrementalAgg":
        p = spark.read.json(f"{path}/params").collect()[0]
        view = cls(path, list(p["group_cols"]), p["value_col"])
        view._params_verified = True
        return view

    # ---- write paths ----

    def _partials(self, df: DataFrame) -> DataFrame:
        v = F.col(self.value_col)
        # __sumsq extends the partials to variance/stddev (r6): squares
        # accumulate exactly in DECIMAL — (18,4)x(18,4) -> (37,8) exact
        # products, (38,8) running sum. Contract: |value| < 1e14 keeps
        # the square inside the 38-digit cap (same bound family as the
        # other decimal paths; TPC-H money columns are far inside it).
        sq = v.cast("decimal(18,4)") * v.cast("decimal(18,4)")
        out = df.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum(v.cast("decimal(28,4)")).cast("decimal(38,4)").alias("__sum"),
            F.sum(sq).cast("decimal(38,8)").alias("__sumsq"),
            F.min(v).alias("__min"),
            F.max(v).alias("__max"),
        )
        # partials are O(groups) rows; without the coalesce every
        # refresh would emit shuffle-partition-count near-empty files
        n = max(1, df.sparkSession.sparkContext.defaultParallelism // 8)
        return out.coalesce(n)

    def build(self, df: DataFrame) -> None:
        """Initialize the view (the only full scan it ever takes)."""
        spark = df.sparkSession
        self._gens.reset(spark)
        self._partials(df).write.mode("overwrite").parquet(
            f"{self.path}/partials/gen=0"
        )
        local_rows_df(
            spark,
            [(self.group_cols, self.value_col)],
            "group_cols array<string>, value_col string",
        ).coalesce(1).write.mode("overwrite").json(f"{self.path}/params")
        self._params_verified = True

    def refresh(self, delta: DataFrame) -> None:
        """Fold NOVEL rows in: one groupBy of the delta + one append."""
        spark = delta.sparkSession
        self._check_params(spark)
        self._partials(delta).write.mode("append").parquet(
            self._partials_path(spark)
        )

    # ---- read / maintenance ----

    def _merged(self, spark: SparkSession) -> DataFrame:
        part = spark.read.parquet(self._partials_path(spark))
        aggs = [
            F.sum("__cnt").cast("long").alias("__cnt"),
            F.sum("__sum").cast("decimal(38,4)").alias("__sum"),
            F.min("__min").alias("__min"),
            F.max("__max").alias("__max"),
        ]
        if "__sumsq" in part.columns:  # pre-r6 layouts lack it
            aggs.insert(
                2, F.sum("__sumsq").cast("decimal(38,8)").alias("__sumsq")
            )
        return part.groupBy(*self.group_cols).agg(*aggs)

    def read(self, spark: SparkSession) -> DataFrame:
        """The served view: (group..., n, total, avg, min, max[,
        var, stddev]) — bit-identical to a full recompute over
        everything ever folded in (decimal partial sums; derived
        measures finalized here, never stored). Population variance
        finalizes as sumsq/n − (sum/n)² in DOUBLE — both operands are
        exact decimals, so the double arithmetic is the same on any
        engine computing that expression. Views persisted before the
        __sumsq partial existed serve without the variance columns."""
        m = self._merged(spark)
        cols = [
            *self.group_cols,
            F.col("__cnt").alias("n"),
            F.col("__sum").cast("double").alias("total"),
            (
                F.col("__sum").cast("double")
                / F.col("__cnt").cast("double")
            ).alias("avg_value"),
            F.col("__min").alias("min_value"),
            F.col("__max").alias("max_value"),
        ]
        if "__sumsq" in m.columns:
            mean = F.col("__sum").cast("double") / F.col("__cnt").cast(
                "double"
            )
            var = (
                F.col("__sumsq").cast("double")
                / F.col("__cnt").cast("double")
                - mean * mean
            )
            cols += [
                var.alias("var_value"),
                F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev_value"),
            ]
        return m.select(*cols)

    def stats(self, spark: SparkSession) -> dict:
        part = spark.read.parquet(self._partials_path(spark))
        return {
            "generation": self._gens.current_gen(spark),
            "n_partial_rows": part.count(),
            "n_groups": part.select(*self.group_cols).distinct().count(),
            "n_files": len(part.inputFiles()),
        }

    def compact(self, spark: SparkSession) -> None:
        """Collapse the append history back to one partial row per group
        via the shared crash-safe generation swap."""
        self._check_params(spark)
        nxt = self._gens.current_gen(spark) + 1
        self._merged(spark).coalesce(
            max(1, spark.sparkContext.defaultParallelism // 8)
        ).write.mode("overwrite").parquet(f"{self.path}/partials/gen={nxt}")
        self._gens.commit(spark, nxt)
        self._gens.gc_below(spark, keep=nxt)


class IncrementalTopK:
    """Materialized per-group TOP-K view with O(delta) insert-only
    refresh — the leaderboard/'largest orders per segment' serving
    table that would otherwise re-rank all history every refresh.

    The merge property that makes top-k incrementally maintainable
    under INSERTS: top-k(A ∪ B) ⊆ top-k(A) ∪ top-k(B), so each batch
    folds in only its own per-group top-k rows (the candidate set) and
    reads re-rank the O(batches·k) candidates per group, never the
    history. Deletes are NOT supported (a delete can promote a row the
    candidate set discarded — that is a rebuild), which the class
    states loudly rather than serving silently-wrong views.

    Determinism: ordering is (order_col DESC, id_col ASC) — a total
    order, so the view equals the full recompute BIT-FOR-BIT (exactly
    what the oracle entry checks). Partials are O(groups·k) rows per
    refresh; ``compact()`` collapses the append history back to one
    exact top-k per group via the shared crash-safe generation swap."""

    def __init__(
        self,
        path: str,
        group_cols: list[str],
        order_col: str,
        id_col: str,
        *,
        k: int,
    ):
        if k < 1:
            raise ValueError("IncrementalTopK needs k >= 1")
        self.path = path
        self.group_cols = list(group_cols)
        self.order_col = order_col
        self.id_col = id_col
        self.k = int(k)
        self._gens = GenerationalDir(f"{path}/partials")
        self._params_verified = False

    def _partials_path(self, spark) -> str:
        return self._gens.gen_path(spark)

    def _check_params(self, spark) -> None:
        if self._params_verified:
            return
        p = spark.read.json(f"{self.path}/params").collect()[0]
        on_disk = (
            list(p["group_cols"]), p["order_col"], p["id_col"], int(p["k"])
        )
        if on_disk != (
            self.group_cols, self.order_col, self.id_col, self.k
        ):
            raise ValueError(
                f"IncrementalTopK params mismatch at {self.path}: view is "
                f"{on_disk}, instance has ({self.group_cols}, "
                f"{self.order_col!r}, {self.id_col!r}, {self.k})"
            )
        self._params_verified = True

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IncrementalTopK":
        p = spark.read.json(f"{path}/params").collect()[0]
        view = cls(
            path, list(p["group_cols"]), p["order_col"], p["id_col"],
            k=int(p["k"]),
        )
        view._params_verified = True
        return view

    def _topk(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy(*self.group_cols).orderBy(
            F.col(self.order_col).desc(), F.col(self.id_col).asc()
        )
        out = (
            df.select(*self.group_cols, self.id_col, self.order_col)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.k)
            .drop("__rn")
        )
        n = max(1, df.sparkSession.sparkContext.defaultParallelism // 8)
        return out.coalesce(n)

    def build(self, df: DataFrame) -> None:
        """Initialize the view (the only full scan it ever takes)."""
        spark = df.sparkSession
        self._gens.reset(spark)
        self._topk(df).write.mode("overwrite").parquet(
            f"{self.path}/partials/gen=0"
        )
        local_rows_df(
            spark,
            [(self.group_cols, self.order_col, self.id_col, self.k)],
            "group_cols array<string>, order_col string, id_col string, "
            "k int",
        ).coalesce(1).write.mode("overwrite").json(f"{self.path}/params")
        self._params_verified = True

    def refresh(self, delta: DataFrame) -> None:
        """Fold a batch of NEW rows in: one per-group top-k of the
        delta + one append. Insert-only by contract (see class doc)."""
        spark = delta.sparkSession
        self._check_params(spark)
        self._topk(delta).write.mode("append").parquet(
            self._partials_path(spark)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """The served leaderboard: (group..., id, value, rank) — the
        exact top-k over everything ever folded in."""
        from pyspark.sql import Window

        self._check_params(spark)
        part = spark.read.parquet(self._partials_path(spark))
        w = Window.partitionBy(*self.group_cols).orderBy(
            F.col(self.order_col).desc(), F.col(self.id_col).asc()
        )
        return (
            part.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select(
                *self.group_cols, self.id_col, self.order_col,
                F.col("rank").cast("long").alias("rank"),
            )
        )

    def stats(self, spark: SparkSession) -> dict:
        part = spark.read.parquet(self._partials_path(spark))
        return {
            "generation": self._gens.current_gen(spark),
            "n_partial_rows": part.count(),
            "n_groups": part.select(*self.group_cols).distinct().count(),
            "n_files": len(part.inputFiles()),
        }

    def compact(self, spark: SparkSession) -> None:
        """Collapse the candidate history back to the exact top-k per
        group via the shared crash-safe generation swap."""
        self._check_params(spark)
        nxt = self._gens.current_gen(spark) + 1
        self.read(spark).drop("rank").coalesce(
            max(1, spark.sparkContext.defaultParallelism // 8)
        ).write.mode("overwrite").parquet(f"{self.path}/partials/gen={nxt}")
        self._gens.commit(spark, nxt)
        self._gens.gc_below(spark, keep=nxt)


class IncrementalJoinView:
    """Incrementally-maintained equi-JOIN view (r7) — the classic IVM
    delta-join identity next to :class:`IncrementalAgg`'s mergeable
    partials: for append-only inserts,

        Δview = ΔL ⋈ (R ∪ ΔR)  ∪  L ⋈ ΔR

    so a refresh joins only the deltas against state, never re-joins
    history, and the view itself is append-only (the full-history
    re-join is what this class exists to avoid).

    State layout: both sides persist partitioned by a key-hash bucket
    column ``__kb = pmod(xxhash64(key), n_buckets)``. A refresh reads
    ONLY the state buckets the delta's keys hash into (partition
    pruning on the directory column — the same probe-pruning story as
    the MinHash/postings indexes, plan-tested), so a small delta
    touches a small fraction of state on disk. The view output is
    bucketed the same way for downstream pruning.

    ``n_buckets`` trades refresh-time pruning granularity against
    write fan-out (every build/refresh writes one file set per touched
    bucket): size it so a bucket holds at least a few parquet row
    groups — hundreds+ at warehouse scale, 8-16 at demo scale (file
    overhead dominates measured lifecycle cost at tiny sf: 64 buckets
    cost ~1.6x the 8-bucket wall-time on sf0.1).

    Contracts (same family as IncrementalAgg): deltas must be NOVEL
    rows; inner equi-join on one key column; the two sides' non-key
    column names must be disjoint (validated); a refresh is one
    logical transaction — on a crash between the view append and the
    state appends, rebuild(). Batched refreshes serve the IDENTICAL
    multiset a one-shot join of the full inputs produces
    (parity-tested)."""

    def __init__(self, path: str, key: str, *, n_buckets: int = 64):
        self.path = path
        self.key = key
        self.n_buckets = int(n_buckets)
        self._params_verified = False
        self._sides = {
            side: GenerationalDir(f"{path}/{side}")
            for side in ("left", "right", "view")
        }
        self._tombs = TombstoneSet(path, key)

    def _side_path(self, spark, side: str) -> str:
        return self._sides[side].gen_path(spark)

    # ---- bookkeeping ----

    def _check_params(self, spark) -> None:
        if self._params_verified:
            return
        p = spark.read.json(f"{self.path}/params").collect()[0]
        on_disk = (p["key"], int(p["n_buckets"]))
        if on_disk != (self.key, self.n_buckets):
            raise ValueError(
                f"IncrementalJoinView params mismatch at {self.path}: view "
                f"is {on_disk}, instance has {(self.key, self.n_buckets)}; "
                f"reopen via IncrementalJoinView.load()"
            )
        self._params_verified = True

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IncrementalJoinView":
        p = spark.read.json(f"{path}/params").collect()[0]
        view = cls(path, p["key"], n_buckets=int(p["n_buckets"]))
        view._params_verified = True
        return view

    def _bucketed(self, df: DataFrame, batch: int = -1) -> DataFrame:
        # __batch = -1 marks build/plain-batch rows; streaming refreshes
        # stamp their micro-batch id (the replay-idempotence boundary)
        return df.withColumn(
            "__kb",
            F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets)),
        ).withColumn("__batch", F.lit(int(batch)))

    @staticmethod
    def _validate_disjoint(left: DataFrame, right: DataFrame, key: str):
        overlap = (set(left.columns) & set(right.columns)) - {key}
        if overlap:
            raise ValueError(
                f"IncrementalJoinView needs disjoint non-key columns; "
                f"both sides define {sorted(overlap)}"
            )

    # ---- write paths ----

    def build(self, left: DataFrame, right: DataFrame) -> None:
        """Initialize: persist both sides bucketed and materialize the
        initial join (the only full-input join the view ever runs)."""
        self._validate_disjoint(left, right, self.key)
        spark = left.sparkSession
        for side in self._sides.values():
            side.reset(spark)
        # r13-opt (guide §6 small files): co-locate each bucket before the
        # partitioned write — without this every write task fans out one
        # file per bucket it happens to hold (tasks x buckets tiny files
        # per write; ~500 at demo scale), and every later bucket-pruned
        # read and the view read pay the listing/open tax. One shuffle of
        # O(rows) bucket-keyed rows buys one right-sized file per
        # (batch, bucket) — at warehouse scale with hundreds of buckets
        # that is exactly the 128MB-1GB output sizing the guide asks for.
        self._bucketed(left).repartition(F.col("__kb")).write.mode(
            "overwrite"
        ).partitionBy("__batch", "__kb").parquet(f"{self.path}/left/gen=0")
        self._bucketed(right).repartition(F.col("__kb")).write.mode(
            "overwrite"
        ).partitionBy("__batch", "__kb").parquet(f"{self.path}/right/gen=0")
        joined = self._bucketed(left.join(right, self.key))
        joined.repartition(F.col("__kb")).write.mode("overwrite").partitionBy(
            "__batch", "__kb"
        ).parquet(f"{self.path}/view/gen=0")
        local_rows_df(
            spark, [(self.key, self.n_buckets)], "key string, n_buckets long"
        ).coalesce(1).write.mode("overwrite").json(f"{self.path}/params")
        self._params_verified = True

    def _pruned_state(
        self,
        spark,
        side: str,
        delta: DataFrame,
        before_batch: int | None = None,
    ) -> DataFrame:
        """State rows in the buckets the delta's keys hash into — the
        bucket list is ≤ n_buckets values (bounded collect), and the
        IN-filter lands on the partition column, so unrelated buckets
        are never read (plan-tested). ``before_batch`` additionally
        excludes rows stamped at-or-after that micro-batch, so a
        REPLAYED batch joins against exactly the state its first
        attempt saw."""
        buckets = [
            r["__kb"]
            for r in self._bucketed(delta.select(self.key))
            .select("__kb")
            .distinct()
            .collect()  # O(n_buckets) by construction
        ]
        state = spark.read.parquet(self._side_path(spark, side))
        if before_batch is not None:
            state = state.filter(F.col("__batch") < int(before_batch))
        if not buckets:
            return state.filter(F.lit(False))
        return state.filter(F.col("__kb").isin(buckets))

    def refresh(
        self,
        delta_left: DataFrame | None = None,
        delta_right: DataFrame | None = None,
        *,
        batch_id: int | None = None,
    ) -> None:
        """Fold novel rows into both sides: Δview = ΔL ⋈ (R ∪ ΔR) ∪
        L ⋈ ΔR, computed against bucket-pruned state scans; then the
        deltas append to their side's state.

        ``batch_id`` makes the refresh REPLAY-IDEMPOTENT for streaming
        (same contract as the sink/CMS/HLL ingests): writes land at
        overwrite ``__batch=<id>`` partitions, and state reads exclude
        rows stamped at-or-after the batch — so a replayed micro-batch
        (crash between write and checkpoint commit) rewrites identical
        rows against identical state instead of double-appending.
        Without it, writes are plain appends stamped ``__batch=-1``
        (batch usage — replays are the caller's contract)."""
        if delta_left is None and delta_right is None:
            return
        spark = (
            delta_left if delta_left is not None else delta_right
        ).sparkSession
        self._check_params(spark)
        stamp = -1 if batch_id is None else int(batch_id)
        new_rows = None
        if delta_left is not None:
            r_old = self._pruned_state(
                spark, "right", delta_left, before_batch=batch_id
            ).drop("__kb", "__batch")
            r_tot = (
                r_old.unionByName(delta_right)
                if delta_right is not None
                else r_old
            )
            new_rows = delta_left.join(r_tot, self.key)
        if delta_right is not None:
            l_old = self._pruned_state(
                spark, "left", delta_right, before_batch=batch_id
            ).drop("__kb", "__batch")
            lr = l_old.join(delta_right, self.key)
            new_rows = lr if new_rows is None else new_rows.unionByName(lr)
        if new_rows is None:
            return

        def write(df: DataFrame, dest: str) -> None:
            # same bucket co-location as build() — one file per touched
            # (batch, bucket) instead of tasks x buckets (guide §6)
            w = self._bucketed(df, stamp).repartition(
                F.col("__kb")
            ).write.partitionBy("__batch", "__kb")
            path = self._side_path(spark, dest)
            if batch_id is None:
                w.mode("append").parquet(path)
            else:
                # per-write dynamic mode, same reasoning as the sink
                w.mode("overwrite").option(
                    "partitionOverwriteMode", "dynamic"
                ).parquet(path)

        write(new_rows, "view")
        if delta_left is not None:
            write(delta_left, "left")
        if delta_right is not None:
            write(delta_right, "right")

    # ---- read ----

    def read(self, spark: SparkSession) -> DataFrame:
        """The materialized join view (bookkeeping columns dropped);
        tombstoned keys (:meth:`delete`) are hidden immediately."""
        self._check_params(spark)
        out = spark.read.parquet(self._side_path(spark, "view")).drop(
            "__kb", "__batch"
        )
        d = self._tombs.frame(spark)
        if d is not None:
            out = out.join(F.broadcast(d), self.key, "left_anti")
        return out

    def delete(self, spark, keys) -> None:
        """Takedown by join key — the shared tombstone contract
        (``functions/generations.py:TombstoneSet``, same as the corpus
        indexes): logical-immediate (reads anti-join the set), physical
        at the next :meth:`compact` (rows leave ALL THREE persisted
        sides — a derived view is exactly where forgotten data likes to
        hide). Keys re-inserted before the compaction stay hidden
        (takedown wins); after it, a key returns only when BOTH sides
        re-supply it — its dimension row was forgotten too (tested)."""
        self._tombs.add(spark, keys)

    # ---- maintenance ----

    def compact(self, spark: SparkSession) -> None:
        """Small-file compaction via the shared crash-safe generation
        swap: every refresh appends a file set per touched bucket, so
        the log accretes O(refreshes × buckets) small files; compact
        rewrites each side with ONE file per (__batch, __kb) directory
        (a repartition on the partition columns). Rows, batch stamps
        and partition layout are preserved EXACTLY — unlike the upsert
        sink there are no shadowed versions to drop, and keeping the
        original __batch partitions is what keeps replayed streaming
        micro-batches idempotent after compaction (their overwrite
        target still exists; tested). Each side swaps independently —
        a crash between sides leaves every side individually
        consistent (generation markers)."""
        self._check_params(spark)
        tomb = self._tombs.frame(spark)
        for side, gens in self._sides.items():
            cur = gens.current_gen(spark)
            nxt = cur + 1
            rows = spark.read.parquet(f"{self.path}/{side}/gen={cur}")
            if tomb is not None:
                rows = rows.join(F.broadcast(tomb), self.key, "left_anti")
            rows.repartition("__batch", "__kb").write.mode(
                "overwrite"
            ).partitionBy("__batch", "__kb").parquet(
                f"{self.path}/{side}/gen={nxt}"
            )
            gens.commit(spark, nxt)
            gens.gc_below(spark, keep=nxt)
        # crash between the last commit and this clear is safe: the
        # surviving tombstones anti-join rows that no longer exist
        self._tombs.clear(spark)
