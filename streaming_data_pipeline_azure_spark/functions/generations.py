"""Generation-directory bookkeeping shared by the upsert sink and the
persisted corpus indexes.

The pattern (same model Delta/Hudi use for table versions, reduced to
one filesystem primitive): data lives under ``<root>/gen=G/...``; a
rewrite stages the next generation in ``gen=G+1`` (invisible — readers
resolve the highest COMMITTED generation), then a single ``_COMMITTED``
marker-file create flips it live, then older generations are deleted. A
crash before the marker leaves ``gen=G`` fully readable; a crash after
leaves at worst a shadowed directory the next rewrite garbage-collects.
Generation 0 is the bootstrap and needs no marker — it is only ever
superseded by a committed successor.

Uses the Hadoop FS API throughout, so the same code works on any scheme
Spark can write (local, HDFS, ABFS/S3A — create-file is atomic on all).
"""

from __future__ import annotations

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df

_MARKER = "_COMMITTED"


class TombstoneSet:
    """Append-only deleted-id set under ``<root>/tombstones/`` — the
    takedown/right-to-be-forgotten primitive both corpus indexes share
    (VERDICT r4 #5).

    Deletes are LOGICAL until the next compaction: :meth:`add` appends
    the ids as parquet (no index rewrite — O(delete) cost at petabyte
    index scale), probes anti-join :meth:`frame` so a deleted doc stops
    matching IMMEDIATELY, and ``compact()`` drops the rows physically
    and then :meth:`clear`s the set. Crash between compact-commit and
    clear is safe: the surviving tombstones anti-join rows that no
    longer exist (no-op) and the next compaction clears them. Ids are
    permanent — re-appending a previously deleted id before a compaction
    has run is hidden by its tombstone (takedown wins).
    """

    def __init__(self, root: str, id_col: str):
        self.path = f"{root}/tombstones"
        self.id_col = id_col

    def _fs(self, spark):
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        return p.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        ), jvm, p

    def add(self, spark, ids) -> None:
        """Record deleted ids (an int iterable or a 1-column DataFrame)."""
        if hasattr(ids, "select"):
            df = ids.select(self.id_col)
        else:
            df = local_rows_df(
                spark, [(int(i),) for i in ids], f"{self.id_col} long"
            )
        df.coalesce(1).write.mode("append").parquet(self.path)

    def frame(self, spark):
        """The tombstoned ids as a DataFrame, or None when none exist."""
        fs, _, p = self._fs(spark)
        if not fs.exists(p):
            return None
        return spark.read.parquet(self.path).select(self.id_col).distinct()

    def count(self, spark) -> int:
        df = self.frame(spark)
        return 0 if df is None else df.count()

    def clear(self, spark) -> None:
        fs, _, p = self._fs(spark)
        fs.delete(p, True)


class GenerationalDir:
    """Commit/GC helper over one ``<root>/gen=N`` directory family."""

    def __init__(self, path: str):
        self.path = path

    def _fs(self, spark):
        jvm = spark.sparkContext._jvm
        root = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return fs, jvm

    def gens_on_disk(self, spark) -> list[tuple[int, bool]]:
        """[(gen, committed?)] for every gen=N child of the root."""
        fs, jvm = self._fs(spark)
        root = jvm.org.apache.hadoop.fs.Path(self.path)
        if not fs.exists(root):
            return []
        out = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("gen="):
                marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), _MARKER)
                out.append((int(name[4:]), bool(fs.exists(marker))))
        return sorted(out)

    def current_gen(self, spark) -> int:
        """The live generation: highest committed, else 0."""
        committed = [g for g, ok in self.gens_on_disk(spark) if ok]
        return committed[-1] if committed else 0

    def gen_path(self, spark) -> str:
        """Path of the live generation directory."""
        return f"{self.path}/gen={self.current_gen(spark)}"

    def commit(self, spark, gen: int) -> None:
        """The atomic flip: one marker-file create makes ``gen`` live."""
        fs, jvm = self._fs(spark)
        fs.createNewFile(
            jvm.org.apache.hadoop.fs.Path(f"{self.path}/gen={gen}/{_MARKER}")
        )

    def reset(self, spark) -> None:
        """Delete the whole generation family (fresh rebuild): removes
        stale markers along with the data, so a rebuild can never leave a
        committed-but-empty higher generation shadowing the new gen=0."""
        fs, jvm = self._fs(spark)
        fs.delete(jvm.org.apache.hadoop.fs.Path(self.path), True)

    def gc_below(self, spark, keep: int) -> None:
        """Drop every generation below ``keep`` (shadowed data + stale
        uncommitted stages left by crashed rewrites)."""
        fs, jvm = self._fs(spark)
        for g, _ in self.gens_on_disk(spark):
            if g < keep:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{self.path}/gen={g}"),
                    True,
                )
