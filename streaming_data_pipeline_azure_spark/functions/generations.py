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

_MARKER = "_COMMITTED"


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
