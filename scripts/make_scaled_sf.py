"""Generate an N-fold scaled copy of a testdata scale-factor directory
for empirical scaling captures (VERDICT r5 #2).

Usage: python scripts/make_scaled_sf.py SRC_DIR OUT_DIR [FACTOR]

Replication model — "FACTOR disjoint crawls/regions", chosen so each
operator's WORKLOAD STRUCTURE scales linearly instead of degenerating:

- ``documents``: each replica k>0 suffixes every whitespace token with
  the replica number, so replicas share ZERO word n-grams — the
  duplicated-span / shared-gram / near-dup structure WITHIN each
  replica is identical to the source, and cross-replica duplication is
  zero (naive copying would instead make every doc a 10-way duplicate
  and collapse the dedup workload into one giant clique). Internal
  near-dup structure per replica is preserved exactly.
- ``embeddings``: replica k adds a small deterministic per-replica
  offset (k * 1e-3 per element), preserving cluster geometry (cluster
  spreads are O(1)) without creating exact cross-replica duplicates.
- ``customer``: names get a ``-kk`` suffix for k>0 (two edits), so the
  levenshtein<=1 linkage neighborhoods stay within one replica and the
  verified-pair count scales ~linearly.
- ``orders`` / ``events`` / ``lineitem``: keys shift by k * 10^7 per
  replica (customer FKs shift in lockstep so joins stay consistent);
  numeric/temporal distributions are untouched.
- Tiny dims (``region nation supplier part``) copy as-is.

All transforms are deterministic (no RNG), so repeated runs are
byte-stable modulo parquet encoding.
"""

from __future__ import annotations

import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.session import get_spark

SHIFT = 10_000_000


def _suffix_tokens(col, k: int):
    """Append the replica tag to every whitespace token (codegen HOF)."""
    return F.array_join(
        F.transform(
            F.split(col, r"\s+"), lambda t: F.concat(t, F.lit(f"{k}"))
        ),
        " ",
    )


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_scaled_sf")
    pathlib.Path(out).mkdir(parents=True, exist_ok=True)

    for t in ("region", "nation", "supplier", "part"):
        s = pathlib.Path(src) / f"{t}.parquet"
        dst = pathlib.Path(out) / f"{t}.parquet"
        if dst.is_dir():
            shutil.rmtree(dst)
        elif dst.exists():
            dst.unlink()
        if s.is_dir():
            shutil.copytree(s, dst)
        else:
            shutil.copy2(s, dst)

    def replicate(table: str, transform) -> None:
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = [transform(base, k) for k in range(factor)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(8).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )

    def docs(df, k):
        if k == 0:
            return df
        text = _suffix_tokens(F.col("text"), k)
        return df.select(
            (F.col("doc_id") + k * SHIFT).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        )

    def emb(df, k):
        if k == 0:
            return df
        return df.select(
            (F.col("vec_id") + k * SHIFT).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x: (x + F.lit(float(k) * 1e-3)).cast("float"),
            ).alias("embedding"),
            "label",
        )

    def cust(df, k):
        if k == 0:
            return df
        keep = [c for c in df.columns if c not in ("c_custkey", "c_name")]
        return df.select(
            (F.col("c_custkey") + k * SHIFT).alias("c_custkey"),
            F.concat(F.col("c_name"), F.lit(f"-{k}{k}")).alias("c_name"),
            *keep,
        ).select(*df.columns)

    def orders(df, k):
        if k == 0:
            return df
        return df.withColumn(
            "o_orderkey", F.col("o_orderkey") + k * SHIFT
        ).withColumn("o_custkey", F.col("o_custkey") + k * SHIFT)

    def lineitem(df, k):
        if k == 0:
            return df
        return df.withColumn(
            "l_orderkey", F.col("l_orderkey") + k * SHIFT
        )

    def events(df, k):
        if k == 0:
            return df
        out_cols = df.withColumn(
            "event_id", F.col("event_id") + k * SHIFT
        )
        if "user_id" in df.columns:
            out_cols = out_cols.withColumn(
                "user_id", F.col("user_id") + k * SHIFT
            )
        return out_cols

    replicate("documents", docs)
    replicate("embeddings", emb)
    replicate("customer", cust)
    replicate("orders", orders)
    replicate("lineitem", lineitem)
    replicate("events", events)
    for t in ("documents", "embeddings", "customer", "orders", "lineitem",
              "events"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
