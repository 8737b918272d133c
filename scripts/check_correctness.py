"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` through Spark and the matching
``oracle_sql()[name]`` through DuckDB at sf0.01 and compares
row-count + column names + an order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized).
Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from streaming_data_pipeline_azure_spark.functions.cache import release_caches
from streaming_data_pipeline_azure_spark.schemas import TESTDATA_TABLES
from streaming_data_pipeline_azure_spark.session import get_spark

import __spark_entry__ as entrymod


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        release_caches()  # drop operator-internal persists between queries
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        ddf = con.execute(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = [tuple(r) for r in ddf.fetchall()]
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"  {name:28s} {status}  rows {len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {dcols}'} hash "
            f"{'=' if ok_hash else f'{sh} vs {dh}'}"
        )
        if status == "FAIL":
            # VERDICT r8 #1: on ANY mismatch dump both engines' canonical
            # rows (first 3 differing + totals) so a one-row divergence
            # like the r8 priority_price_stump driver-red is self-evident
            # from the gate log alone.
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            cs = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
            cd = sorted("|".join(canon(r[i]) for i in order_d) for r in drows)
            shown = 0
            for i in range(max(len(cs), len(cd))):
                a = cs[i] if i < len(cs) else "<absent>"
                b = cd[i] if i < len(cd) else "<absent>"
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    shown += 1
                    if shown >= 3:
                        break
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
