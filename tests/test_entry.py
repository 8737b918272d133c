"""Smoke tests for the driver contract itself."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "order_id",
        "customer_id",
        "purchase_amount",
        "customer_name",
        "city",
    ]


def test_every_query_runs_and_oracle_keys_subset(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_embedding_incremental_probe_matches_exact_anchor(spark, sf_dir):
    """The IVF-probe incremental dedup must agree with its oracle-green
    exact twin on the registered split: in the near-identical regime
    (cos 0.95, n_probe=4) probe recall vs brute-force batch-vs-corpus is
    1.0, so the survivor sets are identical."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        str(pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    probe = {
        (r["vec_id"], r["label"])
        for r in mod._embedding_neardup_incremental(spark, sf_dir).collect()
    }
    exact = {
        (r["vec_id"], r["label"])
        for r in mod._embedding_neardup_incremental_exact(spark, sf_dir).collect()
    }
    assert probe == exact
    # non-vacuous: planted re-crawls exist in the batch and were dropped
    assert all(v < 1000000 for v, _ in exact)
    assert len(exact) > 0


def test_text_incremental_probe_anchored_by_exact_twin(spark, sf_dir):
    """The MinHash-index incremental dedup is anchored by its oracle-green
    exact twin on the registered split: banding is probabilistic, so
    probe survivors must be a SUPERSET of the exact survivors (exact
    verification means the probe never over-drops), with drop recall
    >= 0.9 (at 32 perms / 8 bands the planted J>=0.85 re-crawls are
    caught with P ~ 0.997+)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        str(pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    probe = {
        r["doc_id"]
        for r in mod._dedup_incremental_neardup(spark, sf_dir).collect()
    }
    exact = {
        r["doc_id"]
        for r in mod._dedup_incremental_neardup_exact(spark, sf_dir).collect()
    }
    assert exact <= probe  # probe never drops a non-duplicate
    all_batch = {
        r["doc_id"]
        for r in mod._doc_delta_split(spark, sf_dir)[1].select("doc_id").collect()
    }
    exact_drops = all_batch - exact
    probe_drops = all_batch - probe
    assert len(exact_drops) > 0  # planted re-crawls make this non-vacuous
    assert len(probe_drops) / len(exact_drops) >= 0.9
    # planted re-crawls carry shifted ids; none may survive the exact twin
    assert all(d < 2000000 for d in exact)


def test_oracle_surfaces_are_type_portable(spark, sf_dir):
    """Schema lint (VERDICT r9 #1): every ORACLE-BACKED entry must
    publish a type-portable surface — no DECIMAL on the Spark side, no
    DECIMAL/HUGEINT on the DuckDB side. Root cause of all six driver
    hash-reds across r8–r9: the driver harness canonicalizes fetched
    Decimal/HUGEINT values differently from the local duckdb/python
    replica, so the VALUES were right but the surface TYPE was not
    portable. Exact integers wider than int64 travel as digit strings;
    (18,4) quantities ≤2^53 travel as exact doubles; everything else
    is bigint/double/varchar/date/bool. Wide-decimal arithmetic stays
    INTERNAL to the operators — only the published projection is
    constrained.

    r12 extension (VERDICT r11 #1): collection types (array/map/
    struct) are banned on EVERY driver-visible surface — oracle-backed
    AND rows-only. `multimodal_features`' array<float> column crashed
    the driver's pandas canonicalizer (`TypeError: unhashable type:
    'list'` in sort_values) even though values were hash-exact
    locally: the ARRAY recurrence of the same portability class.
    Vectors/sketches stay internal; published projections posexplode
    to scalar rows."""
    import duckdb

    from streaming_data_pipeline_azure_spark.functions.cache import (
        release_caches,
    )
    from streaming_data_pipeline_azure_spark.schemas import TESTDATA_TABLES

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    from pyspark.sql import types as T

    offenders = {}
    for name in qs:
        schema = qs[name](spark, sf_dir).schema
        release_caches()
        nonscalar = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nonscalar:
            offenders[name] = f"spark non-scalar: {nonscalar}"
            continue
        if name not in oracles:
            continue  # rows-only: no DuckDB side; decimal is oracle-class
        if "decimal" in schema.simpleString():
            offenders[name] = f"spark: {schema.simpleString()}"
            continue
        rel = con.sql(oracles[name])
        dtypes = [str(t) for t in rel.types]
        bad = [t for t in dtypes if "DECIMAL" in t or "HUGEINT" in t]
        if bad:
            offenders[name] = f"duckdb: {bad}"
    assert not offenders, offenders


def test_hll_twin_exact_at_testdata_cardinality(spark, sf_dir):
    """The rows-only HLL DAU twin must agree with its oracle-backed
    exact anchor EXACTLY at testdata cardinality (HLL sparse mode) —
    the strongest possible anchor for a rows-only entry."""
    exact = {
        (r["day"], r["n_users"])
        for r in entrymod.queries()["daily_active_users"](
            spark, sf_dir
        ).select("day", "n_users").collect()
    }
    approx = {
        (r["day"], r["approx_users"])
        for r in entrymod.queries()["daily_active_users_hll"](
            spark, sf_dir
        ).collect()
    }
    assert approx == exact and len(exact) > 0


def test_source_lang_tvd_bounds_and_identical_mix(spark):
    """TVD semantics pinned: a source with the corpus's exact language
    mix scores 0; a source disjoint in language from everything else
    scores near the (1 - own-share) bound; all values in [0, 10^6]."""
    import __spark_entry__ as entrymod

    rows = []
    # sources s1, s2: identical mixes (2 en + 2 fr each) -> corpus mix
    # is also 50/50 -> TVD 0 for both
    i = 0
    for src in ("s1", "s2"):
        for lang in ("en", "en", "fr", "fr"):
            rows.append((i, "t", lang, src, 1)); i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    import streaming_data_pipeline_azure_spark  # noqa: F401
    from unittest import mock

    with mock.patch.object(entrymod, "_docs", lambda spark, sf: df):
        out = {
            r["source"]: r["tvd_scaled"]
            for r in entrymod._source_lang_tvd(spark, "unused").collect()
        }
    assert out == {"s1": 0, "s2": 0}
    # add a third source entirely in de: its TVD vs the corpus must be
    # 1 - its own corpus share of de (cells: de |1 - 1/3|/... exact:
    # source mix de=1; corpus q_de = 4/12 = 1/3, q_en = q_fr = 1/3
    # TVD = 1/2 (|1-1/3| + 1/3 + 1/3) = 2/3 -> 666666 floor-scaled
    rows3 = rows + [(100 + j, "t", "de", "s3", 1) for j in range(4)]
    df3 = spark.createDataFrame(
        rows3, "doc_id long, text string, lang string, source string, n_chars int"
    )
    with mock.patch.object(entrymod, "_docs", lambda spark, sf: df3):
        out3 = {
            r["source"]: r["tvd_scaled"]
            for r in entrymod._source_lang_tvd(spark, "unused").collect()
        }
    assert out3["s3"] == 666_666
    assert all(0 <= v <= 1_000_000 for v in out3.values())
