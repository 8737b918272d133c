"""Unit tests for multimodal column plumbing (X5) — schema, Arrow batch
shape, and deterministic stub kernels."""

from __future__ import annotations

import hashlib

from streaming_data_pipeline_azure_spark.operators import multimodal as mm


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    return mm.synthesize_media(docs)


def test_media_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    got = [(f.name, f.dataType.typeName()) for f in media.schema.fields]
    want = [(f.name, f.dataType.typeName()) for f in mm.MEDIA_SCHEMA.fields]
    assert got == want  # nullability may differ on synthesized columns
    assert media.schema["meta"].dataType.fieldNames() == mm.MEDIA_SCHEMA["meta"].dataType.fieldNames()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}


def test_decode_roundtrip(spark, sf_dir):
    media = _media(spark, sf_dir)
    decoded = mm.decode_media(media, partitions=4)
    rows = decoded.collect()
    assert len(rows) == 30
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows:
        assert r["n_bytes"] == len(src[r["media_id"]])
        assert r["sha256"] == hashlib.sha256(src[r["media_id"]]).hexdigest()


def test_feature_extraction_shape(spark, sf_dir):
    feats = mm.extract_features(_media(spark, sf_dir), dim=16).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_frame_sampling(spark, sf_dir):
    frames = mm.sample_frames(_media(spark, sf_dir), every_ms=500, max_frames=4)
    rows = frames.collect()
    assert rows, "video rows must produce frames"
    per_media: dict[int, list] = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r)
    for mid, fr in per_media.items():
        assert len(fr) <= 4
        idxs = sorted(f["frame_idx"] for f in fr)
        assert idxs == list(range(len(fr)))


def test_frame_idx_stable_across_arrow_batches(spark, sf_dir):
    """VERDICT r2 #2: frame_idx must not restart when one media's frames
    straddle an Arrow batch boundary. Force 2-row batches so every media's
    4 frames are guaranteed to split across batches."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "2")
    try:
        frames = mm.sample_frames(
            _media(spark, sf_dir).coalesce(1), every_ms=500, max_frames=4
        )
        rows = frames.collect()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    per_media: dict[int, list] = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r)
    multi = [fr for fr in per_media.values() if len(fr) > 2]
    assert multi, "need media with >2 frames to cross a 2-row batch boundary"
    for fr in per_media.values():
        idxs = sorted(f["frame_idx"] for f in fr)
        assert idxs == list(range(len(fr))), "frame_idx restarted mid-media"
        by_idx = {f["frame_idx"]: f["frame_ms"] for f in fr}
        assert by_idx[idxs[0]] == 0  # position 0 is the first sampled frame


def test_resize_images(spark, sf_dir):
    media = _media(spark, sf_dir)
    resized = mm.resize_images(media, target_width=64, target_height=64)
    rows = resized.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images > 0
    src = {r["media_id"]: r for r in media.collect()}
    for r in rows:
        assert (r["width"], r["height"]) == (64, 64)
        m = src[r["media_id"]]["meta"]
        ratio = (64 * 64) / max(m["width"] * m["height"], 1)
        expect = max(int(len(bytes(src[r["media_id"]]["payload"])) * min(ratio, 1.0)), 1)
        assert len(bytes(r["payload"])) == expect


# ---- perceptual-hash near-dup ----


def _pixels_df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, pixels array<double>")


def _image(seed=42, noise_seed=None, noise_amp=0.0, n=32):
    """Deterministic broadband 'natural-ish' image: a fixed-seed smooth
    random field (8x8 coarse values upsampled blockily), whose energy
    spreads across the whole low-frequency DCT block — a pure gradient
    or exact-bin sinusoid would leave most coefficients at the median
    and make the hash degenerate."""
    import numpy as np

    coarse = np.random.RandomState(seed).uniform(0.0, 255.0, (8, 8))
    img = np.kron(coarse, np.ones((n // 8, n // 8)))
    if noise_seed is not None:
        rng = np.random.RandomState(noise_seed)
        img = img + rng.uniform(-noise_amp, noise_amp, size=(n, n))
    return img.flatten().tolist()


def test_phash_identical_and_perturbed_and_distinct(spark):
    import numpy as np

    from streaming_data_pipeline_azure_spark.operators import multimodal as mm

    rows = [
        (1, _image()),
        (2, _image()),                                 # identical
        (3, _image(noise_seed=7, noise_amp=2.0)),      # small noise
        (4, _image(seed=77)),                          # different image
    ]
    h = {
        r["media_id"]: r["phash"]
        for r in mm.phash_from_pixels(_pixels_df(spark, rows)).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert h[1] == h[2]
    assert ham(h[1], h[3]) <= 3          # DCT low-freq robust to noise
    assert ham(h[1], h[4]) > 10          # structural change moves many bits


def test_phash_neardup_pairs_banding_and_verify(spark):
    from streaming_data_pipeline_azure_spark.operators import multimodal as mm

    import pytest

    rows = [
        (1, _image()),
        (2, _image(noise_seed=3, noise_amp=2.0)),
        (3, _image(seed=77)),
    ]
    hashes = mm.phash_from_pixels(_pixels_df(spark, rows))
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.phash_neardup_pairs(hashes, max_hamming=3).collect()
    }
    assert set(got) == {(1, 2)} and got[(1, 2)] <= 3
    with pytest.raises(ValueError, match="max_hamming"):
        mm.phash_neardup_pairs(hashes, max_hamming=8)


def test_phash_media_pipeline_exact_dups(spark, sf_dir):
    """End-to-end over the stub pixel extraction: exact duplicate
    payloads hash identically and pair at hamming 0; the plumbing
    (binary payloads -> Arrow batches -> banding join) is real."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = mm.synthesize_media(docs)
    dup = media.filter(F.col("media_id") == 0).withColumn(
        "media_id", F.col("media_id") + 1000000
    )
    hashes = mm.phash_from_pixels(mm.stub_pixels(media.unionByName(dup)))
    pairs = mm.phash_neardup_pairs(hashes, max_hamming=0).collect()
    assert any(
        (r["id_a"], r["id_b"]) == (0, 1000000) and r["hamming"] == 0
        for r in pairs
    )


def test_scene_changes_flags_payload_jumps(spark):
    """Planted frame payloads pin shot-boundary semantics: identical
    consecutive payloads -> delta 0, a payload switch -> delta spike
    above threshold; the first frame always starts a scene; signature
    ordering follows frame_idx, not row order."""
    from streaming_data_pipeline_azure_spark.operators.multimodal import (
        scene_changes,
    )

    a, b = b"\x10" * 16, b"\xf0" * 16
    rows = [
        # media 1: A A B A  (boundaries at frames 0, 2, 3)
        (1, 2, 2000, b), (1, 0, 0, a), (1, 1, 1000, a), (1, 3, 3000, a),
        # media 2: single frame
        (2, 0, 0, a),
    ]
    frames = spark.createDataFrame(
        rows, "media_id long, frame_idx int, frame_ms int, frame_payload binary"
    )
    got = {
        (r["media_id"], r["frame_idx"]): (r["is_scene_start"], r["scene_delta"])
        for r in scene_changes(frames, threshold=0.15).collect()
    }
    assert got[(1, 0)][0] and got[(1, 0)][1] is None
    assert not got[(1, 1)][0] and got[(1, 1)][1] == 0.0
    assert got[(1, 2)][0] and got[(1, 2)][1] > 0.8  # 0x10 -> 0xf0 jump
    assert got[(1, 3)][0]
    assert got[(2, 0)][0]
