"""Multimodal column handling (north-star pack).

Image/audio/video payloads are opaque ``binary`` columns traveling
next to typed metadata; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each Python worker touches a batch of
payloads at a time (never a Python UDF per row).

The actual codecs (Pillow/torchaudio/ffmpeg) are NOT in this
container, so the decode kernel is stubbed: ``decode_stub=True`` runs
a deterministic fake (hash-derived dimensions) that keeps the whole
Spark-side contract — schema, batch shape, partitioning — real and
testable; ``decode_stub=False`` raises NotImplementedError at the
exact seam where a real decoder plugs in.

Scale notes: binary payloads make wide shuffles catastrophic — every
operator here is shuffle-free (mapInPandas over the scan) and metadata
projections drop the payload column as early as possible. Partition
input files so one parquet row-group's payloads fit executor memory
(spark.sql.files.maxPartitionBytes is the knob).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def decode_media_metadata(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Extract typed metadata from payloads via Arrow-batched
    mapInPandas. Stub mode derives deterministic fake dimensions from
    the payload checksum so tests exercise real batch plumbing."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires Pillow/ffmpeg; "
                    "plug a decoder into decode_media_metadata.batches"
                )
            checksums, widths, heights, durations, sizes = [], [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                checksums.append(digest)
                sizes.append(len(raw))
                seed = int(digest[:8], 16)
                if kind == "image":
                    widths.append(64 + seed % 1920)
                    heights.append(64 + (seed >> 8) % 1080)
                    durations.append(None)
                else:
                    widths.append(None)
                    heights.append(None)
                    durations.append(1000 + seed % 600_000)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array(durations, dtype="Int64"),
                    "checksum": checksums,
                }
            )

    return df.mapInPandas(batches, schema=DECODED_META_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame offset. The offset lattice is computed JVM-side; only the
    (stubbed) frame decode would touch Python."""
    meta = decode_media_metadata(df.filter(F.col("kind") == "video"))
    offsets = F.slice(
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)), 1, max_frames
    )
    return meta.select(
        "media_id",
        "duration_ms",
        F.posexplode(offsets).alias("frame_idx", "offset_ms"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Corpus-level stats without ever decoding: payload sizes per
    kind. Payload column is pruned immediately after length()."""
    return (
        df.select("kind", F.length(F.col("payload")).alias("n_bytes"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        )
    )


def expected_media_metadata(n: int = 64) -> list[tuple]:
    """Pure-Python twin of ``decode_media_metadata`` over
    ``synthetic_media``'s payload spec — the independent oracle source
    for m02/m03. Computed with a plain loop + hashlib (no Spark, no
    pandas, no Arrow), so a regression anywhere in the distributed
    decode plumbing (batching, Arrow conversion, schema binding,
    nullability) diverges from it and turns the driver's hash check
    red. Returns (media_id, kind, n_bytes, width, height, duration_ms,
    checksum) tuples."""
    import hashlib

    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        raw = bytes((i * 7 + j) % 256 for j in range(128 + (i % 5) * 64))
        digest = hashlib.md5(raw).hexdigest()
        seed = int(digest[:8], 16)
        if kind == "image":
            width, height, duration = 64 + seed % 1920, 64 + (seed >> 8) % 1080, None
        else:
            width, height, duration = None, None, 1000 + seed % 600_000
        rows.append((i, kind, len(raw), width, height, duration, digest))
    return rows


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no codecs in env)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(128 + (i % 5) * 64))
        rows.append((i, kind, payload, f"application/x-{kind}", f"s3://fake/{i}"))
    # Right-size partitions to the data: local[32] would otherwise cut
    # 64 rows into 32 two-row partitions, each paying a Python-worker
    # spin-up in the mapInPandas decode (~8 s of pure overhead at
    # bench time). Real media tables size partitions via
    # spark.sql.files.maxPartitionBytes instead.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms_energy", T.DoubleType(), True),
    ]
)


def audio_frame_energy(df: DataFrame, frame_len: int = 64) -> DataFrame:
    """Per-frame RMS energy over audio payloads — a REAL DSP kernel
    (unlike the stubbed codecs): payload bytes are treated as 8-bit
    unsigned PCM, centered to [-128, 127], windowed into
    ``frame_len``-sample frames, and reduced to sqrt(mean(x²)) with
    vectorized numpy inside Arrow-batched mapInPandas.

    Numerics are exactly cross-engine-reproducible by construction:
    samples are integers, so Σx² is an integer-valued float64 (exact
    under any summation order) and /64 is a power-of-two division —
    the sqrt sees bit-identical input in Spark and the SQL oracle.

    Scale shape: shuffle-free — frames materialize map-side over the
    scan and the payload column dies inside the Python worker; output
    is (ids, floats) only. Partial trailing frames are dropped (the
    standard STFT convention)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "n_samples", "rms_energy")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = len(raw) // frame_len
                if n_frames == 0:
                    continue
                x = (
                    np.frombuffer(raw, dtype=np.uint8)[: n_frames * frame_len]
                    .astype(np.float64)
                    - 128.0
                )
                rms = np.sqrt((x * x).reshape(-1, frame_len).mean(axis=1))
                out["media_id"].extend([mid] * n_frames)
                out["frame_idx"].extend(range(n_frames))
                out["n_samples"].extend([frame_len] * n_frames)
                out["rms_energy"].extend(np.round(rms, 4))
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(batches, AUDIO_FRAME_SCHEMA)
    )


IMAGE_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.StringType(), False),
        T.StructField("n_ones", T.LongType(), False),
    ]
)


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over image payloads — the
    image-dedup kernel: average-pool the pixel stream into an 8x8
    grid of 64 cells, then bit_j = (cell_j mean > global mean). Output
    is the 64-char LSB-first bit string plus its popcount; feed the
    fingerprints to the simhash pairing machinery
    (:func:`~..dedup.simhash_near_pairs`'s segment-blocked Hamming
    pattern) for near-dup candidate pairs.

    Like :func:`audio_frame_energy`, this is a REAL kernel with no
    stubbed codec: the "decode" is average pooling, and every
    comparison is integer-exact (cell_sum * 64 > total_sum avoids the
    division entirely), so the DuckDB oracle reproduces it
    arithmetically and m05 gets a hash-checked CORRECTNESS row.

    Scale shape: shuffle-free mapInPandas — payloads die in the
    Python worker; the output row is (id, 64 chars, int). Vectorized
    numpy reshape+sum per image, Arrow-batched transfer.

    Input contract: payloads shorter than 64 bytes (< 1 byte per hash
    cell) are DROPPED, mirroring audio_frame_energy's partial-frame
    drop — a sub-64-byte "image" has no defined 8×8 cell mean, and
    emitting a padded row would hash-diverge from any oracle that
    formulates cells as equal-width slices. synthetic_media always
    generates ≥128-byte payloads, so the m05 oracle never sees the
    dropped branch.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "ahash": [], "n_ones": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = np.frombuffer(
                    bytes(payload) if payload is not None else b"",
                    dtype=np.uint8,
                )
                cl = len(raw) // 64
                if cl == 0:
                    continue
                cells = (
                    raw[: cl * 64].astype(np.int64).reshape(64, cl).sum(axis=1)
                )
                total = int(raw[: cl * 64].sum(dtype=np.int64))
                bits = (cells * 64 > total).astype(np.int64)
                out["media_id"].append(mid)
                out["ahash"].append("".join("1" if b else "0" for b in bits))
                out["n_ones"].append(int(bits.sum()))
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(batches, IMAGE_AHASH_SCHEMA)
    )


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("mad", T.DoubleType(), False),
        T.StructField("is_cut", T.BooleanType(), False),
    ]
)


def video_scene_cuts(
    df: DataFrame, frame_len: int = 32, threshold: float = 60.0
) -> DataFrame:
    """Scene-change detection over video payloads — frame-differencing,
    the classic shot-boundary kernel, with REAL math and no stubbed
    codec (m04/m05's pattern applied to the video modality): payload
    bytes as a frame stream of ``frame_len``-byte frames, per
    consecutive-frame mean absolute difference (MAD), cut flagged
    where MAD > threshold.

    Numerics are exact cross-engine: the sum of absolute byte
    differences (SAD) is an integer, ``mad = round(sad / frame_len,
    4)`` applies the catalog's 4-decimal rounding convention (so
    parity holds for any frame_len, not just power-of-two divisors),
    and the cut decision compares ``sad > threshold * frame_len`` in
    integers — no float boundary can flip between Spark and the SQL
    oracle.

    Output: one row per leading frame of a consecutive pair
    (``frame_idx`` = 0..n_frames-2). Trailing partial frames are
    dropped (the m04 convention); payloads with fewer than two full
    frames emit nothing.

    Scale shape: shuffle-free Arrow-batched mapInPandas — payloads
    die in the Python worker, the output is (ids, double, bool).
    Vectorized: one np.abs over the shifted byte array per payload.
    """
    sad_cut = int(threshold * frame_len)

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "mad": [], "is_cut": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = np.frombuffer(
                    bytes(payload) if payload is not None else b"",
                    dtype=np.uint8,
                ).astype(np.int64)
                m = (len(raw) // frame_len) * frame_len
                if m < 2 * frame_len:
                    continue
                x = raw[:m]
                sad = (
                    np.abs(x[frame_len:] - x[:-frame_len])
                    .reshape(-1, frame_len)
                    .sum(axis=1)
                )
                k = len(sad)
                out["media_id"].extend([mid] * k)
                out["frame_idx"].extend(range(k))
                out["mad"].extend(np.round(sad / float(frame_len), 4))
                out["is_cut"].extend(sad > sad_cut)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(batches, SCENE_CUT_SCHEMA)
    )


def image_neardup_pairs(
    df: DataFrame, max_hamming: int = 6, bands: int = 4
) -> DataFrame:
    """Image-level near-duplicate pairs — the multimodal member of the
    dedup pack: perceptual aHash fingerprints (:func:`image_ahash`)
    banded LSH-style (``bands`` equal slices of the 64-bit hash; two
    images sharing ANY slice are candidates — the d03 idea with
    hash-bit bands instead of MinHash rows), then exact Hamming
    distance over the full 64 bits keeps pairs ≤ ``max_hamming``.

    Output: ``(id_a, id_b, hamming)`` with ``id_a < id_b``. Recall
    trade: a true near-dup pair is missed only when every band differs
    (all-bands-corrupted — vanishing for small Hamming distances:
    ≤ max_hamming bit flips can spoil at most max_hamming bands).

    100 TB shape: fingerprints are 64-char bit strings (payloads died
    in the aHash worker); candidates come from one groupBy-free
    equi-join on (band, band slice); Hamming is computed JVM-side by
    xor-ing the hash halves as integers and bit-counting — no Python,
    no per-character loop, work ∝ candidates, never C(n,2).
    """
    assert 64 % bands == 0, "bands must divide 64"
    width = 64 // bands
    ah = image_ahash(df).select(
        F.col("media_id"),
        F.col("ahash"),
        F.conv(F.substring("ahash", 1, 32), 2, 10)
        .cast("long")
        .alias("h_hi"),
        F.conv(F.substring("ahash", 33, 32), 2, 10)
        .cast("long")
        .alias("h_lo"),
    )
    banded = ah.select(
        "media_id",
        "h_hi",
        "h_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(
                            "ahash", 1 + width * b, width
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "media_id", "h_hi", "h_lo",
        F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"),
    )
    a = banded.select(
        F.col("media_id").alias("id_a"),
        F.col("h_hi").alias("ha_hi"),
        F.col("h_lo").alias("ha_lo"),
        "band", "bkey",
    )
    b = banded.select(
        F.col("media_id").alias("id_b"),
        F.col("h_hi").alias("hb_hi"),
        F.col("h_lo").alias("hb_lo"),
        "band", "bkey",
    )
    hamming = F.bit_count(
        F.col("ha_hi").bitwiseXOR(F.col("hb_hi"))
    ) + F.bit_count(F.col("ha_lo").bitwiseXOR(F.col("hb_lo")))
    return (
        a.hint("shuffle_hash").join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
