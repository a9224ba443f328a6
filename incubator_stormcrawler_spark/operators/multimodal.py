"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched stages.

This is the training-data-pipeline surface the reference doesn't have but a
100 TB corpus needs. Design rules:

* Media bytes ride in a ``content BINARY`` column; structure lives in a
  typed ``media_meta`` struct (kind/width/height/sample_rate/n_frames/
  format) so planning never inspects bytes.
* Every transform is ``mapInPandas`` over batches — one Arrow hop, no
  per-row Python, safe at TB scale; row-multiplying ops (frame sampling)
  yield multiple output rows per input inside the same batch.
* **Codec decode is STUBBED**: real image/audio libs (PIL/ffmpeg) are not
  in this container. ``decode_image``/``decode_audio`` try to import them
  and otherwise fall back to a DETERMINISTIC FAKE decode that interprets
  the raw bytes against the declared metadata (documented below). All
  Spark-side plumbing — schemas, batch shapes, explodes, partitioning —
  is real and tested; swap the decode internals for PIL/ffmpeg in
  production and nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id bigint, kind string, content binary, "
    "media_meta struct<width:int, height:int, sample_rate:int, "
    "n_frames:int, format:string>"
)


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus for tests: images are
    width×height raw bytes derived from md5 streams; audio is int16 PCM;
    video is n_frames concatenated images."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        seed = hashlib.md5(f"media{i}".encode()).digest()
        blob = (seed * 64)
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 16
            content = (blob * ((w * h) // len(blob) + 1))[: w * h]
            meta = (w, h, None, None, "raw8")
        elif kind == "audio":
            sr = 8000
            content = (blob * 8)[: 2 * 2048]  # 2048 int16 samples
            meta = (None, None, sr, None, "pcm16")
        else:
            w, h, nf = 8, 8, 4 + (i % 3)
            content = (blob * ((w * h * nf) // len(blob) + 1))[: w * h * nf]
            meta = (w, h, None, nf, "rawvid8")
        rows.append((i, kind, bytearray(content), meta))
    # Few, well-filled partitions: createDataFrame defaults to
    # defaultParallelism (32 here) slices, and a 60-row corpus sliced 32
    # ways makes every downstream mapInPandas stage fork 32 Python workers
    # for ~2 rows each — pure fan-out overhead that occasionally stalls
    # multi-seconds under memory pressure. Real media tables come from
    # parquet with size-based partitioning; mirror that shape.
    slices = max(2, min(4, n // 16 or 1))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), MEDIA_SCHEMA_DDL
    )


# -- decode stubs -----------------------------------------------------------

def decode_image(content: bytes, meta) -> np.ndarray:
    """Image decode. Real path uses PIL when importable; the STUB path
    (this container) interprets ``content`` as raw grayscale bytes of the
    declared (height, width) — deterministic, shape-correct, codec-free."""
    try:  # pragma: no cover - PIL not in container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(content)).convert("L"))
    except ImportError:
        w, h = meta["width"], meta["height"]
        arr = np.frombuffer(content[: w * h], dtype=np.uint8)
        if arr.size < w * h:
            arr = np.pad(arr, (0, w * h - arr.size))
        return arr.reshape(h, w)


def decode_audio(content: bytes, meta) -> np.ndarray:
    """Audio decode stub: int16 PCM little-endian (real path: soundfile/
    ffmpeg)."""
    return np.frombuffer(content[: (len(content) // 2) * 2], dtype="<i2")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (the stub-visible math; PIL's
    resampling replaces it in production)."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


# -- Spark stages -----------------------------------------------------------

RESIZED_DDL = (
    "media_id bigint, content binary, "
    "media_meta struct<width:int, height:int, sample_rate:int, "
    "n_frames:int, format:string>"
)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Image resize stage: decode → nearest-neighbor resize → raw bytes
    out, metadata updated. Non-image rows are filtered JVM-side first so
    the Python stage only sees relevant bytes (column+row pruning before
    the Arrow hop)."""
    import pandas as pd

    imgs = media.where(F.col("kind") == "image")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.media_meta
                img = decode_image(bytes(row.content), meta)
                res = resize_nearest(img, out_w, out_h)
                out.append(
                    {
                        "media_id": row.media_id,
                        "content": res.astype(np.uint8).tobytes(),
                        "media_meta": {
                            "width": out_w,
                            "height": out_h,
                            "sample_rate": None,
                            "n_frames": None,
                            "format": "raw8",
                        },
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "content", "media_meta"])

    return imgs.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=RESIZED_DDL
    )


FRAME_DDL = (
    "media_id bigint, frame_idx int, content binary, width int, height int"
)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: one output ROW per kept frame (row-multiplying
    mapInPandas — the batch shape the real ffmpeg-backed version uses)."""
    import pandas as pd

    vids = media.where(F.col("kind") == "video")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.media_meta
                w, h, nf = meta["width"], meta["height"], meta["n_frames"]
                raw = bytes(row.content)
                for fi in range(0, nf, every_n):
                    frame = raw[fi * w * h : (fi + 1) * w * h]
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": fi,
                            "content": frame,
                            "width": w,
                            "height": h,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "content", "width", "height"]
            )

    return vids.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=FRAME_DDL
    )


AUDIO_FEAT_DDL = (
    "media_id bigint, n_samples int, rms double, zero_crossings int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction (RMS, zero-crossing count) over PCM —
    real numpy math on the stub decode; an MFCC/fbank impl slots into the
    same stage."""
    import pandas as pd

    auds = media.where(F.col("kind") == "audio")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                samples = decode_audio(bytes(row.content), row.media_meta)
                x = samples.astype(np.float64)
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                out.append(
                    {
                        "media_id": row.media_id,
                        "n_samples": int(x.size),
                        "rms": round(rms, 6),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_samples", "rms", "zero_crossings"]
            )

    return auds.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=AUDIO_FEAT_DDL
    )


EMBED_DDL = "media_id bigint, embedding array<float>"


def byte_embedding(media: DataFrame, dim: int = 64) -> DataFrame:
    """Content embedding from raw bytes: hashed byte-trigram counts folded
    into ``dim`` buckets, L2-normalized. Deterministic and model-free —
    the stand-in for a CLIP/CLAP encoder with the identical column contract
    (composable with operators/similarity.py for cross-modal dedup)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                raw = np.frombuffer(bytes(row.content), dtype=np.uint8)
                vec = np.zeros(dim, dtype=np.float64)
                if raw.size >= 3:
                    tri = (
                        raw[:-2].astype(np.int64) * 65536
                        + raw[1:-1].astype(np.int64) * 256
                        + raw[2:]
                    )
                    np.add.at(vec, tri % dim, 1.0)
                n = np.linalg.norm(vec)
                if n > 0:
                    vec /= n
                out.append(
                    {"media_id": row.media_id,
                     "embedding": vec.astype(np.float32).tolist()}
                )
            yield pd.DataFrame(out, columns=["media_id", "embedding"])

    return media.select("media_id", "content").mapInPandas(run, schema=EMBED_DDL)


AHASH_DDL = "media_id bigint, ahash bigint"


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash per image (aHash): resize to 8×8, bit j
    (row-major, j = y·8+x) set iff pixel ≥ the image's mean — the
    image-dedup analogue of SimHash, robust to rescaling/re-encoding
    noise the byte fingerprint is blind to. Same mapInPandas stage shape
    as ``resize_images`` (decode stubbed, plumbing and hash math real);
    bit 63 wraps into the int64 sign bit so the signature is an ordinary
    BIGINT column both engines compare exactly.

    Mean = sum/64.0 is exact in double (sum ≤ 16320, divisor a power of
    two), so the ≥-mean bit is deterministic cross-engine.
    """
    import pandas as pd

    imgs = media.where(F.col("kind") == "image")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                img = decode_image(bytes(row.content), row.media_meta)
                res = resize_nearest(img, 8, 8).astype(np.int64).ravel()
                mean = res.sum() / 64.0
                h = np.uint64(0)
                for j in range(64):
                    if res[j] >= mean:
                        h |= np.uint64(1) << np.uint64(j)
                out.append({"media_id": row.media_id,
                            "ahash": int(h.astype(np.int64))})
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return imgs.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=AHASH_DDL
    )


def image_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs from aHash signatures — reuses the SimHash
    16-bit banding. At the default ``max_hamming ≤ 3`` the pigeonhole
    guarantees completeness (≤3 differing bits leave ≥1 of the 4 bands
    intact, so every qualifying pair shares a band); wider thresholds
    keep the same plan but trade recall like any banded LSH. One banded
    equi self-join, never all-pairs."""
    from incubator_stormcrawler_spark.operators.dedup import (
        simhash_band_candidates,
    )

    sig = hashes.select(
        F.col("media_id").alias("doc_id"), F.col("ahash").alias("simhash")
    )
    cand = simhash_band_candidates(sig)
    hamming = F.bit_count(
        F.col("s1").bitwiseXOR(F.col("s2"))
    )
    return (
        cand.where(hamming <= max_hamming)
        .select(
            F.col("doc1").alias("media1"),
            F.col("doc2").alias("media2"),
            hamming.cast("int").alias("hamming"),
        )
    )
