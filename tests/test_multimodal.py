"""Multimodal column tests: schema/batch-shape correctness of the stubbed
decode stages (real plumbing, deterministic fake codecs)."""

from __future__ import annotations

import numpy as np
import pytest

from incubator_stormcrawler_spark.operators.multimodal import (
    audio_features,
    byte_embedding,
    decode_image,
    resize_images,
    resize_nearest,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, 30).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_image_stub_shape():
    meta = {"width": 8, "height": 4}
    img = decode_image(bytes(range(32)), meta)
    assert img.shape == (4, 8) and img[0, 0] == 0 and img[3, 7] == 31


def test_resize_nearest_math():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(img, 2, 2)
    assert out.shape == (2, 2)
    assert out[0, 0] == img[0, 0] and out[1, 1] == img[2, 2]


def test_resize_images_stage(media):
    out = resize_images(media, 8, 8).collect()
    n_images = media.where("kind = 'image'").count()
    assert len(out) == n_images
    for r in out:
        assert len(bytes(r.content)) == 64
        assert r.media_meta.width == 8 and r.media_meta.height == 8


def test_sample_frames_explodes_rows(media):
    out = sample_frames(media, every_n=2).collect()
    vids = {r.media_id: r.media_meta.n_frames
            for r in media.where("kind = 'video'").collect()}
    expect = sum((nf + 1) // 2 for nf in vids.values())
    assert len(out) == expect
    for r in out:
        assert len(bytes(r.content)) == r.width * r.height
        assert r.frame_idx % 2 == 0


def test_audio_features(media):
    out = audio_features(media).collect()
    assert len(out) == media.where("kind = 'audio'").count()
    for r in out:
        assert r.n_samples == 2048
        assert r.rms > 0 and r.zero_crossings > 0


def test_byte_embedding_normalized_and_composable(spark, media):
    emb = byte_embedding(media, dim=32)
    rows = emb.collect()
    assert len(rows) == 30
    for r in rows[:5]:
        v = np.array(r.embedding)
        assert v.shape == (32,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # composes with the similarity operator (cross-modal dedup path)
    from pyspark.sql import functions as F
    from incubator_stormcrawler_spark.operators.similarity import cosine_topk

    renamed = emb.withColumnRenamed("media_id", "vec_id")
    top = cosine_topk(renamed, renamed.where(F.col("vec_id") < 3), k=3)
    assert top.count() == 9


def test_image_ahash_and_near_dup_pairs(spark):
    """aHash: identical images hash identically; a lightly-perturbed copy
    lands within a small hamming distance (near-dup found by the banded
    join); an unrelated image does not pair with either."""
    from incubator_stormcrawler_spark.operators.multimodal import (
        MEDIA_SCHEMA_DDL,
        image_ahash,
        image_near_dup_pairs,
        synthesize_media,
    )
    import hashlib

    w, h = 16, 16

    def img_bytes(seed: str) -> bytearray:
        blob = hashlib.md5(seed.encode()).digest() * 64
        return bytearray((blob * ((w * h) // len(blob) + 1))[: w * h])

    base = img_bytes("imgA")
    near = bytearray(base)
    near[0] = (near[0] + 4) % 256  # nudge ONE sampled pixel slightly
    rows = [
        (0, "image", base, (w, h, None, None, "raw8")),
        (1, "image", near, (w, h, None, None, "raw8")),
        (2, "image", bytearray(base), (w, h, None, None, "raw8")),  # exact dup
        (3, "image", img_bytes("unrelated"), (w, h, None, None, "raw8")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
    hashes = image_ahash(media)
    hv = {r.media_id: r.ahash for r in hashes.collect()}
    assert hv[0] == hv[2]                      # exact dup → identical hash
    assert bin(hv[0] ^ hv[1]).count("1") <= 3  # near dup → tiny hamming
    assert bin(hv[0] ^ hv[3]).count("1") > 10  # unrelated → far
    pairs = {(r.media1, r.media2): r.hamming
             for r in image_near_dup_pairs(hashes, max_hamming=3).collect()}
    assert pairs.get((0, 2)) == 0
    assert (0, 1) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_bmp_roundtrip_exact_with_padding():
    """encode_bmp -> decode_bmp is the identity for every width mod 4
    (BMP pads rows to 4-byte boundaries; w=5 gives 1 pad byte, w=6 gives
    2, w=7 gives 3, w=8 none) — real header parsing, bottom-up rows."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    for w in (5, 6, 7, 8):
        img = (np.arange(w * 4, dtype=np.uint8).reshape(4, w) * 7) % 256
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), w


def test_bmp_decode_top_down_rows():
    """Negative biHeight means top-down row order — decode must NOT flip."""
    import struct

    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    img = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    bottom_up = bytearray(encode_bmp(img))
    # rewrite height to -2 and reorder the pixel rows to top-down
    struct.pack_into("<i", bottom_up, 22, -2)
    rows = bytes(bottom_up[54:])
    half = len(rows) // 2
    top_down = bytes(bottom_up[:54]) + rows[half:] + rows[:half]
    assert np.array_equal(decode_bmp(top_down), img)


def test_wav_roundtrip_and_stereo_channel0():
    """encode_wav -> decode_audio is the identity on mono int16; a stereo
    stream decodes to channel 0 of the interleaved frames."""
    import io
    import wave

    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    samples = ((np.arange(300) * 17) % 2048 - 1024).astype("<i2")
    assert np.array_equal(decode_audio(encode_wav(samples), None), samples)
    # stereo: interleave ch0=samples, ch1=-samples
    inter = np.empty(600, dtype="<i2")
    inter[0::2], inter[1::2] = samples, -samples
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(inter.tobytes())
    assert np.array_equal(decode_audio(buf.getvalue(), None), samples)


def test_resize_runs_on_real_bmp_pixels(spark):
    """The resize stage fed REAL BMP bytes must produce exactly the
    nearest-neighbor resize of the true pixel array — the codec path and
    the stage compose (golden test for the r8 real-codec requirement)."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        encode_bmp,
        resize_images,
        resize_nearest,
        MEDIA_SCHEMA_DDL,
    )

    img = ((np.arange(16 * 12).reshape(12, 16) * 31) % 256).astype(np.uint8)
    media = spark.createDataFrame(
        [(0, "image", bytearray(encode_bmp(img)), (16, 12, None, None, "bmp"))],
        MEDIA_SCHEMA_DDL,
    )
    row = resize_images(media, out_w=8, out_h=8).collect()[0]
    got = np.frombuffer(bytes(row.content), dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(got, resize_nearest(img, 8, 8))


def test_audio_features_on_real_wav(spark):
    """audio_features fed a REAL WAV stream must equal the numpy-computed
    RMS / zero-crossing count of the true samples."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        audio_features,
        encode_wav,
        MEDIA_SCHEMA_DDL,
    )

    s = ((np.arange(500) * 13) % 512 - 256).astype("<i2")
    media = spark.createDataFrame(
        [(0, "audio", bytearray(encode_wav(s)), (None, None, 8000, None, "wav"))],
        MEDIA_SCHEMA_DDL,
    )
    row = audio_features(media).collect()[0]
    x = s.astype(np.float64)
    assert row.n_samples == 500
    assert row.rms == round(float(np.sqrt(np.mean(x * x))), 6)
    assert row.zero_crossings == int(
        np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))
    )


def test_png_roundtrip_and_all_filters():
    """encode_png -> decode_png is the identity, and the decoder
    unfilters every PNG row-filter type correctly: a hand-built IDAT
    applies None/Sub/Up/Average/Paeth to known rows and decode must
    recover the original pixels (checked against an independent forward
    filtering of the same data)."""
    import struct
    import zlib

    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_png,
        encode_png,
    )

    img = ((np.arange(40).reshape(5, 8) * 23 + 7) % 256).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)

    # forward-filter img with one filter type per row (grayscale bpp=1)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    h, w = img.shape
    raw = bytearray()
    filters = [0, 1, 2, 3, 4]
    for y in range(h):
        f = filters[y]
        raw.append(f)
        for x in range(w):
            v = int(img[y, x])
            a = int(img[y, x - 1]) if x else 0
            b = int(img[y - 1, x]) if y else 0
            c = int(img[y - 1, x - 1]) if x and y else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            raw.append((v - pred) % 256)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), img)


def test_png_truecolor_decodes_to_gray_mean():
    """An 8-bit RGB (color type 2) PNG decodes to the integer mean of the
    channels — filters span channel boundaries with bpp=3, which this
    exercises via the Sub filter."""
    import struct
    import zlib

    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_png,
    )

    h, w = 3, 4
    rgb = ((np.arange(h * w * 3).reshape(h, w, 3) * 19 + 5) % 256).astype(
        np.uint8
    )
    raw = bytearray()
    for y in range(h):
        raw.append(1)  # Sub filter, left neighbor is 3 bytes back
        row = rgb[y].reshape(-1)
        for x in range(len(row)):
            a = int(row[x - 3]) if x >= 3 else 0
            raw.append((int(row[x]) - a) % 256)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    expect = (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    assert np.array_equal(decode_png(png), expect)


def test_image_stages_on_real_png(spark):
    """resize_images and image_stats fed REAL PNG bytes parse via the
    stdlib PNG path (magic dispatch) and match the numpy reference."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        MEDIA_SCHEMA_DDL,
        encode_png,
        image_stats,
        resize_images,
        resize_nearest,
    )

    img = ((np.arange(16 * 12).reshape(12, 16) * 31) % 256).astype(np.uint8)
    media = spark.createDataFrame(
        [(0, "image", bytearray(encode_png(img)), (16, 12, None, None, "png"))],
        MEDIA_SCHEMA_DDL,
    )
    row = resize_images(media, out_w=8, out_h=8).collect()[0]
    got = np.frombuffer(bytes(row.content), dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(got, resize_nearest(img, 8, 8))
    st = image_stats(media).collect()[0]
    assert (st.width, st.height) == (16, 12)
    assert st.pixel_sum == int(img.sum())


def test_gif_roundtrip_exact_incl_dictionary_saturation():
    """Real GIF89a LZW: encode -> decode is pixel-exact across noise /
    repetitive / constant images, including images large enough to fill
    the 4096-entry dictionary and force the mid-stream CLEAR reset."""
    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.RandomState(7)
    for trial in range(12):
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        if trial % 3 == 0:
            img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        elif trial % 3 == 1:
            img = np.tile(np.arange(w) % 256, (h, 1)).astype(np.uint8)
        else:
            img = np.full((h, w), trial * 6 % 256, np.uint8)
        back = decode_gif(encode_gif(img))
        assert back.shape == img.shape and (back == img).all(), trial
    big = (np.add.outer(np.arange(200), np.arange(300)) * 7 % 256).astype(
        np.uint8
    )
    assert (decode_gif(encode_gif(big)) == big).all()


def test_gif_decoder_reads_spec_conformant_foreign_stream():
    """Decoder independence: a GIF hand-assembled here (clear-before-
    every-code 'uncompressed' LZW — a layout the encoder NEVER emits, but
    spec-legal) must decode to the expected pixels. Catches a decoder
    that merely inverts this repo's own encoder quirks."""
    import struct

    import numpy as np

    from incubator_stormcrawler_spark.operators.multimodal import decode_gif

    w, h = 3, 2
    pixels = [10, 200, 35, 0, 255, 128]
    mcs, clear, eoi = 8, 256, 257
    codes = []
    for p in pixels:
        codes += [clear, p]
    codes.append(eoi)
    acc = nbits = 0
    packed = bytearray()
    for c in codes:  # constant 9-bit width: the dictionary never grows
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + bytes(v for i in range(256) for v in (i, i, i))
        + struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        + bytes([mcs])
        + bytes([len(packed)]) + bytes(packed)
        + b"\x00\x3b"
    )
    got = decode_gif(gif)
    assert (got == np.array(pixels, np.uint8).reshape(h, w)).all()


def test_gif_corpus_stats_match_duckdb_formula_replay(spark):
    """The r10-registration pair proven ahead of time: image_stats over
    the real-GIF corpus == the DuckDB formula replay (same shape as the
    registered BMP/PNG roundtrips)."""
    import duckdb

    from incubator_stormcrawler_spark.operators.multimodal import (
        image_stats,
        synthesize_gif_corpus,
    )

    got = {
        r.media_id: (r.width, r.height, r.n_pixels, r.pixel_sum,
                     r.weighted_sum)
        for r in image_stats(synthesize_gif_corpus(spark, n=20)).collect()
    }
    exp = {
        r[0]: tuple(r[1:])
        for r in duckdb.sql("""
WITH g AS (
  SELECT i, 24 + i % 5 AS w, 18 + i % 4 AS h
  FROM generate_series(0, 19) t(i)
),
px AS (
  SELECT i, w, h, x, y, (3 * x + 17 * y + 23 * i) % 256 AS v
  FROM g,
       unnest(generate_series(0, w - 1)) tx(x),
       unnest(generate_series(0, h - 1)) ty(y)
)
SELECT i AS media_id, w AS width, h AS height,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum(v) AS BIGINT) AS pixel_sum,
       CAST(sum(v * (x + w * y)) AS BIGINT) AS weighted_sum
FROM px GROUP BY i, w, h
ORDER BY media_id
""").fetchall()
    }
    assert got == exp and len(got) == 20
