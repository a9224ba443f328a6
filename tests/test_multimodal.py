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
