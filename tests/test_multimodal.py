"""Multimodal plumbing: exact deterministic outputs of the stubbed decode /
resize / frame-sample stages (the corpus entries hash-check the integer
surface; these pin the actual bytes), plus the stub contract itself."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_features,
    fake_decode,
    pack_media,
    resize_media,
    sample_frames,
)

PAYLOADS = [
    Row(doc_id=1, payload=bytes(range(256)) * 3 + b"tail"),  # 772 bytes
    Row(doc_id=2, payload=b"abc"),
    Row(doc_id=3, payload=b""),
]


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(PAYLOADS)


def test_real_decoders_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_pack_media_metadata(spark, media):
    row = (
        media.filter(F.col("doc_id") == 2)
        .select(pack_media(F.col("payload"), "image/fake").alias("m"))
        .collect()[0]["m"]
    )
    assert row["media_type"] == "image/fake"
    assert row["n_bytes"] == 3
    assert row["checksum_md5"] == hashlib.md5(b"abc").hexdigest()
    assert row["uri"] is None


def test_extract_features_matches_fake_decode(media):
    got = {r["doc_id"]: r.asDict() for r in extract_features(media).collect()}
    for p in PAYLOADS:
        expect = fake_decode(p.payload)
        assert got[p.doc_id]["n_bytes"] == len(p.payload)
        assert got[p.doc_id]["width"] == expect["width"]
        assert got[p.doc_id]["height"] == expect["height"]
        assert got[p.doc_id]["brightness"] == pytest.approx(expect["brightness"])


def test_resize_exact_bytes(media):
    got = {r["doc_id"]: r for r in resize_media(media, factor=4).collect()}
    for p in PAYLOADS:
        expect = p.payload[::4]
        assert got[p.doc_id]["orig_len"] == len(p.payload)
        assert got[p.doc_id]["resized_len"] == len(expect)
        assert bytes(got[p.doc_id]["resized"]) == expect


def test_resize_rejects_bad_factor(media):
    with pytest.raises(ValueError):
        resize_media(media, factor=0)


def test_sample_frames_exact_bytes(media):
    rows = sample_frames(media, frame_bytes=256, every=2).collect()
    got = {(r["doc_id"], r["frame_index"]): r for r in rows}
    # doc 1: 772 bytes -> frames 0,1,2,3 (last is 4 bytes); sampled 0 and 2
    assert set(k for k in got if k[0] == 1) == {(1, 0), (1, 2)}
    p1 = PAYLOADS[0].payload
    assert bytes(got[(1, 0)]["frame"]) == p1[0:256]
    assert bytes(got[(1, 2)]["frame"]) == p1[512:768]
    assert got[(1, 2)]["frame_len"] == 256
    # doc 2: one partial frame
    assert bytes(got[(2, 0)]["frame"]) == b"abc" and got[(2, 0)]["frame_len"] == 3
    # doc 3: empty payload -> zero frames (row-expanding can also contract)
    assert not [k for k in got if k[0] == 3]


def test_sample_frames_every_one_reconstructs(media):
    rows = (
        sample_frames(media.filter(F.col("doc_id") == 1), frame_bytes=100, every=1)
        .orderBy("frame_index")
        .collect()
    )
    assert b"".join(bytes(r["frame"]) for r in rows) == PAYLOADS[0].payload
