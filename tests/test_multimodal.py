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


def _make_bmp(width, height, rgb):
    """Minimal uncompressed 24bpp BMP built with struct (rows padded to 4)."""
    import struct

    row = bytes(rgb) * width
    pad = (4 - (len(row) % 4)) % 4
    pixels = (row + b"\x00" * pad) * height
    data_offset = 54
    size = data_offset + len(pixels)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def _make_wav(n_frames=800, rate=8000, amplitude=16384):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(amplitude * math.sin(2 * math.pi * 440 * i / rate)))
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_real_bmp_decode():
    from elasticsearch_hadoop_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
    )

    bmp = _make_bmp(4, 3, (255, 255, 255))  # all-white pixels
    meta = decode_image(bmp)
    assert meta["width"] == 4 and meta["height"] == 3
    assert meta["bits_per_pixel"] == 24
    assert meta["brightness"] == pytest.approx(1.0)
    dark = decode_bmp(_make_bmp(2, 2, (0, 0, 0)))
    assert dark["brightness"] == pytest.approx(0.0)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"JFIF....")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n....")


def test_real_wav_decode():
    import math

    from elasticsearch_hadoop_spark.operators.multimodal import (
        decode_audio,
        decode_wav,
    )

    wav = _make_wav(n_frames=800, rate=8000, amplitude=16384)
    meta = decode_audio(wav)
    assert meta["channels"] == 1 and meta["sample_width"] == 2
    assert meta["frame_rate"] == 8000 and meta["n_frames"] == 800
    assert meta["duration_seconds"] == pytest.approx(0.1)
    # a 440 Hz sine at half amplitude has RMS ~ 0.5 / sqrt(2)
    assert meta["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=0.05)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03....mp3ish")


def test_real_decoders_through_arrow_pipeline(spark):
    """The real BMP decoder running through the SAME mapInPandas plumbing
    the fake decoder exercises — schema and batching unchanged."""
    from elasticsearch_hadoop_spark.operators.multimodal import (
        decode_bmp,
        extract_features,
    )

    rows = [(1, _make_bmp(8, 2, (255, 255, 255))),
            (2, _make_bmp(3, 5, (0, 0, 0)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    def bmp_decoder(payload: bytes) -> dict:
        m = decode_bmp(payload)
        return {"width": m["width"], "height": m["height"],
                "brightness": m["brightness"]}

    out = {r["doc_id"]: r for r in
           extract_features(df, decoder=bmp_decoder).collect()}
    assert (out[1]["width"], out[1]["height"]) == (8, 2)
    assert out[1]["brightness"] == pytest.approx(1.0)
    assert (out[2]["width"], out[2]["height"]) == (3, 5)
    assert out[2]["brightness"] == pytest.approx(0.0)
