"""Multimodal plumbing tests: blob schema, header parse, byte features."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_twist_spark.multimodal import (
    HEADER_LEN,
    build_media_table,
    decode_image_real,
    extract_byte_features,
    parse_header,
)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_media_table(docs)


def test_media_blob_layout(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert isinstance(media.schema["media"].dataType, BinaryType)
    row = media.orderBy("doc_id").first()
    blob = bytes(row.media)
    assert blob[:4] == b"ITW1"
    w = int.from_bytes(blob[4:6], "little")
    h = int.from_bytes(blob[6:8], "little")
    c = blob[8]
    assert (w, h, c) == (row.meta.width, row.meta.height, row.meta.channels)


def test_parse_header_matches_meta(spark, sf_dir):
    media = _media(spark, sf_dir)
    h = parse_header(F.col("media"))
    mismatches = media.select(
        ((h.width != F.col("meta.width"))
         | (h.height != F.col("meta.height"))
         | (h.channels != F.col("meta.channels"))
         | (h.magic != "ITW1")).alias("bad")
    ).filter("bad")
    assert mismatches.count() == 0


def test_byte_features_exact_on_known_blob(spark):
    blob = b"ITW1" + (32).to_bytes(2, "little") + (16).to_bytes(2, "little") + b"\x01" + b"abca"
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, media binary")
    r = extract_byte_features(df).collect()[0]
    payload = blob[HEADER_LEN:]
    assert r.mean_byte == sum(payload) / len(payload)
    assert r.max_byte == max(payload)
    assert r.n_distinct_bytes == len(set(payload))


def test_decode_image_real_is_guarded(spark, sf_dir):
    media = _media(spark, sf_dir)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed in this environment; stub not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image_real(media)


def test_resize_decimate_exact_on_known_blob(spark):
    from iceberg_twist_spark.multimodal import RESIZE_OUT_BYTES, resize_decimate
    import numpy as np

    payload = bytes(range(40))
    blob = b"ITW1" + (8).to_bytes(2, "little") + (5).to_bytes(2, "little") + b"\x01" + payload
    df = spark.createDataFrame([(7, bytearray(blob))], "doc_id long, media binary")
    r = resize_decimate(df).collect()[0]
    idx = (np.arange(RESIZE_OUT_BYTES) * len(payload)) // RESIZE_OUT_BYTES
    expected = bytes(payload[i] for i in idx).hex().upper()
    assert r.resized_hex == expected


def test_audio_energy_exact_on_known_blob(spark):
    from iceberg_twist_spark.multimodal import AUDIO_HOP, AUDIO_WIN, audio_energy
    import numpy as np

    payload = bytes((i * 7) % 256 for i in range(100))
    blob = b"ITW1" + (4).to_bytes(2, "little") + (25).to_bytes(2, "little") + b"\x01" + payload
    df = spark.createDataFrame([(3, bytearray(blob))], "doc_id long, media binary")
    rows = {r.win_no: r.rms for r in audio_energy(df).collect()}
    samples = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    expected = {}
    w = 0
    for start in range(0, samples.size, AUDIO_HOP):
        chunk = samples[start : start + AUDIO_WIN]
        if chunk.size == 0:
            break
        expected[w] = float(np.sqrt(np.mean(chunk**2)))
        w += 1
    assert rows == expected


def test_ppm_decode_known_image(spark):
    """The numpy PPM parser must decode a hand-built P6 image exactly."""
    from iceberg_twist_spark.multimodal import decode_ppm

    # 2x2 RGB: red, green, blue, white
    pixels = bytes([255,0,0, 0,255,0, 0,0,255, 255,255,255])
    blob = b"P6\n2 2\n255\n" + pixels
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, media binary")
    row = decode_ppm(df).collect()[0]
    assert (row.width, row.height) == (2, 2)
    assert row.mean_r == (255 + 0 + 0 + 255) / 4
    assert row.mean_g == (0 + 255 + 0 + 255) / 4
    assert row.mean_b == (0 + 0 + 255 + 255) / 4


def test_ppm_decode_skips_corrupt_blobs(spark):
    from iceberg_twist_spark.multimodal import decode_ppm

    bad = [
        (1, bytearray(b"NOTPPM")),
        (2, bytearray(b"P6\n2 2\n255\nshort")),          # truncated pixels
        (3, bytearray(b"P6\n1 1\n65535\n" + b"abc")),     # unsupported maxval
    ]
    df = spark.createDataFrame(bad, "doc_id long, media binary")
    assert decode_ppm(df).count() == 0


def test_wav_decode_known_clip(spark):
    """The numpy WAV parser must decode a stdlib-built PCM16 clip exactly."""
    import io
    import struct
    import wave

    import numpy as np

    from iceberg_twist_spark.multimodal import decode_wav

    samples = [0, 1000, -1000, 32767, -32768, 500, -500, 0]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<8h", *samples))
    df = spark.createDataFrame(
        [(7, bytearray(buf.getvalue()))], "doc_id long, media binary"
    )
    row = decode_wav(df).collect()[0]
    arr = np.asarray(samples, dtype=np.float64)
    assert (row.n_channels, row.sample_rate, row.n_samples) == (1, 8000, 8)
    assert row.duration_ms == 8 * 1000.0 / 8000
    assert row.rms == float(np.sqrt(np.mean(arr**2)))
    assert row.peak == 32768


def test_wav_decode_skips_corrupt_blobs(spark):
    from iceberg_twist_spark.multimodal import decode_wav

    bad = [
        (1, bytearray(b"NOTWAV")),
        (2, bytearray(b"RIFF" + b"\x00" * 40)),  # no WAVE marker
    ]
    df = spark.createDataFrame(bad, "doc_id long, media binary")
    assert decode_wav(df).count() == 0


def test_wav_fixture_is_valid_riff(spark, sf_dir):
    """The JVM-built WAV blobs must be readable by the stdlib wave module."""
    import io
    import wave

    from iceberg_twist_spark.multimodal import build_wav_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = build_wav_table(docs).orderBy("doc_id").first()
    with wave.open(io.BytesIO(bytes(row.media))) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == 64 + row.doc_id % 64


def test_phash_pairs_are_exactly_planted_groups(spark, sf_dir):
    """aHash near-dup pairing must find every planted variant pair
    (groups of 4 share a base image, Hamming <= 2) and nothing else."""
    from iceberg_twist_spark.registry import REGISTRY, _load_all_modules

    _load_all_modules()
    df = REGISTRY["q_mm_phash_dedup"].builder(spark, sf_dir)
    pairs = df.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_groups_of_4 = n_docs // 4
    assert len(pairs) == n_groups_of_4 * 6  # C(4,2) per full group
    assert all(r.doc_a // 4 == r.doc_b // 4 for r in pairs)
    assert all(r.hamming <= 2 for r in pairs)


# ------------------------------------------------------------ PNG (r5)


def test_png_python_roundtrip_all_filters():
    """encode_png (vectorized, filters r%5) -> decode_png_blob
    (sequential reconstruction) must be the identity on arbitrary
    pixels, for heights that exercise every filter type."""
    import numpy as np

    from iceberg_twist_spark.multimodal import decode_png_blob, encode_png

    rng = np.random.RandomState(7)
    for h, w in [(1, 8), (4, 5), (5, 9), (11, 15), (15, 15)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, out = decode_png_blob(encode_png(px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(out, px)


def test_png_unfilter_pinned_vectors():
    """Hand-computed spec vectors (RFC 2083 §6) pin the decoder's
    filter math independently of the encoder, so an encoder/decoder
    inverse-pair bug cannot cancel silently."""
    import numpy as np

    from iceberg_twist_spark.multimodal import png_unfilter

    # one 2-pixel RGB scanline per filter type, second row building on
    # the first (w=2, bpp=3, stride=6)
    # row0 filter 1 (Sub): recon[i] = x[i] + recon[i-3]
    #   x = 10 20 30 5 6 7 -> recon = 10 20 30 15 26 37
    # row1 filter 2 (Up):  recon = x + row0
    #   x = 1 1 1 1 1 1 -> 11 21 31 16 27 38
    stream = bytes([1, 10, 20, 30, 5, 6, 7, 2, 1, 1, 1, 1, 1, 1])
    out = png_unfilter(stream, 2, 2, 3)
    assert out.reshape(2, 6).tolist() == [
        [10, 20, 30, 15, 26, 37],
        [11, 21, 31, 16, 27, 38],
    ]

    # Average: recon[i] = x[i] + (a + b)//2 with row0 = 100.. above
    # row0 filter 0: 100 100 100 100 100 100
    # row1 filter 3: x = 2 2 2 4 4 4
    #   i<3: a=0,b=100 -> 2+50=52 ; i>=3: a=52,b=100 -> 4+76=80
    stream = bytes([0, 100, 100, 100, 100, 100, 100, 3, 2, 2, 2, 4, 4, 4])
    out = png_unfilter(stream, 2, 2, 3)
    assert out.reshape(2, 6).tolist()[1] == [52, 52, 52, 80, 80, 80]

    # Paeth: p = a+b-c; nearest of a,b,c (ties a then b)
    # row0 filter 0: 10 20 30 40 50 60
    # row1 filter 4: x = 1 ...; i<3: a=0,c=0,b=row0 -> p=b -> pred=b
    #   i=0: 1+10=11; i=1: 1+20=21; i=2: 1+30=31
    #   i=3: a=11,b=40,c=10 -> p=41, pa=30,pb=1,pc=31 -> pred=b=40 -> 41
    stream = bytes([0, 10, 20, 30, 40, 50, 60, 4, 1, 1, 1, 1, 0, 0])
    out = png_unfilter(stream, 2, 2, 3)
    row1 = out.reshape(2, 6).tolist()[1]
    assert row1[:4] == [11, 21, 31, 41]


def test_png_decode_rejects_corruption():
    """Any flipped byte must be caught by the CRC / Adler / structure
    checks (decode returns None) or decode to different pixels — never
    silently return the original image."""
    import numpy as np

    from iceberg_twist_spark.multimodal import decode_png_blob, encode_png

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    blob = encode_png(px)
    for pos in (12, 33, len(blob) // 2, len(blob) - 20):
        bad = bytearray(blob)
        bad[pos] ^= 0xFF
        dec = decode_png_blob(bytes(bad))
        assert dec is None or not np.array_equal(dec[2], px)


def test_png_jvm_blob_is_valid(spark, sf_dir):
    """A JVM-constructed stored-DEFLATE PNG must decode via the
    independent zlib path to the md5-derived pixels."""
    import hashlib

    import numpy as np

    from iceberg_twist_spark.catalog import load_tables
    from iceberg_twist_spark.multimodal import build_png_table, decode_png_blob

    docs = load_tables(spark, sf_dir)["documents"].limit(3)
    rows = {r["doc_id"]: bytes(r["media"]) for r in build_png_table(docs).collect()}
    metas = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    assert rows
    for doc_id, blob in rows.items():
        w_exp = 8 + doc_id % 8
        h_exp = 8 + metas[doc_id] % 8
        dec = decode_png_blob(blob)
        assert dec is not None, f"doc {doc_id}: invalid PNG"
        w, h, img = dec
        assert (w, h) == (w_exp, h_exp)
        n_px = w * h * 3
        hx = hashlib.md5(str(doc_id).encode()).hexdigest()
        exp = np.frombuffer(
            (hx * -(-n_px // 32))[:n_px].encode(), dtype=np.uint8
        ).reshape(h, w, 3)
        assert np.array_equal(img, exp)
