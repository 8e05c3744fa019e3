"""r8 (VERDICT r7 #8): real 24-bpp BMP codec — pure-stdlib encoder +
pure-numpy decoder behind the existing multimodal kernel interface.
Property-tested over widths that do and don't need stride padding,
bottom-up AND top-down (negative height) files, and truncated input.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.operators import multimodal as M


@pytest.mark.parametrize("width", [1, 2, 3, 5, 16])  # strides 3,6,9,15,48
@pytest.mark.parametrize("n", [0, 1, 2, 3, 47, 48, 49, 300])
def test_bmp_roundtrip_property(width, n):
    payload = bytes((7 * i + 13) % 256 for i in range(n))
    blob = M.encode_bmp(payload, width=width)
    d = M.decode_bmp(blob)
    assert d is not None
    row_raw = width * 3
    exp_h = max(1, -(-n // row_raw))
    assert (d["width"], d["height"]) == (width, exp_h)
    flat = d["pixels"].reshape(-1)  # top-down row-major BGR
    assert bytes(flat[:n]) == payload  # payload recovered in order
    assert not flat[n:].any()  # zero fill beyond payload


def test_bmp_stride_is_padded_to_4_bytes():
    # width 1 → 3 raw bytes/row → stride 4: decoder must strip 1 pad byte
    blob = M.encode_bmp(bytes(range(9)), width=1)
    d = M.decode_bmp(blob)
    assert d["height"] == 3
    assert bytes(d["pixels"].reshape(-1)) == bytes(range(9))


def test_bmp_top_down_negative_height():
    # hand-build a top-down file (negative height): rows stored first-row
    # first, so the decoder must NOT flip
    w, h = 2, 2
    rows = [bytes([r * 10 + c for c in range(6)]) + b"\x00\x00" for r in range(h)]
    px = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(px), 0, 0, 0, 0)
    d = M.decode_bmp(hdr + info + px)
    assert d["height"] == 2
    flat = bytes(d["pixels"].reshape(-1))
    assert flat == bytes([0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 15])


def test_bmp_rejects_unsupported_and_truncated():
    assert M.decode_bmp(b"") is None
    assert M.decode_bmp(b"notabmp" * 20) is None
    good = M.encode_bmp(b"hello world pixels!", width=2)
    assert M.decode_bmp(good[:40]) is None  # truncated header
    assert M.decode_bmp(good[:-8]) is None  # truncated pixel data
    # 8-bpp header → unsupported, falls back (None), never crashes
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)
    assert M.decode_bmp(bytes(bad)) is None


def test_decode_media_dispatches_real_bmp(spark):
    payload = b"The quick brown fox jumps over the lazy dog" * 3
    rows = [(1, M.encode_bmp(payload, width=4)), (2, b"not an image")]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r.id: r.meta for r in M.decode_media(df, "blob").collect()}
    assert out[1]["mime"] == "image/bmp"
    assert out[1]["width"] == 4
    assert out[1]["height"] == -(-len(payload) // 12)
    assert out[2]["mime"] == "image/fake"  # stub fallback kept


def test_image_pixel_stats_exact_sums(spark):
    payload = bytes((i * 31 + 5) % 256 for i in range(100))
    df = spark.createDataFrame([(1, payload)], "id long, blob binary")
    out = M.image_pixel_stats(M.encode_bmp_column(df, "blob", width=4), "bmp").collect()[0]
    b = sum(payload[0::3])
    g = sum(payload[1::3])
    r = sum(payload[2::3])
    w = sum(
        (i // 3 + 1) * (i % 3 + 1) * payload[i] for i in range(len(payload))
    )
    assert (out.sum_b, out.sum_g, out.sum_r, out.px_weighted) == (b, g, r, w)
    assert (out.width, out.height) == (4, -(-100 // 12))
    # non-BMP blob → NULL stats
    df2 = spark.createDataFrame([(2, b"xx")], "id long, bmp binary")
    out2 = M.image_pixel_stats(df2, "bmp").collect()[0]
    assert out2.width is None and out2.px_weighted is None


# --- r9: real PNG codec (stdlib zlib + numpy) -------------------------------

def test_png_roundtrip_random_payloads():
    import random

    import numpy as np

    from spark_sql_on_hbase_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = random.Random(7)
    for _ in range(40):
        n = rng.randrange(0, 200)
        payload = bytes(rng.randrange(256) for _ in range(n))
        d = decode_png(encode_png(payload, width=16))
        assert d is not None
        assert d["width"] == 16 and d["height"] == max(1, -(-n // 48))
        padded = payload + b"\x00" * (48 * d["height"] - n)
        rgb = np.frombuffer(padded, np.uint8).reshape(-1, 3)
        # decoder reports BGR (channel-uniform with decode_bmp)
        assert np.array_equal(d["pixels"], rgb[:, ::-1])
        assert decode_image(encode_png(payload))["width"] == 16


def test_png_reverses_all_five_scanline_filters():
    """A foreign encoder may emit Sub/Up/Average/Paeth rows — build one
    file using every filter type and require exact pixel recovery."""
    import struct
    import zlib

    import numpy as np

    from spark_sql_on_hbase_spark.operators.multimodal import decode_png

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    w, h = 4, 5
    img = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w * 3)
    enc = []
    for r in range(h):
        f = r % 5
        cur = img[r].astype(np.int64)
        prev = img[r - 1].astype(np.int64) if r > 0 else np.zeros(w * 3, np.int64)
        out = np.empty(w * 3, np.int64)
        for i in range(w * 3):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                out[i] = cur[i]
            elif f == 1:
                out[i] = (cur[i] - a) & 0xFF
            elif f == 2:
                out[i] = (cur[i] - b) & 0xFF
            elif f == 3:
                out[i] = (cur[i] - (a + b) // 2) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (cur[i] - pr) & 0xFF
        enc.append(bytes([f]) + bytes(out.astype(np.uint8)))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(enc)))
        + chunk(b"IEND", b"")
    )
    d = decode_png(blob)
    assert d is not None
    assert np.array_equal(d["pixels"], img.reshape(-1, 3)[:, ::-1])


def test_png_sub_filter_vectorized_wraparound():
    """r10 (ADVICE r9 #2): Sub reversal is now a per-channel cumsum mod
    256 — pin it on a wide row whose running sums wrap many times, where
    a missing mod or channel-phase slip would diverge from the
    sequential definition."""
    import struct
    import zlib

    import numpy as np

    from spark_sql_on_hbase_spark.operators.multimodal import decode_png

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(13)
    w, h = 300, 3  # 900-byte rows: sums wrap ~hundreds of times
    img = rng.integers(0, 256, size=(h, w * 3), dtype=np.int64)
    enc = []
    for r in range(h):
        cur = img[r]
        out = np.empty(w * 3, np.int64)
        for i in range(w * 3):
            a = cur[i - 3] if i >= 3 else 0
            out[i] = (cur[i] - a) & 0xFF  # forward Sub filter
        enc.append(b"\x01" + bytes(out.astype(np.uint8)))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(enc)))
        + chunk(b"IEND", b"")
    )
    d = decode_png(blob)
    assert d is not None
    assert np.array_equal(d["pixels"], img.astype(np.uint8).reshape(-1, 3)[:, ::-1])


def test_png_rejects_unsupported_shapes():
    from spark_sql_on_hbase_spark.operators.multimodal import decode_png, encode_png

    assert decode_png(b"not a png") is None
    assert decode_png(None) is None
    good = encode_png(b"abcdef")
    # corrupt the IHDR color type → unsupported, refuse (no wrong pixels)
    bad = bytearray(good)
    bad[8 + 8 + 9] = 6  # RGBA
    assert decode_png(bytes(bad)) is None
    # truncated IDAT → refuse
    assert decode_png(good[: len(good) - 20]) is None


# --- r9: real WAV codec (RIFF 16-bit PCM, stdlib struct + numpy) ------------

def test_wav_roundtrip_and_stdlib_parity():
    import io
    import random
    import wave as stdwave

    import numpy as np

    from spark_sql_on_hbase_spark.operators.multimodal import decode_wav, encode_wav

    rng = random.Random(11)
    for _ in range(30):
        n = rng.randrange(0, 101)
        payload = bytes(rng.randrange(256) for _ in range(n))
        blob = encode_wav(payload, 8000)
        d = decode_wav(blob)
        assert d is not None and d["sample_rate"] == 8000 and d["n_channels"] == 1
        padded = payload + (b"\x00" if n % 2 else b"")
        assert np.array_equal(d["samples"], np.frombuffer(padded, "<i2").astype(np.int32))
        # the PUBLIC reference implementation (stdlib wave) reads our files
        w = stdwave.open(io.BytesIO(blob))
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 8000)
        assert w.readframes(w.getnframes()) == padded


def test_wav_rejects_unsupported():
    from spark_sql_on_hbase_spark.operators.multimodal import decode_wav, encode_wav

    assert decode_wav(b"RIFFjunk") is None
    assert decode_wav(None) is None
    good = bytearray(encode_wav(b"abcd"))
    good[20] = 3  # audio format != PCM
    assert decode_wav(bytes(good)) is None
    # r10 (ADVICE r9 #3): a data chunk whose declared length runs past
    # the blob is corrupt — refuse, don't return a partial sample array
    assert decode_wav(bytes(encode_wav(b"abcdef"))[:-2]) is None


def test_decode_media_stereo_duration(spark):
    """r10 (ADVICE r9 #2): duration counts FRAMES, not interleaved
    samples — a foreign stereo file must not report 2× its length."""
    import struct

    from spark_sql_on_hbase_spark.operators.multimodal import decode_media, encode_wav

    # rewrite the in-house mono header to declare 2 channels: 8000
    # interleaved samples at 8000 Hz stereo = 4000 frames = 500 ms
    blob = bytearray(encode_wav(b"\x01\x02" * 8000, sample_rate=8000))
    struct.pack_into("<H", blob, 22, 2)  # n_channels
    df = spark.createDataFrame([(1, bytes(blob))], "id long, blob binary")
    meta = decode_media(df).collect()[0].meta
    assert meta.mime == "audio/wav"
    assert meta.duration_ms == 500


def test_audio_sample_stats_exact(spark):
    import numpy as np

    from spark_sql_on_hbase_spark.operators.multimodal import (
        audio_sample_stats,
        encode_wav,
        encode_wav_column,
    )

    rows = [(1, b"\x01\x00\xff\xff\x02\x00"), (2, b""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {
        r.doc_id: r
        for r in audio_sample_stats(
            encode_wav_column(df, "blob").drop("blob"), "wav"
        ).collect()
    }
    # samples of doc 1: [1, -1, 2] -> sum_abs 4, sum_sq 6, signs [1,-1,1]
    # -> 2 zero crossings, peak 2
    r1 = out[1]
    assert (r1.n_samples, r1.sum_abs, r1.sum_sq, r1.zero_cross, r1.peak) == (3, 4, 6, 2, 2)
    r2 = out[2]
    assert (r2.n_samples, r2.sum_abs, r2.sum_sq, r2.zero_cross, r2.peak) == (0, 0, 0, 0, 0)
    r3 = out[3]
    assert r3.n_samples is None and r3.sum_abs is None and r3.peak is None


def test_decode_media_real_formats(spark):
    """decode_media dispatches BMP/PNG/WAV to the REAL codecs (dims and
    duration from headers), stub only for unknown formats."""
    from spark_sql_on_hbase_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_png,
        encode_wav,
    )

    rows = [
        (1, encode_bmp(b"x" * 96, width=4)),     # 4x8 BMP
        (2, encode_png(b"y" * 24, width=4)),     # 4x2 PNG
        (3, encode_wav(b"z" * 16000, 8000)),     # 8000 samples @ 8 kHz = 1 s
        (4, b"unknown-format-bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r.doc_id: r.meta for r in decode_media(df, "blob").collect()}
    assert (got[1].mime, got[1].width, got[1].height) == ("image/bmp", 4, 8)
    assert (got[2].mime, got[2].width, got[2].height) == ("image/png", 4, 2)
    assert (got[3].mime, got[3].duration_ms, got[3].codec) == ("audio/wav", 1000, "pcm_s16le")
    assert got[4].mime == "image/fake"  # honest stub for unknown formats
