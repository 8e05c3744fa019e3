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
