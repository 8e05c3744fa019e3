"""r11 (VERDICT r10 #6): undecodable-media accounting — the
reason classifiers (marker/header walks) and the map-side
media_coverage histogram.
"""

import struct

import pytest

from spark_sql_on_hbase_spark.operators.multimodal import (
    encode_bmp,
    encode_jpeg,
    encode_png,
    encode_wav,
    media_coverage,
    media_format,
    undecodable_reason,
)

P = b"some deterministic payload bytes for the codecs 0123456789"


def test_decodable_blobs_have_no_reason():
    from spark_sql_on_hbase_spark.operators.multimodal import (
        encode_jpeg_progressive_payload,
    )

    for blob in (
        encode_bmp(P, 16),
        encode_png(P, 16),
        encode_jpeg(P, 16),
        encode_jpeg_progressive_payload(P, 16),  # r11: progressive decodes
        encode_wav(P),
    ):
        assert undecodable_reason(blob) is None


def test_jpeg_reasons():
    j = encode_jpeg(P, 16)
    i = j.index(b"\xff\xc0")

    def patched(marker):
        return j[: i + 1] + bytes([marker]) + j[i + 2 :]

    assert undecodable_reason(patched(0xCA)) == "arithmetic-jpeg"
    assert undecodable_reason(patched(0xC9)) == "arithmetic-jpeg"
    assert undecodable_reason(patched(0xC3)) == "lossless-jpeg"
    assert undecodable_reason(patched(0xC6)) == "hierarchical-jpeg"
    # SOF2 with a full-band single scan is MALFORMED progressive — the
    # r11 progressive decoder refuses it, and the classifier no longer
    # calls supported-progressive a refusal reason
    assert undecodable_reason(patched(0xC2)) == "corrupt"
    # 12-bit precision: patch the SOF precision byte (offset +4)
    deep = j[: i + 4] + b"\x0c" + j[i + 5 :]
    assert undecodable_reason(deep) == "unsupported-depth"
    # cut before the SOF → truncated
    assert undecodable_reason(j[: i - 2]) == "truncated"
    # cut the tail (no EOI): the entropy decoder fails → truncated
    assert undecodable_reason(j[:-10]) == "truncated"


def test_png_reasons():
    p = encode_png(P, 16)
    assert undecodable_reason(p[:24] + b"\x10" + p[25:]) == "unsupported-depth"
    assert undecodable_reason(p[:25] + b"\x00" + p[26:]) == "unsupported-depth"  # gray
    assert undecodable_reason(p[:28] + b"\x01" + p[29:]) == "interlaced"
    assert undecodable_reason(p[:40]) == "truncated"
    assert undecodable_reason(p[:20]) == "truncated"


def test_bmp_reasons():
    b = encode_bmp(P, 16)
    assert undecodable_reason(b[:40]) == "truncated"
    bpp8 = b[:28] + struct.pack("<H", 8) + b[30:]
    assert undecodable_reason(bpp8) == "unsupported-depth"
    rle = b[:30] + struct.pack("<I", 1) + b[34:]
    assert undecodable_reason(rle) == "compressed"
    assert undecodable_reason(b[:60]) == "truncated"  # header ok, data short


def test_wav_reasons():
    w = encode_wav(P)
    assert undecodable_reason(w[:30]) == "truncated"
    # fmt chunk starts at 12; audio format code at 20
    ulaw = w[:20] + struct.pack("<H", 7) + w[22:]
    assert undecodable_reason(ulaw) == "unsupported-codec"
    bits24 = w[:34] + struct.pack("<H", 24) + w[36:]
    assert undecodable_reason(bits24) == "unsupported-codec"


def test_unknown_and_missing():
    assert undecodable_reason(None) == "missing"
    assert media_format(None) == "missing"
    assert undecodable_reason(b"\x00plain text") == "unknown-format"
    assert media_format(b"\x00plain text") == "unknown"
    assert undecodable_reason(b"") == "unknown-format"


def test_media_coverage_histogram(spark):
    j = encode_jpeg(P, 16)
    i = j.index(b"\xff\xc0")
    rows = [
        (1, encode_bmp(P, 16)),
        (2, encode_bmp(P, 16)),
        (3, j[: i + 1] + b"\xc9" + j[i + 2 :]),
        (4, encode_png(P, 16)[:40]),
        (5, None),
        (6, b"\x00junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, blob binary")
    got = {
        (r.format, r.reason): r.cnt
        for r in media_coverage(df, "blob").collect()
    }
    assert got == {
        ("bmp", "ok"): 2,
        ("jpeg", "arithmetic-jpeg"): 1,
        ("png", "truncated"): 1,
        ("missing", "missing"): 1,
        ("unknown", "unknown-format"): 1,
    }
