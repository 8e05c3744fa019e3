"""r12 VERDICT r11 #6 — REAL MJPEG/AVI video decode (the last
multimodal stub replaced): RIFF container round trip, per-frame JPEG
identity, frame_sample's real-frame dispatch (with the byte-chunk
fallback contract preserved for non-containers), and the fourcc refusal
taxonomy in undecodable_reason / media_coverage."""

import struct

import numpy as np
import pytest

from spark_sql_on_hbase_spark.operators.multimodal import (
    decode_avi,
    decode_jpeg,
    encode_avi_mjpeg,
    encode_jpeg,
    frame_sample,
    media_format,
    undecodable_reason,
    video_frames,
)


def _mk_avi(payloads, width=128, height=None, fps=10):
    frames = [encode_jpeg(p, 16) for p in payloads]
    h = height or 8 * max((len(payloads[0]) + 15) // 16, 1)
    return encode_avi_mjpeg(frames, width, h, fps=fps), frames


def test_avi_roundtrip_container_metadata():
    avi, frames = _mk_avi([b"hello world " * 4, b"second frame!!"], height=24)
    v = decode_avi(avi)
    assert v is not None
    assert v["codec"] == "MJPG"
    assert v["n_frames"] == 2
    assert (v["width"], v["height"]) == (128, 24)
    assert v["usec_per_frame"] == 100_000  # 10 fps
    assert v["frames"] == frames  # byte-identical frame extraction
    # offsets point at the actual JPEG payloads inside the blob
    for off, fr in zip(v["frame_offsets"], frames):
        assert avi[off : off + len(fr)] == fr


def test_avi_frames_decode_exactly():
    payload = bytes(range(0, 256, 8)) * 3
    avi, _ = _mk_avi([payload + bytes([f]) for f in range(3)])
    v = decode_avi(avi)
    for f, fr in enumerate(v["frames"]):
        d = decode_jpeg(fr)
        # constant-block identity: pixels reproduce the payload bytes
        px = d["pixels"].reshape(d["height"], d["width"], 3)
        blocks = px[::8, ::8, 0]  # one sample per 8x8 block
        want = payload + bytes([f])
        got = [int(blocks[i // 16, i % 16]) for i in range(len(want))]
        assert got == list(want)


def test_media_format_and_fourcc_refusal():
    avi, _ = _mk_avi([b"x" * 32])
    assert media_format(avi) == "avi"
    assert undecodable_reason(avi) is None
    # foreign fourcc: patch both strh handler and strf biCompression
    foreign = avi.replace(b"MJPG", b"XVID")
    assert undecodable_reason(foreign) == "unsupported-fourcc-xvid"
    # truncated container
    assert undecodable_reason(avi[:40]) == "truncated"
    # MJPEG whose frame bytes are corrupt: names the frame-level reason
    v = decode_avi(avi)
    off = v["frame_offsets"][0]
    bad = bytearray(avi)
    bad[off] = 0x00  # destroy the frame's SOI marker
    assert undecodable_reason(bytes(bad)) in ("corrupt", "truncated")


def test_video_frames_and_frame_sample(spark):
    payloads = [b"abcdef" * 10, b"zy" * 40]
    rows = []
    for i, p in enumerate(payloads):
        avi, _ = _mk_avi([p + bytes([f]) for f in range(i + 1)])
        rows.append((i, bytearray(avi)))
    rows.append((9, bytearray(b"not a container, just bytes " * 80)))
    df = spark.createDataFrame(rows, "doc_id int, blob binary")
    fr = video_frames(df, "blob").select("doc_id", "frame_idx", "n_frames").collect()
    got = sorted((r.doc_id, r.frame_idx, r.n_frames) for r in fr)
    # non-AVI blob yields NO rows from video_frames
    assert got == [(0, 0, 1), (1, 0, 2), (1, 1, 2)]
    # frame_sample: real frames for AVI, byte-chunk fallback otherwise
    fs = frame_sample(df, "blob", every_n_bytes=100).select(
        "doc_id", "frame_idx", "frame_off"
    ).collect()
    by_doc = {}
    for r in fs:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_off))
    assert [i for i, _ in sorted(by_doc[1])] == [0, 1]
    v1 = decode_avi(bytes(rows[1][1]))
    assert sorted(by_doc[1]) == list(enumerate(v1["frame_offsets"]))
    # fallback: one row per 100-byte window, offsets at k*100
    n9 = len(bytes(rows[2][1])) // 100
    assert sorted(by_doc[9]) == [(k, k * 100) for k in range(n9)]


def test_video_frames_pixel_stats_chain(spark):
    """The suite's grading chain end-to-end: AVI → frames → REAL pixel
    stats match the direct JPEG decode."""
    from spark_sql_on_hbase_spark.operators.multimodal import image_pixel_stats

    payload = b"pixel stats payload 123"
    avi, frames = _mk_avi([payload + bytes([f]) for f in range(2)])
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id int, blob binary")
    stats = image_pixel_stats(video_frames(df, "blob"), "frame").collect()
    assert len(stats) == 2
    for r in sorted(stats, key=lambda r: r.frame_idx):
        d = decode_jpeg(frames[r.frame_idx])
        px = d["pixels"].astype(np.int64)
        assert (r.width, r.height) == (d["width"], d["height"])
        assert r.sum_b == int(px[:, 0].sum())
        j = np.arange(1, px.shape[0] + 1, dtype=np.int64)
        assert r.px_weighted == int(
            (j * (px[:, 0] + 2 * px[:, 1] + 3 * px[:, 2])).sum()
        )


def test_decode_media_reports_video_meta(spark):
    from spark_sql_on_hbase_spark.operators.multimodal import decode_media

    avi, _ = _mk_avi([b"m" * 48, b"n" * 48, b"o" * 48], height=24, fps=5)
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id int, blob binary")
    meta = decode_media(df, "blob").collect()[0].meta
    assert meta["mime"] == "video/x-msvideo"
    assert (meta["width"], meta["height"]) == (128, 24)
    assert meta["codec"] == "MJPG"
    assert meta["duration_ms"] == 600  # 3 frames at 5 fps


def test_avi_idx1_and_padding_shapes():
    """RIFF structural invariants: declared RIFF size, even-chunk
    padding, idx1 entry per frame."""
    avi, frames = _mk_avi([b"q" * 33])  # odd-length JPEG payloads pad
    (riff_len,) = struct.unpack_from("<I", avi, 4)
    assert 8 + riff_len == len(avi)
    assert avi.count(b"00dc") >= len(frames) + 1  # movi chunk + idx1 entry
    assert b"idx1" in avi and b"movi" in avi and b"hdrl" in avi
