"""r16 (VERDICT r15 #3): the vectorized JPEG entropy fast paths must be
BIT-IDENTICAL to the scalar loops they replace.

Three classes of change are pinned differentially against the in-tree
scalar oracles (``_fast=False`` on the encoders mirrors the decoder's
existing oracle convention):

* baseline encode — DC-only images take a numpy bit-chunk pack
  (dc_code·diff_bits·EOB per block) instead of per-block ``_BitWriter``
  calls;
* progressive encode — non-interleaved scans vectorize (DC-first
  difference chunks, DC-refinement raw bits, all-zero-band EOB runs);
* sequential + progressive decode — sparse coefficient accumulation and
  bulk EOB-run skips must reproduce the dict-oracle pixels.
"""

import numpy as np
import pytest

from spark_sql_on_hbase_spark.operators import multimodal as M


def _rng():
    return np.random.default_rng(1601)


def test_pack_bit_chunks_matches_bitwriter():
    rng = _rng()
    for _ in range(40):
        n = int(rng.integers(1, 200))
        lens = rng.integers(1, 33, n)
        vals = np.array(
            [int(rng.integers(0, 1 << int(l))) for l in lens], dtype=np.int64
        )
        bw = M._BitWriter()
        for v, l in zip(vals, lens):
            bw.put(int(v), int(l))
        # _BitWriter stuffs 0x00 after every 0xFF as it writes
        assert M._pack_bit_chunks(vals, lens.astype(np.int64)) == bw.flush()
    assert M._pack_bit_chunks(np.array([], dtype=np.int64), np.array([], dtype=np.int64)) == b""


def test_dc_chunks_match_scalar_categories():
    rng = _rng()
    dc = M._huff_codes(*M._JH_DC_LUMA)
    for _ in range(20):
        seq = rng.integers(-1024, 1024, int(rng.integers(1, 120)))
        vals, lens = M._dc_bit_chunks(seq, dc, pred=0)
        bw_ref = M._BitWriter()
        pred = 0
        for v in seq:
            diff = int(v) - pred
            pred = int(v)
            s = M._jpeg_category(diff)
            ln, code = dc[s]
            bw_ref.put(code, ln)
            if s:
                bw_ref.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        bw_new = M._BitWriter()
        for v, l in zip(vals, lens):
            bw_new.put(int(v), int(l))
        assert bw_new.flush() == bw_ref.flush()


def test_baseline_encode_fast_matches_scalar_oracle():
    rng = _rng()
    # payload-style DC-only images (the vectorized path), with restart
    # intervals and 0xFF-dense extremes; plus general images with ACs
    # (which must fall through to the identical scalar stream)
    for trial in range(30):
        payload = bytes(rng.integers(0, 256, int(rng.integers(0, 500)), dtype=np.uint8))
        img = M._payload_gray_image(payload, 16)
        for rst in (0, 1, 7):
            assert M.encode_jpeg_gray(img, restart_interval=rst) == M.encode_jpeg_gray(
                img, restart_interval=rst, _fast=False
            )
    for v in (0, 255, 128):
        img = M._payload_gray_image(bytes([v, 255 - v] * 64), 16)
        assert M.encode_jpeg_gray(img) == M.encode_jpeg_gray(img, _fast=False)
    for trial in range(8):
        img = rng.integers(0, 256, (int(rng.integers(1, 40)), int(rng.integers(1, 40))), dtype=np.uint8)
        assert M.encode_jpeg_gray(img, qtab=list(M._JQ_LUMA)) == M.encode_jpeg_gray(
            img, qtab=list(M._JQ_LUMA), _fast=False
        )


def test_progressive_encode_fast_matches_scalar_oracle():
    rng = _rng()
    for trial in range(20):
        payload = bytes(rng.integers(0, 256, int(rng.integers(0, 500)), dtype=np.uint8))
        assert M.encode_jpeg_progressive(
            M._payload_gray_image(payload, 16), qtab=[1] * 64
        ) == M.encode_jpeg_progressive(
            M._payload_gray_image(payload, 16), qtab=[1] * 64, _fast=False
        )
    # general gray (mixed bands: some scans vectorize, some fall back),
    # color 4:4:4 / 4:2:0, and a partially-smooth image whose EOB runs
    # start and stop mid-scan (exercises the run boundaries)
    for trial in range(8):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert M.encode_jpeg_progressive(img) == M.encode_jpeg_progressive(img, _fast=False)
        imgc = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in (False, True):
            assert M.encode_jpeg_progressive(
                imgc, quality=85, subsample=sub
            ) == M.encode_jpeg_progressive(imgc, quality=85, subsample=sub, _fast=False)
    smooth = np.full((40, 40), 128, dtype=np.uint8)
    smooth[:9, :9] = 7
    assert M.encode_jpeg_progressive(smooth, qtab=list(M._JQ_LUMA)) == M.encode_jpeg_progressive(
        smooth, qtab=list(M._JQ_LUMA), _fast=False
    )


def test_decode_sparse_accumulation_matches_dict_oracle():
    rng = _rng()
    for trial in range(15):
        payload = bytes(rng.integers(0, 256, int(rng.integers(1, 400)), dtype=np.uint8))
        for blob in (
            M.encode_jpeg(payload, 16),
            M.encode_jpeg_progressive_payload(payload, 16),
        ):
            a = M.decode_jpeg(blob)
            b = M.decode_jpeg(blob, _fast=False)
            assert a is not None and b is not None
            assert np.array_equal(a["pixels"], b["pixels"])
        # corrupted variants must agree on rejection/result too
        blob = bytearray(M.encode_jpeg(payload, 16))
        blob[int(rng.integers(0, len(blob)))] ^= int(rng.integers(1, 256))
        a = M.decode_jpeg(bytes(blob))
        b = M.decode_jpeg(bytes(blob), _fast=False)
        assert (a is None) == (b is None)
        if a is not None:
            assert np.array_equal(a["pixels"], b["pixels"])


def test_progressive_bulk_eob_skip_boundaries():
    # images whose nonzero-AC blocks sit at the start, middle and end of
    # the grid: the bulk skip must stop exactly at each nonzero block
    rng = _rng()
    for pos in (0, 1, 5, 9):  # 2x5 block grid: first, early, middle, last
        img = np.full((40, 16), 200, dtype=np.uint8)
        by, bx = divmod(pos, 2)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            rng.integers(0, 256, (8, 8), dtype=np.uint8)
        )
        blob = M.encode_jpeg_progressive(img, qtab=[1] * 64)
        a = M.decode_jpeg(blob)
        b = M.decode_jpeg(blob, _fast=False)
        assert a is not None and np.array_equal(a["pixels"], b["pixels"])
        # and the encoder's EOB-run chunks agree with the scalar stream
        assert blob == M.encode_jpeg_progressive(img, qtab=[1] * 64, _fast=False)


def test_eobn_chunks_flush_semantics():
    ac = M._huff_codes(*M._JH_AC_PROG)
    for n in (0, 1, 2, 0x7FFE, 0x7FFF, 0x8000, 0x7FFF * 2 + 3):
        bw_ref = M._BitWriter()
        st = M._ProgACState(bw_ref, ac)
        for _ in range(n):
            st.eobrun += 1
            if st.eobrun == 0x7FFF:
                st.flush_eob()
        st.flush_eob()
        vals, lens = M._eobn_chunks(n, ac)
        bw_new = M._BitWriter()
        for v, l in zip(vals, lens):
            bw_new.put(int(v), int(l))
        assert bw_new.flush() == bw_ref.flush()
