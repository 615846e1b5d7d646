"""Lossless JPEG (T.81 Annex H, SOF3): predictive Huffman coding with
modulo-65536 arithmetic — round-trips must be BIT-EXACT for every
predictor and precision (that is the definition of the process; no
IDCT-rounding tolerance anywhere). Stock libjpeg has no lossless support
at all (it was a separate 'lossless JPEG' codec lineage — ljpeg/DNG), so
the validation is exactness by construction plus structural checks."""

from __future__ import annotations

import numpy as np
import pytest

from pysparkline.operators import jpeg
from pysparkline.operators import multimodal as mm


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_rgb_bit_exact_every_predictor(predictor):
    img = _rng(predictor).integers(0, 256, (21, 17, 3), dtype=np.uint8)
    dec = jpeg.decode(jpeg.encode_lossless(img, predictor=predictor))
    assert dec.dtype == np.uint8
    assert np.array_equal(dec, img)


def test_lossless_16bit_gray_bit_exact():
    img = _rng(99).integers(0, 1 << 16, (13, 29), dtype=np.uint16)
    dec = jpeg.decode(jpeg.encode_lossless(img, predictor=4, precision=16))
    assert dec.dtype == np.uint16 and dec.shape == (13, 29, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_lossless_subbyte_precision_and_worst_case_diffs():
    # 4-bit samples; alternating extremes maximize |diff| at every sample
    img = np.zeros((9, 9), dtype=np.uint8)
    img[::2, ::2] = 15
    dec = jpeg.decode(jpeg.encode_lossless(img, predictor=7, precision=4))
    assert np.array_equal(dec[:, :, 0], img)


def test_lossless_point_transform_roundtrip():
    img = _rng(7).integers(0, 4096, (12, 12), dtype=np.uint16)
    enc = jpeg.encode_lossless(
        img, predictor=2, precision=12, point_transform=3
    )
    dec = jpeg.decode(enc)
    assert np.array_equal(dec[:, :, 0], (img >> 3) << 3)


def test_lossless_stream_structure_and_precision_probe():
    img = _rng(1).integers(0, 4096, (8, 8), dtype=np.uint16)
    enc = jpeg.encode_lossless(img, precision=12)
    assert b"\xff\xc3" in enc
    assert jpeg.stream_precision(enc) == 12
    # DCT streams report theirs too
    img8 = _rng(2).integers(0, 256, (8, 8), dtype=np.uint8)
    assert jpeg.stream_precision(jpeg.encode(img8, quality=90)) == 8


def test_lossless_through_decode_image_uint8_contract():
    img = _rng(3).integers(0, 1 << 16, (10, 11, 3), dtype=np.uint16)
    out = mm.decode_image(jpeg.encode_lossless(img, precision=16))
    assert out.dtype == np.uint8
    assert np.array_equal(out, (img >> 8).astype(np.uint8))
    # 8-bit lossless passes through untouched
    img8 = _rng(4).integers(0, 256, (10, 11, 3), dtype=np.uint8)
    out8 = mm.decode_image(jpeg.encode_lossless(img8))
    assert np.array_equal(out8, img8)


def test_lossless_declines():
    img = _rng(5).integers(0, 256, (8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        jpeg.encode_lossless(img, predictor=0)
    with pytest.raises(ValueError, match="precision"):
        jpeg.encode_lossless(img, precision=17)
    with pytest.raises(ValueError, match="exceed"):
        jpeg.encode_lossless(
            np.full((4, 4), 300, dtype=np.uint16), precision=8
        )
    # decoder-side: predictor 0 (Ss=0) in the stream is invalid for a
    # non-hierarchical lossless scan
    enc = bytearray(jpeg.encode_lossless(img, predictor=1))
    j = enc.index(b"\xff\xda")
    # Ss byte offset: 2(marker)+2(len)+1(ns)+2(single comp spec) = j+7
    enc[j + 7] = 0
    with pytest.raises(ValueError, match="predictor"):
        jpeg.decode(bytes(enc))
