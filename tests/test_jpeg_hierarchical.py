"""Hierarchical JPEG (ITU-T T.81 Annex J) — VERDICT r7 #8, the last codec
decline: DHP + EXP markers, non-differential first stage, differential
SOF5 (DCT) / SOF7 (lossless) later stages combined through the J.1.1.2
upsampling filter.

No stock codec implements Annex J (libjpeg never did), so like the
lossless/12-bit paths validation is round-trip exactness + structural
stream checks: the lossless pyramid must reconstruct BIT-IDENTICALLY, and
the DCT pyramid's decode must equal the encoder's closed-loop
reconstruction EXACTLY (differences are coded against the encoder's own
dequant+IDCT output, computed with the decoder's IEEE op order)."""

import numpy as np
import pytest

from pysparkline.operators import jpeg

rng = np.random.default_rng(42)


def _smooth(h, w, ch=None):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(xx / 7.0) + 50 * np.cos(yy / 9.0)
    if ch:
        img = np.stack(
            [base, np.roll(base, 3, 0), np.roll(base, 5, 1)], axis=2
        )
    else:
        img = base
    return np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(
        np.uint8
    )


# -- lossless pyramid: bit-exact ---------------------------------------------


@pytest.mark.parametrize(
    "shape", [(16, 16), (17, 23), (9, 13, 3), (32, 24, 3), (1, 7), (8, 1)]
)
def test_lossless_hierarchical_bit_exact(shape):
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    payload = jpeg.encode_hierarchical(img, lossless=True, levels=2)
    got = jpeg.decode(payload)
    want = img if img.ndim == 3 else img[:, :, None]
    assert np.array_equal(got, want)


def test_lossless_hierarchical_three_levels():
    img = rng.integers(0, 256, size=(33, 29), dtype=np.uint8)
    payload = jpeg.encode_hierarchical(img, lossless=True, levels=3)
    assert np.array_equal(jpeg.decode(payload), img[:, :, None])


def test_lossless_hierarchical_high_precision():
    img = rng.integers(0, 4096, size=(12, 15), dtype=np.uint16)
    payload = jpeg.encode_hierarchical(img, lossless=True, levels=2)
    got = jpeg.decode(payload)
    assert got.dtype == np.uint16
    assert np.array_equal(got, img[:, :, None])
    assert jpeg.stream_precision(payload) == 12


# -- DCT pyramid: decode == encoder's closed-loop reconstruction -------------


@pytest.mark.parametrize(
    "shape,ch", [((24, 24), None), ((25, 31), None), ((40, 56), 3),
                 ((19, 21), 3)]
)
def test_dct_hierarchical_matches_encoder_recon(shape, ch):
    img = _smooth(*shape, ch)
    payload, recon = jpeg.encode_hierarchical(
        img, quality=90, return_recon=True
    )
    got = jpeg.decode(payload)
    assert np.array_equal(got, recon)
    want = img if img.ndim == 3 else img[:, :, None]
    err = np.abs(got.astype(int) - want.astype(int))
    assert err.mean() < 8  # sanity: the pyramid approximates the original


def test_dct_hierarchical_three_levels():
    img = _smooth(37, 45)
    payload, recon = jpeg.encode_hierarchical(
        img, quality=85, levels=3, return_recon=True
    )
    assert np.array_equal(jpeg.decode(payload), recon)


# -- structural stream checks ------------------------------------------------


def test_stream_structure_markers():
    img = _smooth(20, 20)
    payload = jpeg.encode_hierarchical(img, quality=90)
    assert payload.startswith(b"\xff\xd8")
    assert payload.endswith(b"\xff\xd9")
    assert b"\xff\xde" in payload  # DHP
    assert b"\xff\xdf" in payload  # EXP
    assert b"\xff\xc0" in payload  # first stage: non-differential
    assert b"\xff\xc5" in payload  # differential sequential stage
    ll = jpeg.encode_hierarchical(
        rng.integers(0, 256, (20, 20), dtype=np.uint8), lossless=True
    )
    assert b"\xff\xc3" in ll and b"\xff\xc7" in ll
    assert jpeg.stream_precision(payload) == 8


def test_upsample_filter_spec_values():
    """J.1.1.2: out[2i] = in[i], out[2i+1] = (in[i]+in[i+1]+1)>>1, last
    inserted sample replicates."""
    p = np.array([[0, 10, 255]], dtype=np.int64)
    up = jpeg._hier_upsample(p, 1, 0, 1, 6)
    assert up.tolist() == [[0, 5, 10, 133, 255, 255]]
    q = np.array([[0], [9]], dtype=np.int64)
    upv = jpeg._hier_upsample(q, 0, 1, 4, 1)
    assert upv.reshape(-1).tolist() == [0, 5, 9, 9]


# -- decline paths (honest ValueError, never garbage) -------------------------


def _corrupt(payload: bytes, old: bytes, new: bytes) -> bytes:
    assert old in payload
    return payload.replace(old, new, 1)


def test_differential_frame_outside_hier_declines():
    img = _smooth(16, 16)
    payload = jpeg.encode(img, quality=90)
    bad = _corrupt(payload, b"\xff\xc0", b"\xff\xc5")
    with pytest.raises(ValueError, match="differential frame outside"):
        jpeg.decode(bad)


def test_exp_outside_hier_declines():
    img = _smooth(16, 16)
    payload = jpeg.encode(img, quality=90)
    # splice an EXP segment right after SOI
    bad = payload[:2] + b"\xff\xdf\x00\x03\x11" + payload[2:]
    with pytest.raises(ValueError, match="EXP outside hierarchical"):
        jpeg.decode(bad)


def test_arith_differential_declines():
    img = _smooth(16, 16)
    payload = jpeg.encode_hierarchical(img, quality=90)
    bad = _corrupt(payload, b"\xff\xc5", b"\xff\xcd")  # SOF13 arith diff
    with pytest.raises(ValueError, match="not supported"):
        jpeg.decode(bad)


def test_progressive_differential_declines():
    img = _smooth(16, 16)
    payload = jpeg.encode_hierarchical(img, quality=90)
    bad = _corrupt(payload, b"\xff\xc5", b"\xff\xc6")  # SOF6 prog diff
    with pytest.raises(ValueError, match="not supported"):
        jpeg.decode(bad)


def test_second_non_differential_stage_declines():
    img = _smooth(16, 16)
    payload = jpeg.encode_hierarchical(img, quality=90)
    bad = _corrupt(payload, b"\xff\xc5", b"\xff\xc0")
    with pytest.raises(ValueError, match="second non-differential"):
        jpeg.decode(bad)


def test_mixed_dct_lossless_stages_decline():
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    payload = jpeg.encode_hierarchical(img, lossless=True)
    bad = _corrupt(payload, b"\xff\xc7", b"\xff\xc5")
    with pytest.raises(ValueError, match="mixed DCT/lossless|precision"):
        jpeg.decode(bad)


def test_truncated_hier_stream_declines():
    img = _smooth(16, 16)
    payload = jpeg.encode_hierarchical(img, quality=90)
    # cut before the differential stage's scan completes, keep EOI
    with pytest.raises(ValueError):
        jpeg.decode(payload[: len(payload) * 2 // 3])


def test_levels_must_be_at_least_two():
    with pytest.raises(ValueError, match="levels"):
        jpeg.encode_hierarchical(_smooth(8, 8), levels=1)


# -- existing non-hierarchical paths unaffected --------------------------------


def test_plain_sequential_still_decodes():
    img = _smooth(24, 24, 3)
    got = jpeg.decode(jpeg.encode(img, quality=95))
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 6


def test_plain_lossless_still_bit_exact():
    img = rng.integers(0, 256, (15, 11, 3), dtype=np.uint8)
    assert np.array_equal(
        jpeg.decode(jpeg.encode_lossless(img, predictor=4)), img
    )


def test_lossless_hierarchical_nonstandard_precisions():
    """Review finding #2: DHP parses with the LOSSLESS precision range
    (P=2..16) — 16-bit and 7-bit lossless pyramids round-trip (previously
    the decoder rejected its own encoder's streams outside 8/12)."""
    img16 = np.full((16, 16), 40000, np.uint16)
    p = jpeg.encode_hierarchical(img16, lossless=True)
    assert jpeg.stream_precision(p) == 16
    assert np.array_equal(jpeg.decode(p), img16[:, :, None])
    img7 = rng.integers(0, 100, (11, 9)).astype(np.uint16)
    p2 = jpeg.encode_hierarchical(img7, lossless=True)
    assert jpeg.stream_precision(p2) == 7
    assert np.array_equal(jpeg.decode(p2), img7[:, :, None])
