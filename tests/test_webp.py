"""From-spec VP8L (WebP lossless) decoder — RFC 9649.

Validation strategy mirrors the JPEG suite (tests/test_jpeg*.py): when the
system libwebp is present (it is in this container — runtime .so only, no
headers), a ctypes harness encodes RANDOM images fresh each run and the
decoder must reproduce them bit-exactly (lossless round trip — any error in
the prefix codes, LZ77 distance map, color cache, or any of the four
inverse transforms breaks equality immediately). Vendored fixture files
under tests/data keep a lib-free subset running everywhere.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
import pytest

from pysparkline.operators import webp

DATA = os.path.join(os.path.dirname(__file__), "data")


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = lib.WebPEncodeLosslessRGB.argtypes
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


LIB = _libwebp()
needs_lib = pytest.mark.skipif(LIB is None, reason="libwebp not installed")


def _enc(img: np.ndarray) -> bytes:
    h, w, ch = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = LIB.WebPEncodeLosslessRGBA if ch == 4 else LIB.WebPEncodeLosslessRGB
    n = fn(img.tobytes(), w, h, w * ch, ctypes.byref(out))
    assert n > 0
    return bytes(bytearray(out[i] for i in range(n)))


def _lib_decode_rgba(data: bytes) -> np.ndarray:
    wo, ho = ctypes.c_int(), ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(wo), ctypes.byref(ho))
    n = wo.value * ho.value * 4
    return np.frombuffer(
        bytes(bytearray(p[i] for i in range(n))), np.uint8
    ).reshape(ho.value, wo.value, 4)


# ------------------------------------------------------------- round trips


def _cases(rng):
    yield "noise", rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    # wide image: LZ77 distances past the 2D neighborhood (code > 120)
    tile = rng.randint(0, 256, (3, 19, 3), dtype=np.uint8)
    yield "tiled_wide", np.tile(tile, (5, 17, 1))
    # gradients: predictor transform across modes
    g = np.zeros((24, 31, 3), np.uint8)
    g[:, :, 0] = (np.arange(31) * 8 % 256)[None, :]
    g[:, :, 1] = (np.arange(24) * 11 % 256)[:, None]
    g[:, :, 2] = (np.add.outer(np.arange(24), np.arange(31)) * 5 % 256)
    yield "grad", g
    # palettes at every bundling width (8/4/2 px per packed pixel, none)
    for n_colors in (2, 3, 5, 12, 17, 300):
        pal = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
        if n_colors <= 256:
            idx = rng.randint(0, n_colors, (13, 29))
            yield f"pal{n_colors}", pal[idx]
        else:
            # >256 distinct colors: no palette possible — literals/cache
            yield "manycolor", rng.randint(0, 256, (20, 20, 3),
                                           dtype=np.uint8)
    # smooth natural-ish content (cross-color transform likely)
    yy, xx = np.mgrid[0:48, 0:48]
    nat = np.stack(
        [np.sin(xx / 5) * 100 + 120, np.sin(yy / 7) * 90 + 130,
         (xx + yy) % 256],
        axis=-1,
    ).astype(np.uint8)
    yield "nat", nat
    yield "solid", np.full((40, 40, 3), (7, 99, 201), np.uint8)
    # 1-pixel and 1-row/1-column edge shapes
    yield "onepix", rng.randint(0, 256, (1, 1, 3), dtype=np.uint8)
    yield "onerow", rng.randint(0, 256, (1, 37, 3), dtype=np.uint8)
    yield "onecol", rng.randint(0, 256, (41, 1, 3), dtype=np.uint8)


@needs_lib
def test_lossless_round_trip_matrix():
    """Fresh libwebp encodings of every content class decode bit-exactly."""
    rng = np.random.RandomState(0)
    for name, img in _cases(rng):
        dec = webp.decode(_enc(img))
        assert dec.shape == img.shape, (name, dec.shape, img.shape)
        assert (dec == img).all(), name


@needs_lib
def test_lossless_round_trip_random_sizes():
    rng = np.random.RandomState(7)
    for _ in range(6 * int(os.environ.get("PYSPARKLINE_FUZZ_SCALE", "1"))):
        h = rng.randint(1, 70)
        w = rng.randint(1, 70)
        kind = rng.randint(3)
        if kind == 0:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == 1:
            pal = rng.randint(0, 256, (rng.randint(2, 30), 3), dtype=np.uint8)
            img = pal[rng.randint(0, len(pal), (h, w))]
        else:
            img = (np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
                   ).astype(np.uint8)[..., None].repeat(3, axis=2)
        dec = webp.decode(_enc(img))
        assert dec.shape == img.shape and (dec == img).all(), (h, w, kind)


@needs_lib
def test_alpha_matches_libwebp_decode():
    """RGBA: compare against libwebp's OWN decode (the encoder may zero RGB
    under fully transparent pixels — decoder parity, not input parity, is
    the contract there)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (12, 17, 4), dtype=np.uint8)
    data = _enc(img)
    dec = webp.decode(data)
    ref = _lib_decode_rgba(data)
    assert dec.shape == (12, 17, 4)
    assert (dec == ref).all()
    # opaque pixels still equal the input exactly
    opaque = img[:, :, 3] == 255
    assert (dec[opaque] == img[opaque]).all()


# ---------------------------------------------------------------- fixtures


def test_vendored_fixtures_decode_exactly():
    """Lib-free path: the vendored lossless fixtures decode to their exact
    source pixels (the same images the driver row's oracle states means
    for)."""
    solid = np.full((16, 16, 3), (200, 31, 90), np.uint8)
    x = np.arange(16)
    grad = np.zeros((16, 16, 3), np.uint8)
    grad[:, :, 0] = (x * 17)[None, :]
    grad[:, :, 1] = (x * 17)[:, None]
    grad[:, :, 2] = 255 - (x * 17)[None, :]
    cb = np.zeros((16, 16, 3), np.uint8)
    mask = ((np.arange(16)[:, None] + np.arange(16)[None, :]) % 2).astype(bool)
    cb[~mask] = (10, 200, 30)
    cb[mask] = (250, 6, 90)
    for name, img in [
        ("webp_solid", solid), ("webp_grad", grad), ("webp_checker", cb)
    ]:
        data = open(os.path.join(DATA, f"{name}.webp"), "rb").read()
        dec = webp.decode(data)
        assert dec.shape == img.shape and (dec == img).all(), name


def test_dimensions_without_decoding():
    data = open(os.path.join(DATA, "webp_grad.webp"), "rb").read()
    assert webp.webp_dimensions(data) == (16, 16)
    lossy = open(os.path.join(DATA, "webp_lossy_solid.webp"), "rb").read()
    assert webp.webp_dimensions(lossy) == (16, 16)


def test_lossy_vp8_declines_honestly():
    """The FROM-SPEC decoder declines lossy VP8 (RFC 6386's trained
    probability tables are constants the offline build cannot re-derive);
    the dispatch layer picks it up below."""
    lossy = open(os.path.join(DATA, "webp_lossy_solid.webp"), "rb").read()
    with pytest.raises(ValueError, match="lossy VP8"):
        webp.decode(lossy)


def test_lossy_vp8_decodes_via_system_libwebp():
    """decode_image's round-10 arm: lossy VP8 routes to the system
    libwebp runtime via ctypes (this container has the .so but neither
    Pillow nor ffmpeg) — output matches a direct library decode exactly
    and is plausibly near the encoder input."""
    from pysparkline.operators import multimodal

    lossy = open(os.path.join(DATA, "webp_lossy_solid.webp"), "rb").read()
    got = multimodal.decode_image(lossy)
    assert got.ndim == 3 and got.shape[2] == 3
    if LIB is not None:
        direct = _lib_decode_rgba(lossy)[:, :, :3]
        assert got.shape == direct.shape
        assert (got == direct).all()


@needs_lib
def test_lossy_vp8_random_image_via_dispatch():
    """Fresh lossy encodings each run: encode random smooth images with
    the system encoder, decode through the DISPATCH (not the lib
    directly), compare bit-exactly with the library's own decode and
    sanity-bound the lossy error vs the source."""
    rng = np.random.default_rng(11)
    for w, h in [(32, 24), (65, 33)]:
        base = rng.integers(0, 255, (1, 1, 3), dtype=np.uint8)
        img = np.clip(
            base.astype(int)
            + rng.integers(-12, 12, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        LIB.WebPEncodeRGB.restype = ctypes.c_size_t
        LIB.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        n = LIB.WebPEncodeRGB(img.tobytes(), w, h, w * 3, 90.0,
                              ctypes.byref(out))
        assert n > 0
        data = bytes(bytearray(out[i] for i in range(n)))
        from pysparkline.operators import multimodal

        got = multimodal.decode_image(data)
        direct = _lib_decode_rgba(data)[:, :, :3]
        assert (got == direct).all()
        err = np.abs(got.astype(int) - img.astype(int)).mean()
        assert err < 12, err  # lossy but near the smooth source


def test_garbage_declines():
    with pytest.raises(ValueError):
        webp.decode(b"RIFF\x00\x00\x00\x00WEBPJUNK")
    with pytest.raises(ValueError):
        webp.decode(b"not a webp at all")


def test_decode_image_routes_webp():
    """multimodal.decode_image serves VP8L through the from-spec decoder
    (no Pillow, no ffmpeg involved for lossless)."""
    from pysparkline.operators import multimodal

    data = open(os.path.join(DATA, "webp_solid.webp"), "rb").read()
    img = multimodal.decode_image(data)
    assert img.shape == (16, 16, 3)
    assert (img == np.array([200, 31, 90], np.uint8)).all()
