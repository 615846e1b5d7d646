"""WEBP decode from spec — pure Python/NumPy, no codec libraries.

Round 9 closes the WEBP arm of the codec tail (TODO "codec tail"; the
reference repo shipped no media decoding at all — this belongs to the
beyond-reference multimodal surface, SURVEY.md §2 LLM-pipeline rows).

Implemented here:

- RIFF container parsing (``VP8X`` extended files route to their inner
  bitstream chunk; animation/alpha-chunk files decline honestly).
- **VP8L — the complete WebP Lossless Bitstream Specification (RFC 9649)**:
  LSB-first bit reading, canonical prefix codes (simple 1/2-symbol and
  code-length-coded forms with 16/17/18 repeat codes), color cache,
  meta-prefix (entropy-image) code selection, LZ77 backward references
  with the 120-entry 2D distance neighborhood, and all four transforms
  inverted in reverse stream order — PREDICTOR (14 modes incl. Select and
  the truncating ClampAddSubtractHalf), COLOR (signed 3.5 fixed-point
  cross-color deltas), SUBTRACT_GREEN, and COLOR_INDEXING (palette with
  delta coding and sub-byte pixel bundling).

Lossless decode is exact BY CONSTRUCTION — tests round-trip random images
through libwebp's encoder (driven via ctypes when ``libwebp.so`` is
present; vendored fixture files otherwise) and require bit-identical
pixels. Lossy VP8 intra stays an honest ``ValueError`` decline here
(``multimodal.decode_image`` then tries Pillow/ffmpeg as before).

Scale posture: decoding runs per payload inside Arrow-batched
``mapInPandas`` workers (multimodal.image_features) — the Spark-side
plumbing (schema, batching, error routing) is the distributed part; the
codec itself is single-image and allocation-light (one uint32 ARGB array
per image plus sub-resolution transform images).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode", "decode_vp8l", "webp_dimensions"]


# ---------------------------------------------------------------------------
# RIFF container
# ---------------------------------------------------------------------------


def _chunks(data: bytes):
    """Iterate (fourcc, payload) over a RIFF body (chunks are 2-padded)."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + size]
        yield fourcc, payload
        pos += 8 + size + (size & 1)


def decode(data: bytes) -> np.ndarray:
    """Decode a WEBP payload to (h, w, 3|4) uint8. VP8L (lossless) decodes
    from spec; VP8 (lossy) / animation / alpha-chunk files raise
    ValueError so callers can route to an optional external decoder."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP payload")
    for fourcc, payload in _chunks(data):
        if fourcc == b"VP8L":
            return decode_vp8l(payload)
        if fourcc == b"VP8 ":
            raise ValueError("lossy VP8 stream (spec decoder covers VP8L)")
        if fourcc == b"ANIM":
            raise ValueError("animated WEBP")
        if fourcc == b"ALPH":
            raise ValueError("lossy WEBP with alpha chunk")
    raise ValueError("no VP8/VP8L chunk in WEBP container")


def webp_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the container without decoding pixels."""
    for fourcc, payload in _chunks(data):
        if fourcc == b"VP8X":
            w = 1 + int.from_bytes(payload[4:7], "little")
            h = 1 + int.from_bytes(payload[7:10], "little")
            return w, h
        if fourcc == b"VP8L":
            bits = int.from_bytes(payload[1:4], "little")
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if fourcc == b"VP8 ":
            # keyframe: 3-byte frame tag, 3-byte start code, then dims
            w = struct.unpack("<H", payload[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", payload[8:10])[0] & 0x3FFF
            return w, h
    raise ValueError("no VP8/VP8L chunk in WEBP container")


# ---------------------------------------------------------------------------
# VP8L bit reader (LSB-first)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        p = self.pos
        if p + k > self.n:
            raise ValueError("VP8L: bitstream overrun")
        self.pos = p + k
        byte0 = p >> 3
        # gather enough bytes to cover k bits from offset p&7
        end = (p + k + 7) >> 3
        v = int.from_bytes(self.data[byte0:end], "little")
        return (v >> (p & 7)) & ((1 << k) - 1)

    def read1(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("VP8L: bitstream overrun")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------

# RFC 9649 §5.2.2: order in which code-length-code lengths are stored
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                      11, 12, 13, 14, 15)


class _Prefix:
    """Canonical prefix decoder. Codes are DEFLATE-canonical (assigned in
    increasing length then symbol order) and the stream packs each code
    MSB-first while bytes fill LSB-first — so decoding reads one bit at a
    time, appending at the low end of an accumulator."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        self.single = None
        counts: dict[int, int] = {}
        for ln in lengths:
            if ln:
                counts[ln] = counts.get(ln, 0) + 1
        if not counts:
            raise ValueError("VP8L: empty prefix code")
        if sum(counts.values()) == 1:
            self.single = next(
                s for s, ln in enumerate(lengths) if ln
            )
            self.table = {}
            return
        code = 0
        next_code = {}
        for ln in range(1, max(counts) + 1):
            code = (code + counts.get(ln - 1, 0)) << 1
            next_code[ln] = code
        table: dict[tuple[int, int], int] = {}
        for sym, ln in enumerate(lengths):
            if ln:
                table[(ln, next_code[ln])] = sym
                next_code[ln] += 1
        self.table = table

    @classmethod
    def simple(cls, symbols):
        p = cls.__new__(cls)
        if len(symbols) == 1:
            p.single = symbols[0]
            p.table = {}
        else:
            p.single = None
            p.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return p

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        table = self.table
        for _ in range(15):
            code = (code << 1) | br.read1()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code: the 'simple' 1/2-symbol form or the
    code-length-coded form (RFC 9649 §5.2.2)."""
    if br.read1():  # simple
        num_symbols = br.read1() + 1
        if br.read1():  # first symbol is 8 bits
            first = br.read(8)
        else:
            first = br.read1()
        syms = [first]
        if num_symbols == 2:
            syms.append(br.read(8))
        return _Prefix.simple(syms)
    cl_lengths = [0] * 19
    num_codes = 4 + br.read(4)
    for i in range(num_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    # symbol count limit
    if br.read1():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:  # 18
                repeat, fill = 11 + br.read(7), 0
            end = min(symbol + repeat, alphabet_size)
            while symbol < end:
                lengths[symbol] = fill
                symbol += 1
    return _Prefix(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values + 2D distance neighborhood
# ---------------------------------------------------------------------------


def _lz77_value(br: _Bits, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1

# RFC 9649 §5.2.3: codes 1..120 map to (dx, dy) neighborhood offsets
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (8, 4), (3, 8), (-3, 8), (8, 5), (6, 7), (-6, 7),
    (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7), (8, 8),
)


def _map_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


# ---------------------------------------------------------------------------
# Entropy-coded ARGB image (shared by the main image and every sub-image)
# ---------------------------------------------------------------------------


def _read_groups(br: _Bits, n_groups: int, cache_size: int):
    """n_groups x 5 prefix codes: green+length+cache, red, blue, alpha,
    distance."""
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, 256 + 24 + cache_size),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        ))
    return groups


def _decode_pixels(br: _Bits, w: int, h: int, level0: bool):
    """Decode a w x h ARGB pixel array (uint32, row-major flat). Sub-images
    (transform data, entropy image, palette) use the same machinery minus
    transforms and meta-prefix selection."""
    # color cache
    cache_bits = 0
    if br.read1():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("VP8L: invalid color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # meta prefix codes (level-0 image only)
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read1():
        meta_bits = br.read(3) + 2
        mw = -(-w >> meta_bits) if False else ((w + (1 << meta_bits) - 1) >> meta_bits)
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_pixels(br, mw, mh, level0=False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]
        n_groups = (max(meta) if meta else 0) + 1
    groups = _read_groups(br, n_groups, cache_size)

    npx = w * h
    out = [0] * npx
    pos = 0
    x = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    row_group_base = 0
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta is not None else 0

    def switch_group():
        nonlocal g_green, g_red, g_blue, g_alpha, g_dist
        gi = meta[row_group_base + (x >> meta_bits)]
        g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]

    hash_mul = 0x1E35A7BD
    shift = 32 - cache_bits if cache_bits else 0

    while pos < npx:
        if meta is not None and (x & ((1 << meta_bits) - 1)) == 0:
            switch_group()
        sym = g_green.read(br)
        if sym < 256:
            red = g_red.read(br)
            blue = g_blue.read(br)
            alpha = g_alpha.read(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            if cache_bits:
                cache[((hash_mul * px) & 0xFFFFFFFF) >> shift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                if meta is not None:
                    row_group_base = ((pos // w) >> meta_bits) * mw
        elif sym < 256 + 24:
            length = _lz77_value(br, sym - 256)
            dist_code = _lz77_value(br, g_dist.read(br))
            dist = _map_distance(dist_code, w)
            if dist > pos or pos + length > npx:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache_bits:
                    cache[((hash_mul * px) & 0xFFFFFFFF) >> shift] = px
                pos += 1
            x = pos % w
            if meta is not None:
                row_group_base = ((pos // w) >> meta_bits) * mw
        else:
            out[pos] = cache[sym - 256 - 24]
            pos += 1
            x += 1
            if x == w:
                x = 0
                if meta is not None:
                    row_group_base = ((pos // w) >> meta_bits) * mw
    return out


# ---------------------------------------------------------------------------
# Inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    # per-channel (a + b) >> 1 without inter-channel carries
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _add_px(a: int, b: int) -> int:
    # per-channel modular addition
    s = 0
    for sh in (0, 8, 16, 24):
        s |= (((a >> sh) + (b >> sh)) & 0xFF) << sh
    return s


def _select(l: int, t: int, tl: int) -> int:  # noqa: E741 — spec names
    p_l = (abs(((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF))
           + abs(((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF))
           + abs(((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF))
           + abs((t & 0xFF) - (tl & 0xFF)))
    p_t = (abs(((l >> 24) & 0xFF) - ((tl >> 24) & 0xFF))
           + abs(((l >> 16) & 0xFF) - ((tl >> 16) & 0xFF))
           + abs(((l >> 8) & 0xFF) - ((tl >> 8) & 0xFF))
           + abs((l & 0xFF) - (tl & 0xFF)))
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:  # noqa: E741
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= _clamp(v) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:  # noqa: E741
    ave = _avg2(l, t)
    out = 0
    for sh in (0, 8, 16, 24):
        c = (ave >> sh) & 0xFF
        d = (tl >> sh) & 0xFF
        # C truncating division by 2 (toward zero), per RFC 9649 §4.2.2
        diff = c - d
        half = diff // 2 if diff >= 0 else -((-diff) // 2)
        out |= _clamp(c + half) << sh
    return out


def _inverse_predictor(px, w: int, h: int, modes, bits: int):
    """In-place inverse of the predictor transform (RFC 9649 §4.2.2)."""
    mw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]  # L
            elif x == 0:
                pred = px[i - w]  # T
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
                l = px[i - 1]  # noqa: E741
                t = px[i - w]
                tl = px[i - w - 1]
                # TR: for x == w-1 this reads px[i - w + 1] == row start of
                # the CURRENT row (already decoded) — the spec's arithmetic
                # consequence of flat addressing, kept deliberately
                tr = px[i - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l, tr), t)
                elif mode == 6:
                    pred = _avg2(l, tl)
                elif mode == 7:
                    pred = _avg2(l, t)
                elif mode == 8:
                    pred = _avg2(tl, t)
                elif mode == 9:
                    pred = _avg2(t, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(l, tl), _avg2(t, tr))
                elif mode == 11:
                    pred = _select(l, t, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(l, t, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(l, t, tl)
                else:
                    raise ValueError(f"VP8L: predictor mode {mode}")
            px[i] = _add_px(px[i], pred)


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inverse_color_transform(px, w: int, h: int, elems, bits: int):
    """Inverse cross-color transform (RFC 9649 §4.2.3): transform element
    channels are blue=green_to_red, green=green_to_blue, red=red_to_blue;
    deltas are (int8(t) * int8(c)) >> 5 with arithmetic shift."""
    mw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        base = (y >> bits) * mw
        for x in range(w):
            i = y * w + x
            e = elems[base + (x >> bits)]
            g2r = _i8(e & 0xFF)
            g2b = _i8((e >> 8) & 0xFF)
            r2b = _i8((e >> 16) & 0xFF)
            v = px[i]
            g = _i8((v >> 8) & 0xFF)
            r = ((v >> 16) & 0xFF) + ((g2r * g) >> 5)
            r &= 0xFF
            b = (v & 0xFF) + ((g2b * g) >> 5) + ((r2b * _i8(r)) >> 5)
            px[i] = (v & 0xFF00FF00) | (r << 16) | (b & 0xFF)


def _inverse_subtract_green(px):
    for i, v in enumerate(px):
        g = (v >> 8) & 0xFF
        r = (((v >> 16) & 0xFF) + g) & 0xFF
        b = ((v & 0xFF) + g) & 0xFF
        px[i] = (v & 0xFF00FF00) | (r << 16) | b


def _inverse_color_index(px, w: int, h: int, palette, width_bits: int):
    """Palette lookup, unbundling sub-byte packed indices when the palette
    is small (RFC 9649 §4.2.4). Out-of-range indices decode to 0 (matching
    libwebp's defined behavior)."""
    if width_bits == 0:
        return [
            palette[(v >> 8) & 0xFF]
            if ((v >> 8) & 0xFF) < len(palette)
            else 0
            for v in px
        ], w
    packed_w = (w + (1 << width_bits) - 1) >> width_bits
    ibits = 8 >> width_bits  # bits per index
    per = 1 << width_bits  # indices per packed pixel
    mask = (1 << ibits) - 1
    out = [0] * (w * h)
    for y in range(h):
        for xp in range(packed_w):
            g = (px[y * packed_w + xp] >> 8) & 0xFF
            for k in range(per):
                x = (xp << width_bits) + k
                if x >= w:
                    break
                idx = (g >> (k * ibits)) & mask
                out[y * w + x] = (
                    palette[idx] if idx < len(palette) else 0
                )
    return out, w


# ---------------------------------------------------------------------------
# VP8L top level
# ---------------------------------------------------------------------------

_PREDICTOR, _COLOR, _SUBTRACT_GREEN, _COLOR_INDEX = 0, 1, 2, 3


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode one VP8L chunk payload to (h, w, 3|4) uint8 (alpha kept only
    when the stream's alpha hint is set and any pixel is non-opaque)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _Bits(payload)
    br.read(8)  # signature
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read1()
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")

    # transforms (level-0 only), read order recorded for reverse inversion
    transforms = []
    xsize = w  # shrinks under color-indexing pixel bundling
    seen = set()
    while br.read1():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == _PREDICTOR or ttype == _COLOR:
            bits = br.read(3) + 2
            mw = (xsize + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _decode_pixels(br, mw, mh, level0=False)
            transforms.append((ttype, bits, sub))
        elif ttype == _SUBTRACT_GREEN:
            transforms.append((ttype, None, None))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            raw = _decode_pixels(br, n_colors, 1, level0=False)
            # palette entries are stored as per-channel deltas
            palette = []
            prev = 0
            for v in raw:
                prev = _add_px(prev, v)
                palette.append(prev)
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((ttype, width_bits, palette))
            xsize = (xsize + (1 << width_bits) - 1) >> width_bits

    px = _decode_pixels(br, xsize, h, level0=True)

    cur_w = xsize
    for ttype, arg, data in reversed(transforms):
        if ttype == _COLOR_INDEX:
            px, cur_w = _inverse_color_index(px, w, h, data, arg)
        elif ttype == _SUBTRACT_GREEN:
            _inverse_subtract_green(px)
        elif ttype == _COLOR:
            _inverse_color_transform(px, cur_w, h, data, arg)
        else:  # predictor
            _inverse_predictor(px, cur_w, h, data, arg)

    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 4), np.uint8)
    rgb[:, :, 0] = (arr >> 16) & 0xFF
    rgb[:, :, 1] = (arr >> 8) & 0xFF
    rgb[:, :, 2] = arr & 0xFF
    rgb[:, :, 3] = (arr >> 24) & 0xFF
    if alpha_hint and (rgb[:, :, 3] != 255).any():
        return rgb
    return rgb[:, :, :3].copy()
