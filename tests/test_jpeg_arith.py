"""Arithmetic-coded JPEG decode (T.81 Annex D QM-coder + F.1.4.4 models):
vendored libjpeg-generated vectors always run; a live cross-check harness
compiles at test time where gcc + libjpeg-dev exist and regenerates vectors
across samplings/restarts — bit-exact against libjpeg's own decode."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from pysparkline.operators import jpeg, multimodal as mm

DATA = os.path.join(os.path.dirname(__file__), "data")


def _load(name: str) -> bytes:
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_arith_solid_vectors_exact_means():
    want = {
        "arith_s0.jpg": [201.0, 40.0, 90.0],
        "arith_s1.jpg": [11.0, 180.0, 221.0],
        "arith_s2.jpg": [130.0, 130.0, 30.0],  # restart_interval=2
    }
    for name, means in want.items():
        img = jpeg.decode(_load(name))
        assert img.shape == (16, 16, 3)
        got = [float(img[:, :, c].mean()) for c in range(3)]
        assert got == means, (name, got)


def test_arith_textured_vectors_decode():
    for name, shape in [
        ("arith_t444.jpg", (16, 24, 3)),
        ("arith_t420.jpg", (23, 37, 3)),   # + restart interval
        ("arith_tgray.jpg", (9, 17, 1)),
    ]:
        img = jpeg.decode(_load(name))
        assert img.shape == shape
        assert img.std() > 20


def test_arith_routes_through_decode_image():
    img = mm.decode_image(_load("arith_t444.jpg"))
    assert img.shape == (16, 24, 3)


def test_arith_truncated_declines_or_degrades_cleanly():
    """Truncation mid-scan must never crash: the QM feed pads past the end
    (spec behavior), so decode either declines (structure damage) or
    yields an image of the right shape."""
    data = _load("arith_t444.jpg")
    for cut in (30, len(data) // 2):
        try:
            img = jpeg.decode(data[:cut])
            assert img.shape == (16, 24, 3)
        except ValueError:
            pass


def test_sof10_with_sequential_scan_declines():
    """SOF10 (progressive arithmetic) is now SUPPORTED; this hostile input
    — a SEQUENTIAL arithmetic stream whose frame marker is rewritten to
    SOF10, so its full-band SOS violates the progressive DC-scan Se=0
    rule — must decline cleanly rather than desync."""
    data = bytearray(_load("arith_t444.jpg"))
    sof = bytes(data).find(b"\xff\xc9")
    assert sof > 0
    data[sof + 1] = 0xCA
    with pytest.raises(ValueError):
        jpeg.decode(bytes(data))


def _build_harness(tmp):
    if shutil.which("gcc") is None:
        pytest.skip("no gcc")
    progen = os.path.join(tmp, "arigen")
    decraw = os.path.join(tmp, "decraw")
    src_progen = r"""
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
int main(int argc, char** argv) {
  const char* out = argv[1];
  int w = atoi(argv[2]), h = atoi(argv[3]), q = atoi(argv[4]);
  int gray = atoi(argv[5]), sub = atoi(argv[6]), rst = atoi(argv[7]);
  struct jpeg_compress_struct c; struct jpeg_error_mgr e;
  c.err = jpeg_std_error(&e); jpeg_create_compress(&c);
  FILE* f = fopen(out, "wb"); jpeg_stdio_dest(&c, f);
  c.image_width = w; c.image_height = h;
  c.input_components = gray ? 1 : 3;
  c.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, q, TRUE);
  c.arith_code = TRUE;
  if (!gray && sub == 1) {
    c.comp_info[0].h_samp_factor = 1; c.comp_info[0].v_samp_factor = 1;
  }
  if (!gray && sub == 3) {
    c.comp_info[0].h_samp_factor = 2; c.comp_info[0].v_samp_factor = 1;
  }
  c.restart_interval = rst;
  jpeg_start_compress(&c, TRUE);
  unsigned char* row = malloc(w * c.input_components);
  while (c.next_scanline < c.image_height) {
    int y = c.next_scanline;
    for (int x = 0; x < w; x++) {
      if (gray) row[x] = (unsigned char)((x*7 + y*13 + ((x*y)%31)*5) & 0xFF);
      else {
        row[3*x]   = (unsigned char)((x*5 + y*3) & 0xFF);
        row[3*x+1] = (unsigned char)((x*2 + y*11 + (x%17)*9) & 0xFF);
        row[3*x+2] = (unsigned char)((x*13 ^ y*7) & 0xFF);
      }
    }
    JSAMPROW rp = row; jpeg_write_scanlines(&c, &rp, 1);
  }
  jpeg_finish_compress(&c); fclose(f); jpeg_destroy_compress(&c);
  return 0;
}
"""
    src_decraw = r"""
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
int main(int argc, char** argv) {
  struct jpeg_decompress_struct d; struct jpeg_error_mgr e;
  d.err = jpeg_std_error(&e); jpeg_create_decompress(&d);
  FILE* f = fopen(argv[1], "rb"); jpeg_stdio_src(&d, f);
  jpeg_read_header(&d, TRUE);
  d.dct_method = JDCT_FLOAT;
  d.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&d);
  printf("%d %d %d\n", d.output_width, d.output_height, d.output_components);
  fflush(stdout);
  unsigned char* row = malloc(d.output_width * d.output_components);
  while (d.output_scanline < d.output_height) {
    JSAMPROW rp = row; jpeg_read_scanlines(&d, &rp, 1);
    fwrite(row, 1, d.output_width * d.output_components, stdout);
  }
  jpeg_finish_decompress(&d); jpeg_destroy_decompress(&d); fclose(f);
  return 0;
}
"""
    for path, src in [(progen, src_progen), (decraw, src_decraw)]:
        with open(path + ".c", "w") as f:
            f.write(src)
        r = subprocess.run(
            ["gcc", "-O2", "-o", path, path + ".c", "-ljpeg"],
            capture_output=True,
        )
        if r.returncode != 0:
            pytest.skip(f"libjpeg harness build failed: {r.stderr[:200]!r}")
    return progen, decraw


def test_arith_cross_check_vs_libjpeg():
    """Fresh arithmetic files across samplings / restart intervals must
    decode within 1/sample of libjpeg itself (IDCT rounding)."""
    with tempfile.TemporaryDirectory() as tmp:
        progen, decraw = _build_harness(tmp)
        cases = [
            (24, 16, 90, 0, 1, 0),   # 4:4:4
            (37, 23, 85, 0, 2, 4),   # 4:2:0 + restarts
            (17, 9, 92, 1, 1, 0),    # grayscale
            (50, 29, 75, 0, 3, 3),   # 4:2:2 + restarts
            (120, 80, 60, 0, 2, 1),  # restart EVERY MCU
            (8, 8, 95, 0, 2, 0),     # single MCU
        ]
        for i, (w, h, q, gray, sub, rst) in enumerate(cases):
            p = os.path.join(tmp, f"v{i}.jpg")
            subprocess.run(
                [progen, p, str(w), str(h), str(q), str(gray), str(sub),
                 str(rst)],
                check=True,
            )
            out = subprocess.run([decraw, p], capture_output=True).stdout
            nl = out.index(b"\n")
            rw, rh, rc = map(int, out[:nl].split())
            ref = np.frombuffer(out[nl + 1:], dtype=np.uint8).reshape(
                rh, rw, rc
            )
            with open(p, "rb") as f:
                mine = jpeg.decode(f.read())
            assert mine.shape == (h, w, 3 if not gray else 1)
            diff = np.abs(mine.astype(int) - ref.astype(int))
            assert diff.max() <= 1, (i, diff.max())


def test_progressive_arithmetic_vendored_vectors():
    """SOF10 (progressive + arithmetic — the full Annex G scan script over
    QM decisions) decodes the vendored libjpeg vectors; bit-exactness vs a
    fresh libjpeg is asserted in the cross-check below."""
    for name, shape in [
        ("parith_t444.jpg", (16, 24, 3)),
        ("parith_t420.jpg", (23, 37, 3)),  # + restart intervals
        ("parith_tgray.jpg", (9, 17, 1)),
    ]:
        img = jpeg.decode(_load(name))
        assert img.shape == shape
        assert img.std() > 20


def test_progressive_arithmetic_cross_check_vs_libjpeg():
    with tempfile.TemporaryDirectory() as tmp:
        progen, decraw = _build_harness(tmp)
        # patch the generator to emit progressive scripts
        with open(progen + ".c") as f:
            src = f.read()
        src = src.replace("c.arith_code = TRUE;",
                          "jpeg_simple_progression(&c);\n  c.arith_code = TRUE;")
        pg2 = os.path.join(tmp, "pagen")
        with open(pg2 + ".c", "w") as f:
            f.write(src)
        r = subprocess.run(["gcc", "-O2", "-o", pg2, pg2 + ".c", "-ljpeg"],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("pagen build failed")
        cases = [
            (24, 16, 90, 0, 1, 0),
            (37, 23, 85, 0, 2, 4),
            (17, 9, 92, 1, 1, 0),
            (50, 29, 75, 0, 3, 3),
            (64, 48, 60, 0, 2, 1),
        ]
        for i, (w, h, q, gray, sub, rst) in enumerate(cases):
            p = os.path.join(tmp, f"pv{i}.jpg")
            subprocess.run([pg2, p, str(w), str(h), str(q), str(gray),
                            str(sub), str(rst)], check=True)
            out = subprocess.run([decraw, p], capture_output=True).stdout
            nl = out.index(b"\n")
            rw, rh, rc = map(int, out[:nl].split())
            ref = np.frombuffer(out[nl + 1:], dtype=np.uint8).reshape(
                rh, rw, rc)
            with open(p, "rb") as f:
                mine = jpeg.decode(f.read())
            diff = np.abs(mine.astype(int) - ref.astype(int))
            assert diff.max() <= 1, (i, diff.max())
