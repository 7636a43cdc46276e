"""Lossless coefficient-domain JPEG transforms (ops/jpeg_transform.py,
picha.transformJpegSync) — beyond-reference API; jpegtran's feature
class built on the coefficient infrastructure.

Oracles: (a) involution/composition identities asserted EXACTLY at the
coefficient level (transform+inverse must reproduce the original
quantised coefficients bit-for-bit — no tolerance); (b) decoded pixels
of the transformed file vs the numpy transform of the decoded original
(small tolerance: libjpeg's integer IDCT is not exactly symmetric
under pixel-domain transposition); (c) jpegtran-style trim semantics
on non-iMCU-aligned dims; (d) `perfect=True` raises."""
import numpy as np
import pytest

import picha_tpu as picha
from picha_tpu.errors import CodecError, InvalidOptionsError
from picha_tpu.native import lib as native

OPS = ["transpose", "fliph", "flipv", "rot90", "rot180", "rot270",
       "transverse"]

NP_OP = {
    "transpose": lambda a: np.transpose(a, (1, 0, 2)),
    "fliph": lambda a: a[:, ::-1],
    "flipv": lambda a: a[::-1],
    "rot90": lambda a: np.rot90(a, -1, (0, 1)),   # clockwise
    "rot180": lambda a: a[::-1, ::-1],
    "rot270": lambda a: np.rot90(a, 1, (0, 1)),
    "transverse": lambda a: np.transpose(a, (1, 0, 2))[::-1, ::-1],
}

INVERSE = {"transpose": "transpose", "fliph": "fliph", "flipv": "flipv",
           "rot90": "rot270", "rot180": "rot180", "rot270": "rot90",
           "transverse": "transverse"}


def _photo(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    arr = np.stack([128 + 80 * np.sin(xx / 11) * np.cos(yy / 7),
                    128 + 60 * np.cos((xx + yy) / 13),
                    128 + 50 * np.sin(yy / 9)], axis=-1)
    return np.clip(arr + rng.normal(0, 4, (h, w, 3)), 0, 255).astype(np.uint8)


def _coefs_of(buf):
    co = native.JpegCoefficients(bytes(buf))
    return [(c["h_samp"], c["v_samp"], c["qtable"].copy(),
             c["coefs"].copy()) for c in co.comps]


@pytest.mark.parametrize("op", OPS)
def test_involution_exact_coefficients(op):
    """op then its inverse reproduces the original quantised
    coefficients EXACTLY (iMCU-aligned 4:2:0 so no trim occurs)."""
    buf = picha.encodeJpegSync(
        picha.Image.from_array(_photo(48, 64), "rgb"), {"quality": 90})
    fwd = picha.transformJpegSync(buf, {"op": op, "perfect": True})
    back = picha.transformJpegSync(fwd, {"op": INVERSE[op],
                                         "perfect": True})
    want, got = _coefs_of(buf), _coefs_of(back)
    for (h0, v0, q0, c0), (h1, v1, q1, c1) in zip(want, got):
        assert (h0, v0) == (h1, v1)
        assert np.array_equal(q0, q1)
        assert np.array_equal(c0, c1), op


@pytest.mark.parametrize("op", OPS)
def test_pixels_match_numpy_transform(op):
    """Decoded pixels of the transformed file == numpy transform of the
    decoded original (tolerance: libjpeg's integer IDCT is not exactly
    transpose-symmetric, so rearranged blocks can round ±1)."""
    buf = picha.encodeJpegSync(
        picha.Image.from_array(_photo(48, 64, seed=3), "rgb"),
        {"quality": 92})
    base = np.asarray(picha.decodeJpegSync(buf).to_array())
    out = picha.transformJpegSync(buf, {"op": op})
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    want = NP_OP[op](base)
    assert got.shape == want.shape, op
    # lossless means exact CODED-domain preservation (the involution
    # test asserts that bit-for-bit); decode pipelines are not exactly
    # transform-equivariant (chroma upsample phase at block borders,
    # integer IDCT asymmetry), so the pixel check only needs to catch
    # orientation/sign mistakes, which diff by >>1 LSB
    diff = np.abs(got.astype(int) - want.astype(int)).mean()
    assert diff <= 0.5, (op, diff)


def test_trim_semantics_and_perfect():
    """Non-iMCU-aligned width: fliph trims to the 16-pixel 4:2:0 iMCU
    grid (output = mirror of the kept left region, jpegtran -trim);
    perfect=True raises instead. transpose never trims."""
    buf = picha.encodeJpegSync(
        picha.Image.from_array(_photo(50, 50, seed=5), "rgb"),
        {"quality": 92})
    base = np.asarray(picha.decodeJpegSync(buf).to_array())

    out = picha.transformJpegSync(buf, {"op": "fliph"})
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    assert got.shape == (50, 48, 3)
    want = base[:, :48][:, ::-1]
    assert np.abs(got.astype(int) - want.astype(int)).mean() <= 0.5

    with pytest.raises(InvalidOptionsError):
        picha.transformJpegSync(buf, {"op": "fliph", "perfect": True})
    tr = picha.transformJpegSync(buf, {"op": "transpose", "perfect": True})
    st = picha.statJpeg(tr)
    assert (st["width"], st["height"]) == (50, 50)


def test_grey_and_options_and_errors():
    g = _photo(24, 40, seed=7)[..., :1]
    buf = picha.encodeJpegSync(
        picha.Image.from_array(np.ascontiguousarray(g), "grey"),
        {"quality": 90})
    # grey iMCU is 8x8: 40x24 is aligned, flips are perfect
    out = picha.transformJpegSync(buf, {"op": "rot90", "perfect": True,
                                        "optimize": True,
                                        "restartInterval": 2})
    base = np.asarray(picha.decodeJpegSync(buf).to_array())
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    assert got.shape == (40, 24, 1)
    assert np.abs(got.astype(int)
                  - NP_OP["rot90"](base).astype(int)).mean() <= 0.5
    assert b"\xff\xdd" in out[:700]  # DRI written

    with pytest.raises(InvalidOptionsError):
        picha.transformJpegSync(buf, {"op": "spin"})
    with pytest.raises(CodecError):
        from conftest import fixture_bytes
        picha.transformJpegSync(fixture_bytes("test2cmyk.jpg"),
                                {"op": "fliph"})  # 4 components


def test_crop_semantics():
    """Coefficient-domain crop: aligned grey crops are EXACT pixels;
    4:2:0 matches except chroma-upsample edge effects; unaligned
    origins snap down (jpegtran -crop) and perfect=True raises."""
    g = _photo(64, 80, seed=13)[..., :1]
    gbuf = picha.encodeJpegSync(
        picha.Image.from_array(np.ascontiguousarray(g), "grey"),
        {"quality": 90})
    gbase = np.asarray(picha.decodeJpegSync(gbuf).to_array())
    out = picha.transformJpegSync(gbuf, {"op": "crop", "x": 16, "y": 8,
                                         "width": 33, "height": 22,
                                         "perfect": True})
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    # grey has no chroma resampling: block-aligned crop is bit-exact
    assert np.array_equal(got, gbase[8:30, 16:49])

    buf = picha.encodeJpegSync(
        picha.Image.from_array(_photo(64, 80, seed=14), "rgb"),
        {"quality": 92})
    base = np.asarray(picha.decodeJpegSync(buf).to_array())
    out = picha.transformJpegSync(buf, {"op": "crop", "x": 32, "y": 16,
                                        "width": 30, "height": 25,
                                        "perfect": True})
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    want = base[16:41, 32:62]
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).mean() <= 0.5

    # unaligned origin snaps down to the 16x16 iMCU grid and the size
    # GROWS by the snap remainder so the requested region stays covered
    # (jpegtran transupp.c): (37,19,30x25) -> (32,16,35x28)
    out = picha.transformJpegSync(buf, {"op": "crop", "x": 37, "y": 19,
                                        "width": 30, "height": 25})
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    want = base[16:44, 32:67]
    assert got.shape == want.shape == (28, 35, 3)
    assert np.abs(got.astype(int) - want.astype(int)).mean() <= 0.5
    with pytest.raises(InvalidOptionsError):
        picha.transformJpegSync(buf, {"op": "crop", "x": 37, "y": 19,
                                      "width": 30, "height": 25,
                                      "perfect": True})
    with pytest.raises(InvalidOptionsError):
        picha.transformJpegSync(buf, {"op": "crop", "x": 60, "y": 0,
                                      "width": 30, "height": 10})
    with pytest.raises(InvalidOptionsError):
        picha.transformJpegSync(buf, {"op": "crop", "x": 0, "y": 0})


def test_rgb_tagged_source_stays_rgb():
    """Transforming an RGB-colorspace JPEG (Adobe transform=0 /
    'R','G','B' ids) must write the output RGB-tagged too — re-tagging
    as JFIF/YCbCr would make every decoder apply the YCbCr matrix to
    the untransformed planes."""
    from picha_tpu.ops.jpeg_tpu import quality_tables

    rng = np.random.default_rng(19)
    qluma, _ = quality_tables(90)
    comps = [{"coefs": rng.integers(-8, 9, (4, 6, 64)).astype(np.int16),
              "qtable": qluma, "h_samp": 1, "v_samp": 1}
             for _ in range(3)]
    buf = native.jpeg_coef_write(48, 32, comps, color_space=2)
    assert b"Adobe" in bytes(buf)[:200]
    co = native.JpegCoefficients(bytes(buf))
    assert co.color_space == 2  # libjpeg reads it back as JCS_RGB

    out = picha.transformJpegSync(buf, {"op": "rot180", "perfect": True})
    assert b"Adobe" in bytes(out)[:200]
    base = np.asarray(picha.decodeJpegSync(buf).to_array())
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    # no chroma resampling, but libjpeg's integer IDCT rounds ±1 under
    # the mirror's sign flips; a YCbCr mis-tag would diff by >>1
    d = np.abs(got.astype(int) - base[::-1, ::-1].astype(int))
    assert d.mean() <= 0.05 and d.max() <= 1, (d.mean(), d.max())


def test_progressive_input():
    """Progressive sources transform fine: libjpeg's coefficient reader
    handles multi-scan files, and the output is a baseline scan of the
    same (losslessly rearranged) coefficients."""
    import io

    from PIL import Image as PILImage

    arr = _photo(48, 64, seed=17)
    b = io.BytesIO()
    PILImage.fromarray(arr).save(b, "JPEG", progressive=True, quality=90)
    out = picha.transformJpegSync(b.getvalue(), {"op": "rot180",
                                                 "perfect": True})
    assert b"\xff\xc0" in out[:700] and b"\xff\xc2" not in out[:700]
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    base = np.asarray(picha.decodeJpegSync(b.getvalue()).to_array())
    assert np.abs(got.astype(int)
                  - base[::-1, ::-1].astype(int)).mean() <= 0.5


def test_sync_async_identical():
    buf = picha.encodeJpegSync(
        picha.Image.from_array(_photo(32, 48, seed=11), "rgb"),
        {"quality": 88})
    want = picha.transformJpegSync(buf, {"op": "rot180"})
    done = []
    picha.transformJpeg(buf, {"op": "rot180"},
                        lambda err, out: done.append((err, out)))
    for _ in range(200):
        if done:
            break
        import time
        time.sleep(0.02)
    err, out = done[0]
    assert err is None and bytes(out) == bytes(want)


# ---------------------------------------------------------------------------
# EXIF auto-orient + metadata marker preservation (codecs/jpeg_markers.py)
# ---------------------------------------------------------------------------

def _exif_jpeg(arr, orientation, quality=90, **save_kw):
    import io

    from PIL import Image as PILImage

    exif = PILImage.Exif()
    exif[0x0112] = orientation
    b = io.BytesIO()
    PILImage.fromarray(arr).save(b, "JPEG", quality=quality,
                                 exif=exif.tobytes(), **save_kw)
    return b.getvalue()


@pytest.mark.parametrize("orient", list(range(1, 9)))
def test_auto_orient_lossless(orient):
    """op='autoOrient' reads the EXIF tag and applies the lossless
    transform that makes the image upright — pixel oracle is the TIFF
    codec's _orient (the same orientation enumeration)."""
    from picha_tpu.codecs.tiff import _orient

    arr = _photo(48, 64, seed=7)  # iMCU-aligned: no trim on any op
    buf = _exif_jpeg(arr, orient)
    out = picha.transformJpegSync(buf, {"op": "autoOrient",
                                        "perfect": True})
    if orient == 1:
        assert bytes(out) == bytes(buf)  # upright: exact passthrough
        return
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    base = np.asarray(picha.decodeJpegSync(buf).to_array())
    want = _orient(base, orient)
    assert got.shape == want.shape, orient
    assert np.abs(got.astype(int) - want.astype(int)).mean() <= 0.5


def test_auto_orient_matches_pil_exif_transpose():
    """Cross-oracle: PIL.ImageOps.exif_transpose agrees on the final
    geometry and content."""
    import io

    from PIL import Image as PILImage, ImageOps

    arr = _photo(48, 64, seed=8)
    buf = _exif_jpeg(arr, 6)
    out = picha.transformJpegSync(buf, {"op": "autoOrient"})
    got = np.asarray(picha.decodeJpegSync(out).to_array())
    want = np.asarray(ImageOps.exif_transpose(
        PILImage.open(io.BytesIO(buf))))
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).mean() <= 1.5


def test_copy_markers_and_orientation_reset():
    """copyMarkers carries EXIF/ICC through transform and transcode;
    autoOrient resets the copied orientation tag to 1 (viewers must
    not rotate twice); default behavior still strips metadata."""
    from picha_tpu.codecs import jpeg_markers

    arr = _photo(48, 64, seed=9)
    icc = b"\x00\x01fake-profile-bytes" * 3
    buf = _exif_jpeg(arr, 6, icc_profile=icc)
    assert jpeg_markers.exif_orientation(buf) == 6

    out = picha.transformJpegSync(buf, {"op": "autoOrient",
                                        "copyMarkers": True})
    assert jpeg_markers.exif_orientation(out) == 1  # reset after rotate
    kinds = [m for m, _s, _t in jpeg_markers.iter_segments(bytes(out))]
    assert 0xE2 in kinds  # ICC APP2 survived

    t = picha.transcodeJpegSync(buf, {"width": 32, "height": 24,
                                      "copyMarkers": True})
    assert jpeg_markers.exif_orientation(t) == 6  # copied verbatim
    kinds = [m for m, _s, _t in jpeg_markers.iter_segments(bytes(t))]
    assert 0xE1 in kinds and 0xE2 in kinds
    st = picha.statJpeg(t)
    assert (st["width"], st["height"]) == (32, 24)

    # defaults unchanged: metadata stripped
    t2 = picha.transcodeJpegSync(buf, {"width": 32, "height": 24})
    assert jpeg_markers.exif_orientation(t2) is None
    out2 = picha.transformJpegSync(buf, {"op": "rot90"})
    assert jpeg_markers.exif_orientation(out2) is None


def test_auto_orient_decode_option():
    """decodeJpeg autoOrient applies the EXIF orientation in the pixel
    domain — bit-exact vs orienting the plain decode."""
    from picha_tpu.codecs.tiff import _orient

    arr = _photo(48, 64, seed=10)
    buf = _exif_jpeg(arr, 8)
    img = picha.decodeJpegSync(buf, {"autoOrient": True})
    base = np.asarray(picha.decodeJpegSync(buf).to_array())
    np.testing.assert_array_equal(np.asarray(img.to_array()),
                                  _orient(base, 8))
    assert (img.width, img.height) == (48, 64)  # axes swapped
    plain = picha.decodeJpegSync(buf)
    assert (plain.width, plain.height) == (64, 48)


def test_malformed_exif_never_crashes():
    """Corrupted EXIF payloads: orientation reads as None/int, never an
    exception; autoOrient degrades to passthrough or a valid output."""
    from picha_tpu.codecs import jpeg_markers

    arr = _photo(32, 32, seed=11)
    buf = bytearray(_exif_jpeg(arr, 6))
    segs = [(m, s, t) for m, s, t in jpeg_markers.iter_segments(bytes(buf))
            if m == 0xE1]
    assert segs
    _m, s, t = segs[0]
    rng = np.random.default_rng(0)
    for _ in range(60):
        mut = bytearray(buf)
        for _k in range(int(rng.integers(1, 6))):
            mut[int(rng.integers(s + 4, s + t))] = int(rng.integers(0, 256))
        o = jpeg_markers.exif_orientation(bytes(mut))
        assert o is None or 1 <= o <= 8
        try:
            picha.transformJpegSync(bytes(mut), {"op": "autoOrient"})
        except picha.errors.CodecError:
            pass  # scan corruption is allowed to fail typed
