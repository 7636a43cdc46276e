"""Public transcodeJpeg API: fast raw-domain path for 4:2:0, fallback
parity for everything else, option semantics identical to
decode->resize->encode."""
import numpy as np
import pytest

import picha_tpu as picha
from picha_tpu.errors import InvalidOptionsError
from picha_tpu.native import lib as native


def _jpeg(w=320, h=256, grey=False, q=90):
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 60 * np.sin(xx / 13) + 40 * np.cos(yy / 9)
    if grey:
        img = picha.Image.from_array(
            np.clip(base, 0, 255).astype(np.uint8)[..., None], "grey")
    else:
        a = np.clip(np.stack([base, 255 - base, base * 0.6 + 40], -1)
                    + rng.normal(0, 4, (h, w, 3)), 0, 255).astype(np.uint8)
        img = picha.Image.from_array(a, "rgb")
    return picha.encodeJpegSync(img, {"quality": q})


def test_transcode_fast_path_close_to_staged():
    buf = _jpeg()
    out = picha.transcodeJpegSync(buf, {"width": 160, "height": 128})
    st = picha.statJpeg(out)
    assert (st["width"], st["height"]) == (160, 128)
    staged = picha.encodeJpegSync(
        picha.resizeSync(picha.decodeJpegSync(buf),
                         {"width": 160, "height": 128}), {"quality": 85})
    a = native.jpeg_decode(out, 3, 160, 128).astype(int)
    b = native.jpeg_decode(staged, 3, 160, 128).astype(int)
    assert np.abs(a - b).mean() <= 1.0


def test_transcode_progressive_source():
    """Progressive (SOF2) INPUTS go through the raw-domain fast path —
    libjpeg's raw mode handles them — with the same <=1 LSB parity vs
    the staged decode->resize->encode as baseline sources."""
    import io

    from PIL import Image as PILImage

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:160, 0:192].astype(np.float32)
    base = 127 + 60 * np.sin(xx / 13) + 40 * np.cos(yy / 9)
    arr = np.clip(np.stack([base, 255 - base, base * 0.6 + 40], -1)
                  + rng.normal(0, 4, (160, 192, 3)), 0, 255).astype(np.uint8)
    b = io.BytesIO()
    PILImage.fromarray(arr).save(b, "JPEG", quality=88, progressive=True)
    buf = b.getvalue()
    assert b"\xff\xc2" in buf[:600]   # really progressive
    out = picha.transcodeJpegSync(buf, {"width": 96, "height": 80})
    st = picha.statJpeg(out)
    assert (st["width"], st["height"]) == (96, 80)
    staged = picha.encodeJpegSync(
        picha.resizeSync(picha.decodeJpegSync(buf),
                         {"width": 96, "height": 80}), {"quality": 85})
    a = native.jpeg_decode(bytes(out), 3, 96, 80).astype(int)
    c = native.jpeg_decode(bytes(staged), 3, 96, 80).astype(int)
    assert np.abs(a - c).mean() <= 1.0


def test_transcode_fallback_grey_matches_staged_path():
    buf = _jpeg(grey=True)
    out = picha.transcodeJpegSync(buf, {"width": 100, "height": 80,
                                        "quality": 92})
    st = picha.statJpeg(out)
    assert (st["width"], st["height"]) == (100, 80)
    assert st["pixel"] == "grey"
    staged = picha.encodeJpegSync(
        picha.resizeSync(picha.decodeJpegSync(buf),
                         {"width": 100, "height": 80}), {"quality": 92})
    assert bytes(out) == bytes(staged)  # identical code path => identical bytes


def test_transcode_option_errors_and_async():
    buf = _jpeg()
    with pytest.raises(InvalidOptionsError):
        picha.transcodeJpegSync(buf, {"width": 100})
    with pytest.raises(InvalidOptionsError):
        picha.transcodeJpegSync(buf, {"width": -1, "height": 5})
    res = []
    picha.transcodeJpeg(buf, {"width": 64, "height": 64},
                        lambda e, b: res.append((e, b))).result()
    assert res[0][0] is None
    assert bytes(res[0][1]) == bytes(
        picha.transcodeJpegSync(buf, {"width": 64, "height": 64}))


def test_transcode_filter_options_respected():
    buf = _jpeg()
    a = picha.transcodeJpegSync(buf, {"width": 160, "height": 128})
    b = picha.transcodeJpegSync(buf, {"width": 160, "height": 128,
                                      "filter": "box"})
    assert bytes(a) != bytes(b)  # different filters -> different output


def test_transcode_progressive_honored():
    """progressive=True must not be silently dropped by the raw-domain
    fast path (review r3d): it routes through decode->resize->encode
    and emits SOF2 scans, matching encodeJpegSync's option surface."""
    buf = _jpeg()
    prog = picha.transcodeJpegSync(buf, {"width": 100, "height": 80,
                                         "progressive": True})
    assert b"\xff\xc2" in bytes(prog)[:600]   # SOF2: progressive DCT
    base = picha.transcodeJpegSync(buf, {"width": 100, "height": 80})
    assert b"\xff\xc0" in bytes(base)[:600]   # SOF0: baseline
    st = picha.statJpeg(prog)
    assert (st["width"], st["height"]) == (100, 80)
