"""WebP codec tests — mirrors reference test/webp_codec.js (lossless
preset exact round trip, lossy quality 70 < 8)."""
import numpy as np
import pytest

import picha_tpu as picha
from picha_tpu import Image
from conftest import fixture_bytes


def test_stat():
    st = picha.statWebP(fixture_bytes("test.webp"))
    assert st == {"width": 50, "height": 50, "pixel": "rgb"}
    assert picha.statWebP(b"not webp") is None


def test_decode():
    img = picha.decodeWebPSync(fixture_bytes("test.webp"))
    assert (img.width, img.height, img.pixel) == (50, 50, "rgb")


def test_lossless_roundtrip_exact():
    img = picha.decodeWebPSync(fixture_bytes("test.webp"))
    data = picha.encodeWebPSync(img, {"preset": "lossless"})
    assert picha.decodeWebPSync(data).equal_pixels(img)


def test_lossless_alpha_roundtrip():
    rng = np.random.default_rng(0)
    img = Image.from_array(rng.integers(0, 256, (16, 16, 4), np.uint8), "rgba")
    data = picha.encodeWebPSync(img, {"preset": "lossless", "exact": True})
    back = picha.decodeWebPSync(data)
    assert back.equal_pixels(img)


def test_lossy_q70_roundtrip():
    img = picha.decodeWebPSync(fixture_bytes("test.webp"))
    data = picha.encodeWebPSync(img, {"quality": 70})
    back = picha.decodeWebPSync(data)
    assert img.avg_channel_diff(back) < 8  # test/webp_codec.js:78-91


@pytest.mark.parametrize("preset", ["default", "picture", "photo", "drawing",
                                    "icon", "text"])
def test_presets(preset):
    img = picha.decodeWebPSync(fixture_bytes("test.webp"))
    data = picha.encodeWebPSync(img, {"preset": preset, "quality": 80})
    assert picha.statWebP(data)["width"] == 50


def test_invalid_preset_rejected():
    img = Image.from_array(np.zeros((2, 2, 3), np.uint8), "rgb")
    with pytest.raises(picha.InvalidOptionsError):
        picha.encodeWebPSync(img, {"preset": "bogus"})


def test_grey_input_negotiated():
    # grey is not in webp encodes -> negotiation converts to rgb
    rng = np.random.default_rng(1)
    img = Image.from_array(rng.integers(0, 256, (8, 8, 1), np.uint8), "grey")
    data = picha.encodeWebPSync(img, {"preset": "lossless"})
    back = picha.decodeWebPSync(data)
    assert back.pixel == "rgb"
    np.testing.assert_array_equal(back.to_array()[:, :, 0],
                                  img.to_array()[:, :, 0])


def test_sync_async_identical():
    img = picha.decodeWebPSync(fixture_bytes("test.webp"))
    res = {}
    picha.encodeWebP(img, {"quality": 70}, lambda e, r: res.update(e=e, r=r)).result(60)
    assert res["e"] is None
    assert res["r"] == picha.encodeWebPSync(img, {"quality": 70})


@pytest.mark.parametrize("method", [0, 3, 6])
def test_method_option(method):
    # libwebp's speed/size knob (beyond-reference option): every value
    # must produce a decodable stream within the reference's lossy
    # oracle (test/webp_codec.js: avgChannelDiff < 8 at q70)
    img = picha.decodeWebPSync(fixture_bytes("test.webp"))
    data = picha.encodeWebPSync(img, {"quality": 85, "method": method})
    back = picha.decodeWebPSync(data)
    assert back.avg_channel_diff(img) < 8


@pytest.mark.parametrize("bad", [-1, 7, "fast", 2.5, True])
def test_method_option_validated(bad):
    img = Image.from_array(np.zeros((2, 2, 3), np.uint8), "rgb")
    with pytest.raises(picha.InvalidOptionsError):
        picha.encodeWebPSync(img, {"method": bad})


def test_method_default_is_3_and_reference_reproducible():
    # round-5 documented deviation (codecs/webp.py docstring): lossy
    # default is method 3; byte-identical to an explicit method=3
    # encode, and an explicit method=4 reproduces the reference's
    # libwebp-default bytes exactly (distinct from ours)
    img = picha.decodeWebPSync(fixture_bytes("test.webp"))
    a = picha.encodeWebPSync(img, {"quality": 85})
    b = picha.encodeWebPSync(img, {"quality": 85, "method": 3})
    assert a == b
    ref = picha.encodeWebPSync(img, {"quality": 85, "method": 4})
    assert ref != a  # a real knob: the reference point is reproducible
    assert picha.decodeWebPSync(ref).avg_channel_diff(
        picha.decodeWebPSync(a)) < 2.0  # same visual job either way
    # lossless preset keeps libwebp's own effort (no method override)
    lossless_def = picha.encodeWebPSync(img, {"preset": "lossless"})
    lossless_m6 = picha.encodeWebPSync(img, {"preset": "lossless",
                                             "method": 6})
    assert picha.decodeWebPSync(lossless_def).equal_pixels(
        picha.decodeWebPSync(lossless_m6))
