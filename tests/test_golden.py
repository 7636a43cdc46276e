"""Golden-fixture parity tests — the reference's cross-op oracles:
resize vs pre-rendered golden (test/resize.js) and colour conversion
vs golden grey PNG (test/color_convert.js)."""
import numpy as np
import picha_tpu as picha
from conftest import fixture_bytes


def test_resize_golden():
    # test/resize.js:16-31: test2.jpg -> 32x24 cubic(0.70) within 2 LSB
    # of the pre-rendered test2.png
    image = picha.decodeSync(fixture_bytes("test2.jpg"))
    golden = picha.decodeSync(fixture_bytes("test2.png"))
    small = picha.resizeSync(image, {"width": 32, "height": 24})
    assert small.avg_channel_diff(golden) < 2
    # async == sync
    res = {}
    picha.resize(image, {"width": 32, "height": 24},
                 lambda e, r: res.update(e=e, r=r)).result(60)
    assert res["r"].equal_pixels(small)


def test_color_convert_golden():
    # test/color_convert.js:24-31: rgba->greya equals the golden grey PNG
    rgb_image = picha.decodeSync(fixture_bytes("test.png"))
    grey_image = picha.decodeSync(fixture_bytes("greytest.png"))
    assert rgb_image.pixel == "rgba"
    assert grey_image.pixel == "greya"
    to_grey = picha.colorConvertSync(rgb_image, {"pixel": "greya"})
    assert to_grey.equal_pixels(grey_image)


def test_grey_colour_grey_invariant():
    grey_image = picha.decodeSync(fixture_bytes("greytest.png"))
    rgba = picha.colorConvertSync(grey_image, {"pixel": "rgba"})
    back = picha.colorConvertSync(rgba, {"pixel": grey_image.pixel})
    assert back.equal_pixels(grey_image)


def test_deep_16bit_pipeline():
    # BASELINE config 3: test16.png decoded deep (r16g16b16) ->
    # catmulrom resize -> 16-bit grey convert
    deep = picha.decodePngSync(fixture_bytes("test16.png"), {"deep": True})
    assert deep.pixel == "r16g16b16"
    small = picha.resizeSync(deep, {"width": 25, "height": 25,
                                    "filter": "catmulrom"})
    assert small.pixel == "r16g16b16"
    grey16 = picha.colorConvertSync(small, {"pixel": "r16"})
    assert grey16.pixel == "r16"
    arr = grey16.to_array()
    assert arr.dtype.name == "uint16" and arr.shape == (25, 25, 1)
    # 16-bit path carries more precision than the 8-bit one
    shallow = picha.colorConvertSync(
        picha.resizeSync(picha.decodePngSync(fixture_bytes("test16.png")),
                         {"width": 25, "height": 25, "filter": "catmulrom"}),
        {"pixel": "grey"})
    hi = (arr[:, :, 0] >> 8).astype(int)
    assert np.abs(hi - shallow.to_array()[:, :, 0].astype(int)).mean() <= 1.5
