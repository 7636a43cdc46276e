"""colorConvert tests — the reference's channel-conversion semantics
(test/color_convert.js oracles plus per-pair unit checks)."""
import numpy as np
import pytest

import picha_tpu as picha
from picha_tpu import Image
from picha_tpu.ops.colorconvert import convert_array, convert_batch, normalize_weights


def _img(arr, pixel):
    return Image.from_array(np.asarray(arr), pixel)


def test_grey_rgba_grey_bit_invariant():
    # reference test/color_convert.js:33-39
    rng = np.random.default_rng(0)
    grey = rng.integers(0, 256, (13, 7, 1), dtype=np.uint8)
    img = _img(grey, "grey")
    rgba = picha.colorConvertSync(img, {"pixel": "rgba"})
    back = picha.colorConvertSync(rgba, {"pixel": "grey"})
    assert back.equal_pixels(img)


def test_grey_replication_and_alpha_synthesis():
    out = convert_array(np.array([[[100]]], np.uint8), "rgba")
    np.testing.assert_array_equal(out, [[[100, 100, 100, 255]]])


def test_greya_to_rgb_uses_grey_replication():
    # deliberate deviation from reference cc:69-75 ([g, a, 0])
    out = convert_array(np.array([[[50, 200]]], np.uint8), "rgb")
    np.testing.assert_array_equal(out, [[[50, 50, 50]]])


def test_luma_weights_default():
    out = convert_array(np.array([[[255, 0, 0]]], np.uint8), "grey")
    assert out[0, 0, 0] == round(0.299 * 255)
    out = convert_array(np.array([[[0, 255, 0]]], np.uint8), "grey")
    assert out[0, 0, 0] == round(0.587 * 255)


def test_luma_weight_renormalization():
    # weights are renormalised to sum 1 (cc:18-21)
    r, g, b = normalize_weights(2.0, 1.0, 1.0)
    assert abs((r + g + b) - 1.0) < 1e-6
    assert abs(r - 0.5) < 1e-6
    out = convert_array(np.array([[[200, 100, 100]]], np.uint8), "grey",
                        red_weight=2.0, green_weight=1.0, blue_weight=1.0)
    assert out[0, 0, 0] == 150


def test_rgba_to_greya_keeps_alpha():
    out = convert_array(np.array([[[0, 0, 0, 42]]], np.uint8), "greya")
    np.testing.assert_array_equal(out, [[[0, 42]]])


def test_alpha_dropped_to_rgb():
    out = convert_array(np.array([[[1, 2, 3, 42]]], np.uint8), "rgb")
    np.testing.assert_array_equal(out, [[[1, 2, 3]]])


def test_8_to_16_and_back_invariant():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)
    deep = convert_array(arr, "r16g16b16")
    # u8 v maps to round(v/255*65535) = v*257
    np.testing.assert_array_equal(deep, arr.astype(np.uint16) * 257)
    back = convert_array(deep, "rgb")
    np.testing.assert_array_equal(back, arr)


def test_same_format_is_copy():
    img = _img(np.arange(12, dtype=np.uint8).reshape(2, 2, 3), "rgb")
    out = picha.colorConvertSync(img, {"pixel": "rgb"})
    assert out.equal_pixels(img)
    assert out.data is not img.data


def test_batch_matches_host_path():
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 256, (4, 8, 8, 4), dtype=np.uint8)
    got = np.asarray(convert_batch(batch, "rgba", "grey"))
    want = np.stack([convert_array(b, "grey") for b in batch])
    np.testing.assert_array_equal(got, want)


def test_async_matches_sync():
    img = _img(np.arange(27, dtype=np.uint8).reshape(3, 3, 3), "rgb")
    results = {}
    fut = picha.colorConvert(img, {"pixel": "greya"},
                             lambda err, res: results.update(err=err, res=res))
    fut.result(timeout=30)
    assert results["err"] is None
    sync = picha.colorConvertSync(img, {"pixel": "greya"})
    assert results["res"].equal_pixels(sync)


def test_zero_weights_rejected():
    from picha_tpu.errors import InvalidOptionsError
    img = _img(np.zeros((2, 2, 3), np.uint8), "rgb")
    with pytest.raises(InvalidOptionsError):
        picha.colorConvertSync(img, {"pixel": "grey", "redWeight": 0,
                                     "greenWeight": 0, "blueWeight": 0})


def test_all_56_format_pairs_host_vs_jit():
    """Exhaustive: every src->dst pair of the 8 formats through both
    the numpy host path and the jitted batch path, bit-identical."""
    from picha_tpu.pixels import PIXEL_FORMATS
    rng = np.random.default_rng(6)
    arrays = {}
    for name, fmt in PIXEL_FORMATS.items():
        arrays[name] = rng.integers(0, fmt.max_value + 1, (6, 5, fmt.channels),
                                    dtype=fmt.dtype)
    for src in PIXEL_FORMATS:
        for dst in PIXEL_FORMATS:
            if src == dst:
                continue
            host = convert_array(arrays[src], dst)
            jit = np.asarray(convert_batch(arrays[src][None], src, dst))[0]
            np.testing.assert_array_equal(host, jit, err_msg=f"{src}->{dst}")


def test_roundtrip_pairs_preserving():
    """Conversions that should be information-preserving round-trip
    bit-exactly (grey<->deep, rgb<->deep, alpha-adding pairs)."""
    rng = np.random.default_rng(7)
    cases = [("grey", "r16"), ("rgb", "r16g16b16"), ("greya", "r16g16"),
             ("rgba", "r16g16b16a16"), ("grey", "greya"), ("rgb", "rgba"),
             ("grey", "rgba"), ("r16", "r16g16b16a16")]
    from picha_tpu.pixels import PIXEL_FORMATS
    for src, via in cases:
        fmt = PIXEL_FORMATS[src]
        arr = rng.integers(0, fmt.max_value + 1, (5, 4, fmt.channels),
                           dtype=fmt.dtype)
        up = convert_array(arr, via)
        back = convert_array(up, src)
        np.testing.assert_array_equal(back, arr, err_msg=f"{src}->{via}->{src}")


def test_nan_weight_keeps_default_like_reference():
    """getSettings ignores NaN weights (`if (d == d)`,
    colorconvert.cc:8-14); propagating NaN turned the luma into zeros."""
    import numpy as np

    from picha_tpu.ops.colorconvert import convert_array

    grey = convert_array(np.full((2, 2, 3), 200, np.uint8), "grey",
                         red_weight=float("nan"))
    np.testing.assert_array_equal(grey, np.full((2, 2, 1), 200, np.uint8))
    with pytest.raises(picha.InvalidOptionsError):
        convert_array(np.full((2, 2, 3), 200, np.uint8), "grey",
                      red_weight="abc")
