"""Property tests (SURVEY.md §4 'add property tests: stride/subView
invariants, pack/unpack round-trip, filter weights vs closed form')."""
import math

import numpy as np
import pytest

from picha_tpu.image import Image
from picha_tpu.ops.resize import FILTERS, resize_weights
from picha_tpu.pixels import pack_f32, unpack_f32


def test_pack_unpack_roundtrip_u8_exhaustive():
    v = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(pack_f32(unpack_f32(v), np.uint8), v)


def test_pack_unpack_roundtrip_u16_sampled():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 65536, 100000, dtype=np.uint16)
    np.testing.assert_array_equal(pack_f32(unpack_f32(v), np.uint16), v)


def test_pack_clamps():
    assert pack_f32(np.array([-0.5, 1.5, 2.0]), np.uint8).tolist() == [0, 255, 255]


def test_filter_closed_forms():
    support, cubic = FILTERS["cubic"]
    assert support == 2.0
    assert cubic(0.0) == 1.0
    assert abs(cubic(2.0)) < 1e-6
    assert abs(cubic(1.0) - 0.5) < 1e-6
    _, tri = FILTERS["triangle"]
    assert tri(0.0) == 1.0 and abs(tri(1.0)) < 1e-7
    _, box = FILTERS["box"]
    assert box(0.3) == 1.0
    _, lanczos = FILTERS["lanczos"]
    assert lanczos(0.0) == 1.0
    assert abs(lanczos(1.0)) < 1e-6  # sinc zero at integer
    _, catmul = FILTERS["catmulrom"]
    # Mitchell family with B=0: interpolating (f(0)=1, f(1)=0)
    assert abs(catmul(0.0) - 1.0) < 1e-6
    assert abs(catmul(1.0)) < 1e-6
    _, mitchel = FILTERS["mitchel"]
    # B=C=0.333: f(0) = (6-2B)/6
    assert abs(mitchel(0.0) - (6 - 2 * 0.333) / 6) < 1e-5
    # continuity at |x|=1 for the two polynomial pieces
    eps = 1e-4
    assert abs(mitchel(1.0 - eps) - mitchel(1.0 + eps)) < 1e-2


def test_interior_window_is_symmetric():
    # an interior output's window is symmetric about its centre (the
    # grid edges are NOT mirror-symmetric under the reference's
    # integer-sample / half-offset-centre convention — by design)
    w = resize_weights(10, 20, "cubic", 1.0)
    row = w[5]
    nz = np.nonzero(row)[0]
    vals = row[nz]
    np.testing.assert_allclose(vals, vals[::-1], atol=1e-5)


def test_upscale_weights_partition_of_unity():
    for name in FILTERS:
        w = resize_weights(33, 10, name, 1.0)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_subview_invariants_random(seed):
    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(2, 30)), int(rng.integers(2, 30))
    fmt = rng.choice(["rgb", "rgba", "grey", "greya", "r16g16b16"])
    img = Image.from_array(
        rng.integers(0, 256, (h, w, Image(0, 0, fmt).format.channels))
        .astype(Image(0, 0, fmt).format.dtype), fmt)
    x = int(rng.integers(0, w))
    y = int(rng.integers(0, h))
    vw = int(rng.integers(1, w - x + 1))
    vh = int(rng.integers(1, h - y + 1))
    v = img.sub_view(x, y, vw, vh)
    np.testing.assert_array_equal(v.to_array(), img.to_array()[y:y+vh, x:x+vw])
    # nested subview composes
    if vw > 1 and vh > 1:
        v2 = v.sub_view(1, 1, vw - 1, vh - 1)
        np.testing.assert_array_equal(
            v2.to_array(), img.to_array()[y+1:y+vh, x+1:x+vw])
    # writes through the view hit the parent
    v.rows()[:] = 0
    assert (img.to_array()[y:y+vh, x:x+vw] == 0).all()


def test_stride_roundtrip_via_copy():
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (7, 5, 3), np.uint8)
    src = Image.from_array(arr, "rgb")
    wide = Image(width=5, height=7, pixel="rgb", stride=64)
    src.copy(wide)
    np.testing.assert_array_equal(wide.to_array(), arr)
    back = Image(width=5, height=7, pixel="rgb")
    wide.copy(back)
    assert back.equal_pixels(src)
