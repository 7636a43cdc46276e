"""Image model tests — mirrors the validation and view semantics of the
reference's lib/image.js (stride defaulting, subView sharing, copy
overlap, comparison oracles)."""
import numpy as np
import pytest

from picha_tpu import Image
from picha_tpu.errors import InvalidImageError, InvalidOptionsError


def test_default_stride_is_4_byte_aligned():
    img = Image(width=5, height=3, pixel="rgb")
    assert img.stride == (5 * 3 + 3) & ~3 == 16
    assert img.data.size == 16 * 3


def test_defaults():
    img = Image()
    assert img.width == 0 and img.height == 0 and img.pixel == "rgba"


def test_r16g16_constructible():
    # the reference JS had a typo making r16g16 unconstructible
    # (lib/image.js:31) — fixed here per SURVEY.md appendix
    img = Image(width=2, height=2, pixel="r16g16")
    assert img.pixel_size() == 4


def test_invalid_pixel_rejected():
    with pytest.raises(InvalidOptionsError):
        Image(width=1, height=1, pixel="bogus")


def test_stride_too_short_rejected():
    with pytest.raises(InvalidImageError):
        Image(width=10, height=1, pixel="rgba", stride=8)


def test_data_too_small_rejected():
    with pytest.raises(InvalidImageError):
        Image(width=4, height=4, pixel="rgba", data=bytearray(10))


def test_memoryview_data_contract():
    """Writable C-contiguous views share memory zero-copy; read-only
    views copy (mutability contract); Fortran-layout views raise the
    module's typed error, not memoryview.cast's raw TypeError."""
    import numpy as np

    backing = bytearray(4 * 4 * 4)
    img = Image(width=4, height=4, pixel="rgba", data=memoryview(backing))
    img.data[0] = 77
    assert backing[0] == 77  # zero-copy
    ro = Image(width=4, height=4, pixel="rgba",
               data=memoryview(bytes(backing)))
    assert ro.data[0] == 77
    ro.data[0] = 1  # copies are mutable, backing unaffected
    fortran = np.asfortranarray(np.zeros((8, 8), np.uint8))
    with pytest.raises(InvalidImageError):
        Image(width=4, height=4, pixel="rgba", data=memoryview(fortran))


def test_short_last_row_accepted():
    # data only needs stride*(h-1) + w*psize bytes (lib/image.js:19)
    img = Image(width=3, height=2, pixel="grey", stride=4)
    need = 4 * 1 + 3
    Image(width=3, height=2, pixel="grey", stride=4, data=bytearray(need))
    assert img.data.size == 8


def test_subview_shares_memory():
    img = Image(width=8, height=8, pixel="rgba")
    view = img.sub_view(2, 3, 4, 4)
    view.data[0] = 99
    assert img.data[3 * img.stride + 2 * 4] == 99
    assert view.stride == img.stride
    assert view.width == 4 and view.height == 4


def test_subview_roundtrip_pixels():
    arr = np.arange(8 * 8 * 4, dtype=np.uint8).reshape(8, 8, 4)
    img = Image.from_array(arr, "rgba")
    v = img.sub_view(1, 2, 5, 3)
    np.testing.assert_array_equal(v.to_array(), arr[2:5, 1:6])


def test_copy_overlap_and_strides():
    src = Image.from_array(np.full((4, 4, 3), 7, np.uint8), "rgb")
    dst = Image(width=6, height=2, pixel="rgb")
    src.copy(dst)
    out = dst.to_array()
    assert (out[:2, :4] == 7).all()
    assert (out[:2, 4:] == 0).all()


def test_copy_pixel_mismatch_raises():
    with pytest.raises(InvalidImageError):
        Image(width=1, height=1, pixel="rgb").copy(Image(width=1, height=1, pixel="rgba"))


def test_equal_pixels_ignores_padding():
    a = Image(width=3, height=2, pixel="grey", stride=8)
    b = Image(width=3, height=2, pixel="grey", stride=4)
    a.data[:] = 0
    b.data[:] = 0
    a.data[5] = 77  # padding byte
    assert a.equal_pixels(b)
    a.data[1] = 1  # payload byte
    assert not a.equal_pixels(b)


def test_avg_channel_diff():
    a = Image.from_array(np.zeros((2, 2, 1), np.uint8), "grey")
    b = Image.from_array(np.full((2, 2, 1), 4, np.uint8), "grey")
    assert a.avg_channel_diff(b) == 4.0
    c = Image(width=3, height=2, pixel="grey")
    assert a.avg_channel_diff(c) == 255.0


def test_avg_channel_diff_is_per_byte_for_deep():
    a = Image.from_array(np.zeros((1, 1, 1), np.uint16), "r16")
    b = Image.from_array(np.full((1, 1, 1), 0x0102, np.uint16), "r16")
    # bytes are (little-endian) 0x02, 0x01 -> mean |diff| = 1.5
    assert a.avg_channel_diff(b) == pytest.approx(1.5)


def test_to_from_array_roundtrip_deep():
    arr = np.arange(12, dtype=np.uint16).reshape(2, 2, 3)
    img = Image.from_array(arr, "r16g16b16")
    np.testing.assert_array_equal(img.to_array(), arr)


def test_sub_view_out_of_bounds_raises():
    img = Image(width=8, height=6, pixel="rgb")
    for rect in [(-1, 0, 4, 4), (0, -2, 4, 4), (5, 0, 4, 4),
                 (0, 3, 8, 4), (0, 0, 0, 4), (0, 0, 4, 0)]:
        with pytest.raises(InvalidImageError):
            img.sub_view(*rect)


def test_to_array_is_a_copy():
    """to_array documents a copy; for unpadded strides the rows() view
    is already contiguous and a naive ascontiguousarray would alias the
    image buffer (mutations corrupting the Image, shape-dependently)."""
    import numpy as np

    img = Image(width=4, height=2, pixel="rgba")
    a = img.to_array()
    assert not np.shares_memory(a, img.data)
    a[0, 0, 0] = 123
    assert img.data[0] == 0


def test_row_bounds_checked():
    img = Image(width=4, height=2, pixel="grey")
    img.row(0)
    img.row(1)
    for y in (-1, 2, 100):
        with pytest.raises(InvalidImageError):
            img.row(y)


def test_from_array_zero_height():
    import numpy as np

    img = Image.from_array(np.zeros((0, 4, 3), np.uint8), "rgb")
    assert (img.width, img.height) == (4, 0)


def test_buffer_compare():
    # reference lib/image.js:46-55: lexicographic, shorter prefix first
    bc = Image.buffer_compare
    assert bc(b"abc", b"abc") == 0
    assert bc(b"abb", b"abc") == -1
    assert bc(b"abd", b"abc") == 1
    assert bc(b"ab", b"abc") == -1
    assert bc(b"abc", b"ab") == 1
    assert bc(b"", b"") == 0
    assert bc(np.frombuffer(b"ab", np.uint8), b"ab") == 0
    assert Image.bufferCompare is Image.buffer_compare
