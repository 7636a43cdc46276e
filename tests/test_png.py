"""PNG codec tests — mirrors reference test/png_codec.js plus interop
and property checks."""
import io

import numpy as np
import pytest
from PIL import Image as PILImage

import picha_tpu as picha
from picha_tpu import Image
from conftest import fixture_bytes


def test_stat():
    st = picha.statPng(fixture_bytes("test.png"))
    assert st == {"width": 50, "height": 50, "pixel": "rgba"}
    # 16-bit file: stat reports the deep format (pngcodec.cc:310)
    st16 = picha.statPng(fixture_bytes("test16.png"))
    assert st16 == {"width": 50, "height": 50, "pixel": "r16g16b16"}
    assert picha.statPng(b"not a png") is None


def test_decode_matches_pil():
    for name in ["test.png", "test16.png", "greytest.png", "test2.png"]:
        img = picha.decodePngSync(fixture_bytes(name))
        pil = np.array(PILImage.open(io.BytesIO(fixture_bytes(name))))
        if pil.ndim == 2:
            pil = pil[:, :, None]
        np.testing.assert_array_equal(img.to_array(), pil)


def test_sync_async_identical():
    buf = fixture_bytes("test.png")
    res = {}
    picha.decodePng(buf, lambda e, r: res.update(e=e, r=r)).result(60)
    assert res["e"] is None
    assert res["r"].equal_pixels(picha.decodePngSync(buf))
    img = res["r"]
    enc_res = {}
    picha.encodePng(img, lambda e, r: enc_res.update(e=e, r=r)).result(60)
    assert enc_res["e"] is None
    assert enc_res["r"] == picha.encodePngSync(img)  # byte-identical


def test_lossless_roundtrip():
    img = picha.decodePngSync(fixture_bytes("test.png"))
    data = picha.encodePngSync(img)
    assert picha.decodePngSync(data).equal_pixels(img)


def test_deep_decode():
    buf = fixture_bytes("test16.png")
    deep = picha.decodePngSync(buf, {"deep": True})
    assert deep.pixel == "r16g16b16"
    shallow = picha.decodePngSync(buf)
    assert shallow.pixel == "rgb"
    # high-byte chop relation
    np.testing.assert_array_equal(
        (deep.to_array() >> 8).astype(np.uint8), shallow.to_array())
    # deep round trip is lossless
    data = picha.encodePngSync(deep)
    assert picha.decodePngSync(data, {"deep": True}).equal_pixels(deep)


def test_pixel_request():
    # undocumented opts.pixel target (pngcodec.cc:218-236)
    buf = fixture_bytes("test.png")
    grey = picha.decodePngSync(buf, {"pixel": "grey"})
    assert grey.pixel == "grey"
    rgb = picha.decodePngSync(buf, {"pixel": "rgb"})
    assert rgb.pixel == "rgb"
    # deep request downgrades on non-16-bit source (pngcodec.cc:75-85)
    assert picha.decodePngSync(buf, {"pixel": "r16g16b16"}).pixel == "rgb"


def test_all_formats_roundtrip():
    rng = np.random.default_rng(3)
    for pix in ["rgb", "rgba", "grey", "greya", "r16", "r16g16",
                "r16g16b16", "r16g16b16a16"]:
        fmt = picha.Image(width=0, height=0, pixel=pix).format
        arr = rng.integers(0, fmt.max_value + 1, (13, 11, fmt.channels),
                           dtype=fmt.dtype)
        img = Image.from_array(arr, pix)
        back = picha.decodePngSync(picha.encodePngSync(img),
                                   {"deep": fmt.is_deep})
        assert back.equal_pixels(img), pix


def test_pil_reads_our_output():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (9, 9, 4), dtype=np.uint8)
    data = picha.encodePngSync(Image.from_array(arr, "rgba"))
    pil = np.array(PILImage.open(io.BytesIO(data)))
    np.testing.assert_array_equal(pil, arr)


def test_interlaced_and_palette_decode():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    pim = PILImage.fromarray(arr, "RGB")
    # interlaced
    b = io.BytesIO()
    pim.save(b, format="PNG", interlace=True)
    img = picha.decodePngSync(b.getvalue())
    np.testing.assert_array_equal(img.to_array(), arr)
    # palette
    b = io.BytesIO()
    pim.convert("P", palette=PILImage.ADAPTIVE).save(b, format="PNG")
    img = picha.decodePngSync(b.getvalue())
    assert img.pixel == "rgb"
    pil = np.array(PILImage.open(io.BytesIO(b.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(img.to_array(), pil)


def test_corrupt_data_raises():
    buf = bytearray(fixture_bytes("test.png"))
    buf[bytes(buf).find(b"IDAT") + 10] ^= 0xFF  # corrupt IDAT -> CRC failure
    with pytest.raises(picha.CodecError):
        picha.decodePngSync(bytes(buf))
    with pytest.raises(picha.CodecError):
        picha.decodePngSync(b"\x89PNG\r\n\x1a\ntruncated")


def _chunk(ctype, data):
    import struct, zlib
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _make_png(width, height, depth, color_type, raw_rows, extra=b""):
    import struct, zlib
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    idat = zlib.compress(raw_rows)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


def test_4bit_grayscale_decode():
    # two 4-bit pixels per byte, MSB first; values scale by 17 (255/15)
    rows = b"".join(b"\x00" + bytes([0x0F, 0x8C]) for _ in range(3))
    png = _make_png(4, 3, 4, 0, rows)
    img = picha.decodePngSync(png)
    assert img.pixel == "grey"
    want = np.array([0, 15 * 17, 8 * 17, 12 * 17], np.uint8)
    np.testing.assert_array_equal(img.to_array()[0, :, 0], want)


def test_1bit_grayscale_decode():
    rows = b"\x00\xA0" * 2  # pixels 1,0,1,0 -> 255,0,255,0
    png = _make_png(4, 2, 1, 0, rows)
    img = picha.decodePngSync(png)
    np.testing.assert_array_equal(img.to_array()[0, :, 0], [255, 0, 255, 0])


def test_trns_colour_key_rgb():
    import struct
    # 2x1 rgb: red (the key) and blue
    rows = b"\x00" + bytes([255, 0, 0, 0, 0, 255])
    trns = _chunk(b"tRNS", struct.pack(">HHH", 255, 0, 0))
    png = _make_png(2, 1, 8, 2, rows, extra=trns)
    img = picha.decodePngSync(png, {"pixel": "rgba"})
    arr = img.to_array()
    assert arr[0, 0, 3] == 0       # keyed pixel transparent
    assert arr[0, 1, 3] == 255
    # without an alpha target the key is ignored
    rgb = picha.decodePngSync(png)
    assert rgb.pixel == "rgb"


def test_trns_grey_key():
    import struct
    rows = b"\x00" + bytes([7, 9])
    trns = _chunk(b"tRNS", struct.pack(">H", 7))
    png = _make_png(2, 1, 8, 0, rows, extra=trns)
    img = picha.decodePngSync(png, {"pixel": "greya"})
    arr = img.to_array()
    np.testing.assert_array_equal(arr[0, :, 1], [0, 255])


def test_ancillary_crc_mismatch_warns_and_continues():
    """libpng warns on ancillary-chunk CRC errors and keeps decoding;
    critical chunks stay hard failures."""
    import struct, warnings
    raw = b"".join(b"\x00" + bytes([10, 20, 30]) for _ in range(2))
    bad_text = _chunk(b"tEXt", b"k\x00v")
    bad_text = bad_text[:-4] + struct.pack(">I", 0xDEADBEEF)
    buf = _make_png(1, 2, 8, 2, raw, extra=bad_text)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        img = picha.decodePngSync(buf)
    assert img.width == 1 and img.height == 2
    assert any("CRC" in str(w.message) for w in rec)


def test_palette_index_out_of_range_decodes_black():
    """Indices beyond the PLTE entry count resolve to black (matches the
    batched path's zero-padded 256-entry tables)."""
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))  # 2 entries
    raw = b"\x00\x05\x00\x01"  # rows: index 5 (OOB), index 1
    buf = _make_png(1, 2, 8, 3, raw, extra=plte)
    img = picha.decodePngSync(buf)
    arr = img.to_array()
    np.testing.assert_array_equal(arr[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(arr[1, 0], [0, 255, 0])


def test_libdeflate_shim_matches_zlib():
    """The whole-buffer libdeflate path must be a drop-in for zlib:
    inflate agrees byte-for-byte, deflate output re-inflates under
    stock zlib, and a too-small expected size transparently takes the
    internal zlib fallback (keep-the-extras semantics) rather than
    truncating."""
    import zlib
    from picha_tpu.native import lib as native
    if not native.have_libdeflate():
        import pytest
        pytest.skip("native lib built without libdeflate")
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, 64 * 1024, dtype=np.uint8).tobytes()
    payload += bytes(8192) + b"abc" * 5000
    z = zlib.compress(payload, 6)
    assert native.zlib_inflate(z, len(payload)) == payload
    assert native.zlib_inflate(z, len(payload) - 1) == payload
    for level in (0, 1, 6, 9, 12):
        d = native.zlib_deflate(payload, level)
        assert zlib.decompress(d) == payload
    import pytest as _pytest
    from picha_tpu.errors import CodecError
    with _pytest.raises(CodecError):
        native.zlib_inflate(z[:-4] + b"\x00\x00\x00\x00", len(payload))


def test_png_compression_level_option():
    """compressionLevel surfaces like the reference's option surface:
    -1 (default) and 0-9 accepted, out-of-range rejected, smaller level
    -> larger-or-equal file, all levels decode back identically."""
    rng = np.random.default_rng(3)
    arr = np.repeat(rng.integers(0, 256, (32, 8, 3), dtype=np.uint8),
                    8, axis=1)
    img = picha.Image.from_array(arr, "rgb")
    sizes = {}
    for level in (-1, 0, 2, 9):
        buf = picha.encodePngSync(img, {"compressionLevel": level})
        out = picha.decodePngSync(buf)
        np.testing.assert_array_equal(out.to_array(), arr)
        sizes[level] = len(buf)
    assert sizes[0] > sizes[2] >= sizes[9]
    with pytest.raises(picha.InvalidOptionsError):
        picha.encodePngSync(img, {"compressionLevel": 10})


def test_crafted_header_dimensions_fail_typed():
    """Crafted IHDR dimensions must raise CodecError before any
    size-derived allocation (libpng's default user-limit behavior) —
    never MemoryError/ValueError."""
    import struct, zlib as _zlib
    for w, hgt in ((1 << 31, 100000), (0xFFFFFFFF, 0xFFFFFFFF),
                   (1_000_001, 10)):
        ihdr = struct.pack(">IIBBBBB", w & 0xFFFFFFFF, hgt & 0xFFFFFFFF,
                           8, 2, 0, 0, 0)
        idat = _zlib.compress(b"\x00" * 64)
        buf = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))
        with pytest.raises(picha.CodecError):
            picha.decodePngSync(buf)
        assert picha.statPng(buf) is None
    # a claimed-huge but in-limit header with a tiny stream stays the
    # typed truncation error (the inflate path must not pre-allocate
    # the claimed size for a stream that cannot fill it)
    ihdr = struct.pack(">IIBBBBB", 500_000, 900_000, 8, 2, 0, 0, 0)
    buf = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", _zlib.compress(b"\x00" * 64))
           + _chunk(b"IEND", b""))
    with pytest.raises(picha.CodecError):
        picha.decodePngSync(buf)


def test_parallel_deflate_stream_valid():
    """deflateThreads produces ONE standard zlib stream (pigz-style
    sync-flush concatenation) that plain zlib decodes byte-identically
    to the filtered input, and the encoded PNG round-trips losslessly
    with <0.5% size cost vs the whole-buffer encode."""
    import zlib

    from picha_tpu.codecs.png import deflate_parallel

    rng = np.random.default_rng(7)
    # compressible-but-nontrivial payload several chunks long
    base = np.repeat(rng.integers(0, 255, 300_000, dtype=np.uint8), 4)
    noise = rng.integers(0, 8, base.size, dtype=np.uint8)
    data = ((base + noise) & 0xFF).tobytes()
    for threads in (2, 3):
        z = deflate_parallel(data, 6, threads)
        assert zlib.decompress(z) == data
    ratio = len(deflate_parallel(data, 6, 3)) / len(zlib.compress(data, 6))
    assert ratio < 1.005

    arr = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    img = Image.from_array(arr, "rgb")
    b_par = picha.encodePngSync(img, {"deflateThreads": 2})
    b_ser = picha.encodePngSync(img)
    back = picha.decodePngSync(b_par)
    assert back.equal_pixels(img)
    assert len(b_par) < len(b_ser) * 1.01

    with pytest.raises(picha.InvalidOptionsError):
        picha.encodePngSync(img, {"deflateThreads": 0})
    with pytest.raises(picha.InvalidOptionsError):
        picha.encodePngSync(img, {"deflateThreads": 1.5})
