"""TIFF codec tests — mirrors reference test/tiff_codec.js (always-RGBA
decode, round trips per compression, directory index) plus libtiff
interop via PIL."""
import io

import numpy as np
import pytest
from PIL import Image as PILImage

import picha_tpu as picha
from picha_tpu import Image
from conftest import fixture_bytes


def test_stat():
    st = picha.statTiff(fixture_bytes("smallliz.tif"))
    assert st == {"width": 160, "height": 160, "pixel": "rgba"}
    assert picha.statTiff(b"not a tiff") is None


def test_decode_always_rgba():
    img = picha.decodeTiffSync(fixture_bytes("smallliz.tif"))
    assert img.pixel == "rgba"
    assert (img.width, img.height) == (160, 160)
    assert (img.to_array()[:, :, 3] == 255).all()


@pytest.mark.parametrize("comp", ["lzw", "none", "deflate"])
def test_roundtrip_compressions(comp):
    img = picha.decodeTiffSync(fixture_bytes("smallliz.tif"))
    data = picha.encodeTiffSync(img, {"compression": comp})
    assert picha.decodeTiffSync(data).equal_pixels(img)
    # libtiff (via PIL) reads our output identically
    pil = np.array(PILImage.open(io.BytesIO(data)))
    np.testing.assert_array_equal(pil, img.to_array())


def test_invalid_compression_rejected():
    img = Image.from_array(np.zeros((2, 2, 4), np.uint8), "rgba")
    with pytest.raises(picha.InvalidOptionsError):
        picha.encodeTiffSync(img, {"compression": "jpeg"})


def test_directory_index():
    rng = np.random.default_rng(0)
    a = PILImage.fromarray(rng.integers(0, 256, (12, 10, 3), np.uint8), "RGB")
    b = PILImage.fromarray(rng.integers(0, 256, (6, 8, 3), np.uint8), "RGB")
    buf = io.BytesIO()
    a.save(buf, format="TIFF", save_all=True, append_images=[b])
    img0 = picha.decodeTiffSync(buf.getvalue())
    img1 = picha.decodeTiffSync(buf.getvalue(), {"index": 1})
    np.testing.assert_array_equal(img0.to_array()[:, :, :3], np.array(a))
    np.testing.assert_array_equal(img1.to_array()[:, :, :3], np.array(b))
    with pytest.raises(picha.CodecError):
        picha.decodeTiffSync(buf.getvalue(), {"index": 2})


def test_pil_interop_compressions():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    pim = PILImage.fromarray(arr, "RGB")
    for comp in ["tiff_lzw", "tiff_adobe_deflate", "packbits", None]:
        b = io.BytesIO()
        pim.save(b, format="TIFF", compression=comp)
        ours = picha.decodeTiffSync(b.getvalue())
        np.testing.assert_array_equal(ours.to_array()[:, :, :3], arr)


def test_grey_and_deep_sources():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    b = io.BytesIO()
    PILImage.fromarray(g, "L").save(b, format="TIFF")
    img = picha.decodeTiffSync(b.getvalue())
    assert img.pixel == "rgba"
    np.testing.assert_array_equal(img.to_array()[:, :, 0], g)
    np.testing.assert_array_equal(img.to_array()[:, :, 1], g)
    # our own 16-bit encode decodes with high-byte semantics
    deep = Image.from_array(
        rng.integers(0, 65536, (5, 5, 3), np.uint16), "r16g16b16")
    back = picha.decodeTiffSync(picha.encodeTiffSync(deep, {}))
    np.testing.assert_array_equal(
        back.to_array()[:, :, :3], (deep.to_array() >> 8).astype(np.uint8))


def test_alpha_roundtrip():
    rng = np.random.default_rng(3)
    img = Image.from_array(rng.integers(0, 256, (7, 7, 4), np.uint8), "rgba")
    back = picha.decodeTiffSync(picha.encodeTiffSync(img, {}))
    assert back.equal_pixels(img)


def test_sync_async_identical():
    img = picha.decodeTiffSync(fixture_bytes("smallliz.tif"))
    res = {}
    picha.encodeTiff(img, lambda e, r: res.update(e=e, r=r)).result(60)
    assert res["e"] is None
    assert res["r"] == picha.encodeTiffSync(img)


def test_bigendian_16bit_predictor():
    # regression: byte swap must precede predictor accumulation (the
    # horizontal accumulator works on native-endian sample values)
    rng = np.random.default_rng(7)
    arr16 = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    # build a big-endian LZW+predictor TIFF via PIL is awkward; craft one
    import struct
    from picha_tpu.native import lib as native
    h, w = arr16.shape
    # horizontal-difference then big-endian bytes, LZW compressed
    diff = arr16.astype(np.int64).copy()
    diff[:, 1:] = (arr16[:, 1:].astype(np.int64) - arr16[:, :-1]) % 65536
    raw = diff.astype(">u2").tobytes()
    comp = native.lzw_encode(raw)
    # minimal big-endian TIFF
    def entry(tag, typ, count, val):
        return struct.pack(">HHII", tag, typ, count, val)
    nent = 9
    ifd_off = 8
    data_off = ifd_off + 2 + nent * 12 + 4
    body = struct.pack(">H", nent)
    body += entry(256, 4, 1, w)           # width
    body += entry(257, 4, 1, h)           # height
    body += entry(258, 3, 1, 16 << 16)    # bits (SHORT left-justified)
    body += entry(259, 3, 1, 5 << 16)     # LZW
    body += entry(262, 3, 1, 1 << 16)     # MinIsBlack
    body += entry(273, 4, 1, data_off)    # strip offset
    body += entry(277, 3, 1, 1 << 16)     # samples/pixel
    body += entry(279, 4, 1, len(comp))   # counts
    body += entry(317, 3, 1, 2 << 16)     # predictor 2
    body += struct.pack(">I", 0)
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off) + body + comp
    img = picha.decodeTiffSync(buf)
    want = (arr16 >> 8).astype(np.uint8)
    np.testing.assert_array_equal(img.to_array()[:, :, 0], want)


def _craft_tiff(tags, data, endian="<"):
    """Minimal single-IFD TIFF builder. tags: list of (tag, type, count,
    value-or-bytes); values > 4 bytes must be pre-placed in `data` with
    offsets accounted for by the caller (we keep values inline here)."""
    import struct
    ifd_off = 8
    nent = len(tags)
    data_off = ifd_off + 2 + nent * 12 + 4
    body = struct.pack(endian + "H", nent)
    for tag, typ, count, val in sorted(tags):
        if typ == 3:
            packed = struct.pack(endian + "HH", val, 0)
        else:
            packed = struct.pack(endian + "I", val)
        body += struct.pack(endian + "HHI", tag, typ, count) + packed
    body += struct.pack(endian + "I", 0)
    return struct.pack(endian + "2sHI", b"II" if endian == "<" else b"MM",
                       42, ifd_off) + body + data


def _grey_tiff(arr, orientation=1):
    h, w = arr.shape
    data_off = 8 + 2 + 8 * 12 + 4
    tags = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, data_off), (279, 4, 1, arr.size),
            (274, 3, 1, orientation)]
    return _craft_tiff(tags, arr.tobytes())


@pytest.mark.parametrize("orientation", range(1, 9))
def test_orientations(orientation):
    base = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    img = picha.decodeTiffSync(_grey_tiff(base, orientation))
    got = img.to_array()[:, :, 0]
    want = {
        1: base, 2: base[:, ::-1], 3: base[::-1, ::-1], 4: base[::-1],
        5: base.T, 6: base.T[:, ::-1], 7: base.T[::-1, ::-1], 8: base.T[::-1],
    }[orientation]
    np.testing.assert_array_equal(got, want)


def test_tiled_tiff_decode():
    """Tiled layout (tags 322-325): 32x32 tiles over a 48x40 image."""
    import struct
    rng = np.random.default_rng(11)
    h, w, tw, th = 40, 48, 32, 32
    arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    tiles = []
    for ty in range(0, h, th):
        for tx in range(0, w, tw):
            tile = np.zeros((th, tw), np.uint8)
            sl = arr[ty:ty+th, tx:tx+tw]
            tile[:sl.shape[0], :sl.shape[1]] = sl
            tiles.append(tile.tobytes())
    ntiles = len(tiles)
    nent = 9
    # external value areas for the offset/count arrays
    ifd_off = 8
    ifd_size = 2 + nent * 12 + 4
    ext_off = ifd_off + ifd_size
    offsets_area = ext_off
    counts_area = offsets_area + 4 * ntiles
    data_start = counts_area + 4 * ntiles
    offs, pos = [], data_start
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    body = struct.pack("<H", nent)
    for tag, typ, count, val in sorted([
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (322, 4, 1, tw), (323, 4, 1, th),
            (324, 4, ntiles, offsets_area), (325, 4, ntiles, counts_area)]):
        if typ == 3:
            packed = struct.pack("<HH", val, 0)
        else:
            packed = struct.pack("<I", val)
        body += struct.pack("<HHI", tag, typ, count) + packed
    body += struct.pack("<I", 0)
    buf = (struct.pack("<2sHI", b"II", 42, ifd_off) + body
           + b"".join(struct.pack("<I", o) for o in offs)
           + b"".join(struct.pack("<I", len(t)) for t in tiles)
           + b"".join(tiles))
    img = picha.decodeTiffSync(buf)
    np.testing.assert_array_equal(img.to_array()[:, :, 0], arr)


@pytest.mark.parametrize("orientation", range(1, 9))
def test_stat_dims_match_decode(orientation):
    """stat() and decode() must agree on geometry for every orientation
    (deviation from libtiff noted in codecs/tiff.py: 5-8 transpose)."""
    base = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    buf = _grey_tiff(base, orientation)
    st = picha.statTiff(buf)
    img = picha.decodeTiffSync(buf)
    assert (st["width"], st["height"]) == (img.width, img.height)


def test_tile_table_guards():
    """Crafted tiled files with missing TileWidth or short tables raise
    CodecError, not raw TypeError/IndexError."""
    import struct
    arr = np.zeros((4, 4), np.uint8)
    data_off = 8 + 2 + 9 * 12 + 4
    # missing TileLength (323): only TileWidth present
    tags = [(256, 4, 1, 4), (257, 4, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (322, 4, 1, 16),
            (324, 4, 1, data_off), (325, 4, 1, arr.size), (277, 3, 1, 1)]
    with pytest.raises(picha.CodecError):
        picha.decodeTiffSync(_craft_tiff(tags, arr.tobytes()))
    # tile tables shorter than tiles_x*tiles_y (16x16 tiles over 40x40
    # needs 9 tiles; only 1 offset/count given)
    tags = [(256, 4, 1, 40), (257, 4, 1, 40), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (322, 4, 1, 16), (323, 4, 1, 16),
            (324, 4, 1, data_off), (325, 4, 1, 16), (277, 3, 1, 1)]
    with pytest.raises(picha.CodecError):
        picha.decodeTiffSync(_craft_tiff(tags, arr.tobytes()))


# ---------------------------------------------------------------------------
# CCITT fax (compressions 2/3/4), FillOrder, subsampled YCbCr
# (reference: TIFFReadRGBAImageOriented handles all of these,
#  /root/reference/src/tiffcodec.cc:130-137)
# ---------------------------------------------------------------------------

def _pil_bilevel_tiff(arr_black, compression, **kw):
    import io
    from PIL import Image as PILImage
    pim = PILImage.fromarray(
        np.where(arr_black, 0, 255).astype(np.uint8)).convert("1")
    b = io.BytesIO()
    pim.save(b, format="TIFF", compression=compression, **kw)
    return b.getvalue()


@pytest.mark.parametrize("compression", ["group4", "group3", "tiff_ccitt"])
def test_fax_decode_matches_pil(compression):
    rng = np.random.default_rng(7)
    for trial in range(8):
        h, w = int(rng.integers(1, 60)), int(rng.integers(1, 150))
        if trial % 2:
            arr = rng.random((h, w)) < rng.uniform(0.1, 0.9)
        else:  # diagonal structure exercises 2-D vertical/pass/horizontal
            arr = (np.add.outer(np.arange(h), np.arange(w)) //
                   int(rng.integers(1, 7))) % 2 == 0
        img = picha.decodeTiffSync(_pil_bilevel_tiff(arr, compression))
        got = img.to_array()[:, :, 0] == 0
        np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize("compression", ["group4", "group3"])
def test_fax_run_lengths(compression):
    """Exercise terminating + makeup codes in both colours."""
    for L in [0, 1, 63, 64, 128, 1664, 1728, 1792, 2560, 2623]:
        w = max(L + 3, 2700)
        arr = np.zeros((2, w), bool)
        arr[0, L:] = True   # white run L then black
        arr[1, :L] = True   # black run L then white
        img = picha.decodeTiffSync(_pil_bilevel_tiff(arr, compression))
        got = img.to_array()[:, :, 0] == 0
        np.testing.assert_array_equal(got, arr)


def _craft_fax_tiff(seg, w, h, comp, fillorder, extra_tags=()):
    import struct
    tags = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 1), (259, 3, 1, comp),
            (262, 3, 1, 1), (266, 3, 1, fillorder), (277, 3, 1, 1),
            (278, 4, 1, h), (279, 4, 1, len(seg))] + list(extra_tags)
    tags.append((273, 4, 1, 8 + 2 + (len(tags) + 1) * 12 + 4))
    tags.sort()
    import struct
    body = struct.pack("<H", len(tags))
    for tag, typ, count, val in tags:
        packed = (struct.pack("<HH", val, 0) if typ == 3
                  else struct.pack("<I", val))
        body += struct.pack("<HHI", tag, typ, count) + packed
    body += struct.pack("<I", 0)
    return struct.pack("<2sHI", b"II", 42, 8) + body + seg


def test_fax_fillorder_lsb_first():
    """FillOrder=2 segments are bit-reversed before fax decode, like
    libtiff's TIFFReverseBits."""
    from picha_tpu.codecs import tiff as T
    rng = np.random.default_rng(3)
    arr = rng.random((20, 120)) < 0.4
    buf = _pil_bilevel_tiff(arr, "group4")
    _, ifds = T._parse_ifds(buf)
    off = ifds[0].one(T.T_STRIP_OFFSETS)
    cnt = ifds[0].one(T.T_STRIP_COUNTS)
    seg = T._BITREV[np.frombuffer(buf[off:off + cnt], np.uint8)].tobytes()
    img = picha.decodeTiffSync(_craft_fax_tiff(seg, 120, 20, 4, 2))
    got = img.to_array()[:, :, 0] == 0
    np.testing.assert_array_equal(got, arr)


def test_uncompressed_fillorder_lsb_first():
    from picha_tpu.codecs import tiff as T
    rng = np.random.default_rng(4)
    arr = rng.random((10, 50)) < 0.5
    bits = np.packbits(np.where(arr, 0, 1).astype(np.uint8), axis=1)
    seg = T._BITREV[bits.reshape(-1)].tobytes()
    img = picha.decodeTiffSync(_craft_fax_tiff(seg, 50, 10, 1, 2))
    got = img.to_array()[:, :, 0] == 0
    np.testing.assert_array_equal(got, arr)


def test_g3_2d_with_tag_bits():
    """Group 3 2-D (T4Options bit 0): rows carry a 1-D/2-D tag bit
    after each EOL. libtiff writes real 2-D rows when asked."""
    rng = np.random.default_rng(5)
    arr = (np.add.outer(np.arange(30), np.arange(90)) // 4) % 2 == 0
    try:
        buf = _pil_bilevel_tiff(arr, "group3", tiffinfo={292: 1})
    except Exception:
        pytest.skip("PIL cannot write G3-2D here")
    from picha_tpu.codecs import tiff as T
    _, ifds = T._parse_ifds(buf)
    if int(ifds[0].one(292, 0)) & 1 == 0:
        pytest.skip("libtiff ignored the 2-D option")
    img = picha.decodeTiffSync(buf)
    got = img.to_array()[:, :, 0] == 0
    np.testing.assert_array_equal(got, arr)


def _craft_ycbcr_tiff(y, cb, cr, width, height, hs, vs):
    """Pack planes into TIFF 6.0 §21 data units (hs*vs Y, then Cb, Cr)."""
    import struct
    nur, upr = cb.shape
    units = np.zeros((nur, upr, hs * vs + 2), np.uint8)
    yb = y.reshape(nur, vs, upr, hs).transpose(0, 2, 1, 3)
    units[:, :, : hs * vs] = yb.reshape(nur, upr, hs * vs)
    units[:, :, hs * vs] = cb
    units[:, :, hs * vs + 1] = cr
    seg = units.tobytes()
    tags = [(256, 4, 1, width), (257, 4, 1, height), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 6), (277, 3, 1, 3),
            (278, 4, 1, height), (279, 4, 1, len(seg)),
            (530, 3, 1, hs | (vs << 16))]
    # YCbCrSubSampling is two SHORTs packed into the value field
    tags = [t for t in tags if t[0] != 530]
    tags.append((273, 4, 1, 8 + 2 + (len(tags) + 2) * 12 + 4))
    body_tags = sorted(tags + [(530, 3, 2, hs | (vs << 16))])
    body = struct.pack("<H", len(body_tags))
    for tag, typ, count, val in body_tags:
        if (tag, count) == (530, 2):
            packed = struct.pack("<HH", hs, vs)
        elif typ == 3:
            packed = struct.pack("<HH", val, 0)
        else:
            packed = struct.pack("<I", val)
        body += struct.pack("<HHI", tag, typ, count) + packed
    body += struct.pack("<I", 0)
    return struct.pack("<2sHI", b"II", 42, 8) + body + seg


@pytest.mark.parametrize("hs,vs", [(2, 2), (2, 1), (1, 2), (4, 4)])
def test_ycbcr_subsampled_uncompressed(hs, vs):
    """Subsampled YCbCr with chroma constant per block must decode
    identically to the same data written 1x1 (replication upsample)."""
    rng = np.random.default_rng(6)
    height, width = 12, 20
    hp, wp = -(-height // vs) * vs, -(-width // hs) * hs
    y = rng.integers(0, 256, (hp, wp), np.uint8)
    cb_s = rng.integers(0, 256, (hp // vs, wp // hs), np.uint8)
    cr_s = rng.integers(0, 256, (hp // vs, wp // hs), np.uint8)
    sub = _craft_ycbcr_tiff(y, cb_s, cr_s, width, height, hs, vs)
    got = picha.decodeTiffSync(sub).to_array()
    # oracle: the same pixels as a 1x1 (non-subsampled) YCbCr file
    cb = cb_s.repeat(vs, 0).repeat(hs, 1)
    cr = cr_s.repeat(vs, 0).repeat(hs, 1)
    flat = _craft_ycbcr_tiff(
        np.stack([y, cb, cr], -1).reshape(hp, wp * 3)[:, ::3].copy()
        if False else y, cb, cr, width, height, 1, 1)
    want = picha.decodeTiffSync(flat).to_array()
    np.testing.assert_array_equal(got, want)


def test_lzw_multi_strip_table_anomalies():
    """Malformed strip tables must not crash the batched LZW path:
    out-of-range offsets fall back to the per-strip path and surface as
    CodecError (not a native crash or silent garbage)."""
    import struct

    import numpy as np
    import pytest

    from picha_tpu.codecs import tiff as tiff_codec
    from picha_tpu.errors import CodecError

    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 48, 3), np.uint8)
    img = Image.from_array(a, "rgb")
    buf = bytearray(tiff_codec.encode(img, {"compression": "lzw"}))

    # locate the StripOffsets entry in the IFD and poison it to point
    # past the end of the file
    ifd_off = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd_off:ifd_off + 2])[0]
    for i in range(n):
        e = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack("<HHI", buf[e:e + 8])
        if tag == 273 and cnt == 1:  # StripOffsets inline
            buf[e + 8:e + 12] = struct.pack("<I", len(buf) + 1000)
            break
    else:
        pytest.skip("offsets not inline for this geometry")
    with pytest.raises(CodecError):
        tiff_codec.decode(bytes(buf), {})

    # and a truncated file: strip count larger than the data present
    good = tiff_codec.encode(img, {"compression": "lzw"})
    with pytest.raises(CodecError):
        tiff_codec.decode(good[: len(good) // 3], {})


def test_corrupt_deflate_strip_is_typed():
    """A corrupt/truncated deflate strip must surface as CodecError on
    BOTH zlib backends — the zlib fallback used to leak a raw
    zlib.error through TiffCodec.decode_sync (review r3d)."""
    import struct

    import numpy as np

    from picha_tpu.codecs import tiff as tiff_codec
    from picha_tpu.errors import CodecError

    rng = np.random.default_rng(7)
    img = Image.from_array(rng.integers(0, 256, (48, 64, 3), np.uint8),
                           "rgb")
    buf = bytearray(tiff_codec.encode(img, {"compression": "deflate"}))
    # mangle the strip data (laid out right after the 8-byte header)
    buf[8:16] = b"\x00" * 8
    with pytest.raises(CodecError):
        tiff_codec.decode(bytes(buf), {})
    # sync API boundary keeps the typed contract too
    with pytest.raises(picha.CodecError):
        picha.decodeTiffSync(bytes(buf))

    # crafted geometry: huge claimed dims push `expected` past the
    # 1032:1 deflate bound -> zlib fallback path -> still typed
    big = bytearray(tiff_codec.encode(img, {"compression": "deflate"}))
    ifd_off = struct.unpack("<I", big[4:8])[0]
    n = struct.unpack("<H", big[ifd_off:ifd_off + 2])[0]
    for i in range(n):
        e = ifd_off + 2 + i * 12
        tag = struct.unpack("<H", big[e:e + 2])[0]
        if tag in (256, 257):  # width/height
            big[e + 8:e + 12] = struct.pack("<I", 60000)
    with pytest.raises(picha.CodecError):  # the decode_sync boundary
        picha.decodeTiffSync(bytes(big))   # converts parser leaks too


def test_crafted_fax_2d_nonmonotonic_no_crash():
    """A 6-byte G3 2-D stream whose H then VL3 moves code DECREASING
    changing elements drove paint() into a negative-span memset cast to
    size_t (confirmed SIGSEGV pre-fix). Must decode to something, never
    crash."""
    from picha_tpu.native import lib as native

    out = native.fax_decode(bytes.fromhex("75eb00047182"), 16, 2, 3, 1)
    assert out.shape == (2, 16)


def test_lzw_width_boundary_roundtrip():
    """Streams whose in-loop dictionary insertion count lands exactly
    on a width boundary (253/765/1789 since the last clear) need
    libtiff's post-final-code width bump before EOI — without it the
    decoder misreads EOI one bit narrow (confirmed failure pre-fix).
    Random data inserts ~1 entry/byte, so sweeping lengths across the
    boundaries crosses them all."""
    from picha_tpu.native import lib as native

    rng = np.random.default_rng(0)
    for lo, hi in ((248, 262), (758, 772), (1782, 1798)):
        for n in range(lo, hi):
            data = rng.integers(0, 256, n, np.uint8).tobytes()
            assert native.lzw_decode(native.lzw_encode(data),
                                     len(data)) == data, n


def test_overlong_strips_truncate_like_libtiff():
    """Output overruns clamp-and-succeed (libtiff fills exactly occ and
    discards the excess — padded final strips are common), instead of
    the hard error that rejected files libtiff reads fine."""
    from picha_tpu.native import lib as native

    data = bytes(range(256)) * 4
    enc = native.lzw_encode(data)
    assert native.lzw_decode(enc, 100) == data[:100]
    # PackBits: a literal run crossing the cap
    pb = b"\x7f" + bytes(128) + b"\x7f" + bytes(128)
    assert native.packbits_decode(pb, 130) == bytes(130)


def test_crafted_tag_values_fail_typed():
    """BitsPerSample 0/32, predictor 3, RowsPerStrip 0 and a
    SamplesPerPixel allocation bomb must all raise CodecError before
    any giant allocation (or wrong-pixel output) happens."""
    import struct as _s

    base = np.arange(16, dtype=np.uint8).reshape(4, 4)

    def craft(extra):
        data_off = 8 + 2 + (6 + len(extra)) * 12 + 4
        tags = [(256, 4, 1, 4), (257, 4, 1, 4), (259, 3, 1, 1),
                (262, 3, 1, 1), (273, 4, 1, data_off),
                (279, 4, 1, base.size)] + extra
        return _craft_tiff(tags, base.tobytes())

    for extra in ([(258, 3, 1, 0)],            # bits = 0 (ZeroDivision)
                  [(258, 3, 1, 32)],           # bits = 32 (no dtype)
                  [(258, 3, 1, 8), (317, 3, 1, 3)],   # float predictor
                  # rps = -5 via SLONG (0 is benign: "whole image")
                  [(258, 3, 1, 8), (278, 9, 1, 0xFFFFFFFB)],
                  [(258, 3, 1, 8), (277, 3, 1, 60000)]):  # spp bomb
        with pytest.raises(picha.CodecError):
            picha.decodeTiffSync(craft(extra))


def test_encoded_ifd_is_word_aligned():
    """TIFF 6.0 requires the IFD on a word boundary; LZW strips have
    odd lengths half the time, so the writer must pad."""
    rng = np.random.default_rng(5)
    for trial in range(6):
        arr = rng.integers(0, 256, (13 + trial, 17, 3), np.uint8)
        buf = picha.encodeTiffSync(picha.Image.from_array(arr, "rgb"),
                                   {"compression": "lzw"})
        (ifd_off,) = np.frombuffer(bytes(buf[4:8]), np.uint32)
        assert ifd_off % 2 == 0
        assert picha.decodeTiffSync(buf).width == 17
