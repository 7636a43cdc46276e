"""Robustness fuzzing: corrupted/truncated bitstreams must surface as
PichaError (or stat -> None), never crash the process — the
reference's error-trap guarantee (SURVEY.md §5.3)."""
import numpy as np
import pytest

import picha_tpu as picha
from picha_tpu.errors import PichaError
from conftest import fixture_bytes

FIXTURES = ["test.png", "test2.jpg", "smallliz.tif", "test.webp",
            "test16.png", "test2cmyk.jpg"]


def _mutations(buf, rng):
    yield buf[: len(buf) // 3]                     # truncation
    yield buf[: len(buf) - 1]                      # off-by-one truncation
    b = bytearray(buf)
    for _ in range(8):                             # random bit flips
        b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
    yield bytes(b)
    b = bytearray(buf)
    pos = rng.integers(16, max(17, len(b) - 64))
    b[pos : pos + 32] = bytes(32)                  # zeroed window
    yield bytes(b)
    yield buf + bytes(64)                          # trailing garbage


@pytest.mark.parametrize("name", FIXTURES)
def test_decode_never_crashes(name):
    rng = np.random.default_rng(hash(name) % 2**31)
    buf = fixture_bytes(name)
    for mutant in _mutations(buf, rng):
        try:
            img = picha.decodeSync(mutant)
            # decoding corrupted data may still succeed (codecs can be
            # tolerant); the contract is just: typed error or valid Image
            assert img.width >= 0
        except PichaError:
            pass


@pytest.mark.parametrize("name", FIXTURES)
def test_stat_never_crashes(name):
    rng = np.random.default_rng(hash(name) % 2**31 + 1)
    buf = fixture_bytes(name)
    for mutant in _mutations(buf, rng):
        st = picha.stat(mutant)
        assert st is None or st["width"] >= 0


def test_pathological_headers():
    # dimension bombs / nonsense headers must not allocate absurd memory
    import struct, zlib
    # PNG declaring 1e9 x 1e9 with no data
    ihdr = struct.pack(">IIBBBBB", 10**9, 10**9, 8, 6, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", crc))
    with pytest.raises(PichaError):
        picha.decodePngSync(png)
    # TIFF pointing its IFD out of bounds
    tif = struct.pack("<2sHI", b"II", 42, 10**6)
    with pytest.raises(PichaError):
        picha.decodeTiffSync(tif)
    assert picha.statTiff(tif) is None


def test_fax_and_ycbcr_mutations_never_crash():
    """Round-2 decode paths (CCITT fax, FillOrder=2, subsampled YCbCr)
    under the same mutation battery: typed error or valid Image."""
    from tests.test_tiff import _pil_bilevel_tiff, _craft_fax_tiff
    from tests.test_tiff import _craft_ycbcr_tiff
    from picha_tpu.codecs import tiff as T
    rng = np.random.default_rng(99)
    arr = rng.random((24, 60)) < 0.5
    seeds = [_pil_bilevel_tiff(arr, "group4"),
             _pil_bilevel_tiff(arr, "group3"),
             _pil_bilevel_tiff(arr, "tiff_ccitt")]
    # fillorder-2 variant
    buf = _pil_bilevel_tiff(arr, "group4")
    _, ifds = T._parse_ifds(buf)
    off = ifds[0].one(T.T_STRIP_OFFSETS)
    cnt = ifds[0].one(T.T_STRIP_COUNTS)
    seg = T._BITREV[np.frombuffer(buf[off:off + cnt], np.uint8)].tobytes()
    seeds.append(_craft_fax_tiff(seg, 60, 24, 4, 2))
    # subsampled YCbCr
    y = rng.integers(0, 256, (24, 60), np.uint8)
    cb = rng.integers(0, 256, (12, 30), np.uint8)
    seeds.append(_craft_ycbcr_tiff(y, cb, cb, 60, 24, 2, 2))
    for seed_buf in seeds:
        for mutant in _mutations(seed_buf, rng):
            try:
                img = picha.decodeTiffSync(mutant)
                assert img.width >= 0
            except PichaError:
                pass
            st = picha.statTiff(mutant)
            assert st is None or st["width"] >= 0


def test_tiff_stat_malformed_tag_types_return_none():
    """Fuzz-found: crafted IFDs can store numeric tags with a BYTE/ASCII
    type (stat got bytes back and leaked ValueError) or an empty value
    list (IndexError). stat's contract is None for anything malformed."""
    import struct

    from picha_tpu.codecs import tiff as tiff_codec

    base = picha.encodeTiffSync(
        picha.Image.from_array(
            np.zeros((8, 8, 3), np.uint8), "rgb"), {"compression": "none"})
    buf = bytearray(base)
    ifd_off = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd_off:ifd_off + 2])[0]
    for i in range(n):
        e = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack("<HHI", buf[e:e + 8])
        if tag == 256:  # ImageWidth -> claim it's ASCII bytes
            buf[e + 2:e + 4] = struct.pack("<H", 2)
    assert tiff_codec.stat(bytes(buf)) is None
    # decode of the same mutant must raise a typed error, not leak
    with pytest.raises(PichaError):
        tiff_codec.CODEC.decode_sync(bytes(buf), {})
