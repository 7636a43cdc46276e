"""Format sniffing + catalog tests — mirrors reference test/codec.js."""
import pytest

import picha_tpu as picha
from conftest import fixture_bytes

CASES = [
    ("test.png", "image/png", 50, 50),
    ("test2.jpg", "image/jpeg", 76, 50),
    ("smallliz.tif", "image/tiff", 160, 160),
    ("test.webp", "image/webp", 50, 50),
]


def test_catalog_order_and_contents():
    # sniffing order: jpeg, png, tiff, webp (picha.cc:205-268)
    assert list(picha.catalog.keys()) == [
        "image/jpeg", "image/png", "image/tiff", "image/webp"]


@pytest.mark.parametrize("name,mimetype,w,h", CASES)
def test_stat_sniffs(name, mimetype, w, h):
    st = picha.stat(fixture_bytes(name))
    assert st["mimetype"] == mimetype
    assert (st["width"], st["height"]) == (w, h)


@pytest.mark.parametrize("name,mimetype,w,h", CASES)
def test_generic_decode_matches_specific(name, mimetype, w, h):
    buf = fixture_bytes(name)
    generic = picha.decodeSync(buf)
    specific = picha.catalog[mimetype].decode_sync(buf, {})
    assert generic.equal_pixels(specific)


def test_generic_async_decode():
    res = {}
    picha.decode(fixture_bytes("test.png"),
                 lambda e, r: res.update(e=e, r=r)).result(60)
    assert res["e"] is None
    assert res["r"].pixel == "rgba"


def test_unsupported_raises():
    with pytest.raises(picha.UnsupportedFormatError):
        picha.decodeSync(b"definitely not an image")
    assert picha.stat(b"definitely not an image") is None


def test_encodes_lists():
    assert picha.catalog["image/jpeg"].encodes == ["rgb", "grey"]
    assert picha.catalog["image/webp"].encodes == ["rgb", "rgba"]
    assert len(picha.catalog["image/png"].encodes) == 8
    assert len(picha.catalog["image/tiff"].encodes) == 8


def test_catalog_entry_reference_members():
    # reference-style per-entry access: catalog[mime].decode/stat/...
    codec = picha.catalog["image/png"]
    buf = fixture_bytes("test.png")
    assert codec.stat(buf)["width"] == 50
    img = codec.decodeSync(buf, {})
    res = {}
    codec.decode(buf, lambda e, r: res.update(e=e, r=r)).result(60)
    assert res["e"] is None and res["r"].equal_pixels(img)
    data = codec.encodeSync(img, {})
    enc = {}
    codec.encode(img, lambda e, r: enc.update(e=e, r=r)).result(60)
    assert enc["r"] == data
