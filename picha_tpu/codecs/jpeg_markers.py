"""JPEG metadata-marker utilities: APPn/COM preservation and EXIF
orientation.

The reference drops all metadata on re-encode (its encoder writes a
fresh JFIF header, src/jpegcodec.cc:334-370); production transcode
pipelines usually need EXIF/ICC/XMP carried through, so the
transcode/transform APIs take a ``copyMarkers`` option implemented
here with jpegtran's ``-copy all`` semantics (libjpeg transupp.c):
COM and APP1..APP13/APP15 segments are copied verbatim, while APP0
(JFIF) and APP14 (Adobe) are left to the encoder, which writes its own
— copying the source's would duplicate or contradict them.

EXIF orientation (tag 0x0112) lives in an APP1 ``Exif\\0\\0`` segment
whose payload is a little TIFF stream — parsed with the TIFF codec's
own IFD machinery. The EXIF orientation enumeration is identical to
TIFF's (it IS TIFF tag 274).
"""
from __future__ import annotations

from typing import List, Optional

_SOI = b"\xff\xd8"


def iter_segments(buf: bytes):
    """Yield (marker_byte, start, total_len) for each marker segment
    between SOI and SOS/EOI. Tolerates fill bytes (0xFF padding).
    Stops at SOS (entropy data follows) or any malformed length."""
    n = len(buf)
    i = 2  # past SOI
    while i + 4 <= n:
        if buf[i] != 0xFF:
            return
        m = buf[i + 1]
        if m == 0xFF:  # fill byte
            i += 1
            continue
        if m in (0xD8, 0xD9, 0xDA) or 0xD0 <= m <= 0xD7:
            return  # SOI/EOI/SOS/RSTn: no further headers
        ln = (buf[i + 2] << 8) | buf[i + 3]
        if ln < 2 or i + 2 + ln > n:
            return
        yield m, i, 2 + ln
        i += 2 + ln


def copyable_markers(buf: bytes) -> List[bytes]:
    """Raw segment bytes (marker + length + payload) for every COM and
    APP1..APP13/APP15 segment — jpegtran -copy all, minus the APP0/
    APP14 the encoder owns."""
    out = []
    for m, start, total in iter_segments(bytes(buf)):
        if m == 0xFE or (0xE1 <= m <= 0xEF and m != 0xEE):
            out.append(bytes(buf[start:start + total]))
    return out


def splice_markers(out: bytes, segments: List[bytes]) -> bytes:
    """Insert marker segments into an encoded JPEG, after the segments
    the encoder wrote itself (APP0/APP14), before everything else."""
    if not segments:
        return out
    out = bytes(out)
    if not out.startswith(_SOI):
        return out
    pos = 2
    for m, start, total in iter_segments(out):
        if m in (0xE0, 0xEE):  # encoder-owned JFIF / Adobe headers
            pos = start + total
            continue
        break
    return out[:pos] + b"".join(segments) + out[pos:]


def _exif_payload(seg: bytes) -> Optional[bytes]:
    """APP1 segment bytes -> TIFF stream payload, or None."""
    if len(seg) >= 10 and seg[0] == 0xFF and seg[1] == 0xE1 \
            and seg[4:10] == b"Exif\x00\x00":
        return seg[10:]
    return None


def _find_orientation_entry(tiff: bytes) -> Optional[tuple]:
    """Walk IFD0 of an EXIF TIFF stream; return (value_offset, endian)
    for tag 0x0112 (SHORT), or None. Bounds-checked throughout —
    crafted EXIF must never raise out of here."""
    if len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        e = "little"
    elif tiff[:2] == b"MM":
        e = "big"
    else:
        return None

    def u16(o):
        return int.from_bytes(tiff[o:o + 2], e)

    def u32(o):
        return int.from_bytes(tiff[o:o + 4], e)

    if u16(2) != 42:
        return None
    ifd = u32(4)
    if ifd + 2 > len(tiff):
        return None
    count = u16(ifd)
    for k in range(count):
        entry = ifd + 2 + 12 * k
        if entry + 12 > len(tiff):
            return None
        if u16(entry) == 0x0112 and u16(entry + 2) == 3:  # SHORT
            return entry + 8, e
    return None


def exif_orientation(buf: bytes) -> Optional[int]:
    """The EXIF orientation (1-8) of a JPEG, or None when absent or
    unparseable."""
    for m, start, total in iter_segments(bytes(buf)):
        if m != 0xE1:
            continue
        tiff = _exif_payload(bytes(buf[start:start + total]))
        if tiff is None:
            continue
        found = _find_orientation_entry(tiff)
        if found is None:
            return None  # EXIF present, no orientation tag
        off, e = found
        v = int.from_bytes(tiff[off:off + 2], e)
        return v if 1 <= v <= 8 else None
    return None


def reset_exif_orientation(segments: List[bytes]) -> List[bytes]:
    """Copy of `segments` with any EXIF orientation tag rewritten to 1
    (upright) — required after a physical auto-orient, or viewers
    would apply the rotation twice."""
    out = []
    for seg in segments:
        tiff = _exif_payload(seg)
        if tiff is not None:
            found = _find_orientation_entry(tiff)
            if found is not None:
                off, e = found
                patched = bytearray(seg)
                patched[10 + off:10 + off + 2] = (1).to_bytes(2, e)
                out.append(bytes(patched))
                continue
        out.append(seg)
    return out


# EXIF orientation -> the lossless transform that makes it upright
# (same enumeration and normalisation as the TIFF codec's _orient /
# TIFFReadRGBAImageOriented)
ORIENT_OPS = {
    1: None,
    2: "fliph",
    3: "rot180",
    4: "flipv",
    5: "transpose",
    6: "rot90",
    7: "transverse",
    8: "rot270",
}
