"""TIFF codec — an independent implementation of TIFF 6.0.

The reference wrapped libtiff (src/tiffcodec.cc); this container
parser/writer is written from the spec because the image only ships
libtiff's .so without headers — and the pixel work lands in numpy/XLA
anyway. Behavioural parity targets:

  * decode always produces 'rgba' top-left oriented, like
    TIFFReadRGBAImageOriented(..., ORIENTATION_TOPLEFT)
    (tiffcodec.cc:130-137; README.md:158-159)
  * multi-page via ``opts['index']`` -> directory select
    (tiffcodec.cc:110-113, 189-195)
  * stat reports {width, height, pixel: 'rgba'} (tiffcodec.cc:254-274)
  * encode: all 8 pixel formats as contiguous scanlines,
    photometric = MINISBLACK (<3 samples) else RGB, compression
    'lzw' (default) / 'deflate' / 'none' (tiffcodec.cc:314-340,446)

Decoder support matrix: bilevel/gray 1/2/4/8/16-bit (both MinIsWhite
and MinIsBlack), RGB(A) 8/16-bit, palette, CMYK, separated planes,
strips and tiles, compressions none/LZW/PackBits/deflate/old-JPEG
(embedded interchange stream, the smallliz.tif case)/new-JPEG
(JPEGTables + per-strip streams), horizontal predictor, orientations
1-8. Entropy work (LZW, inflate, JPEG) is host-native; array
reassembly is numpy.
"""
from __future__ import annotations

import math
import struct
import zlib

import numpy as np

from ..errors import MALFORMED_EXCS, CodecError, InvalidOptionsError
from ..image import Image
from ..native import lib as native

# tag ids
T_WIDTH, T_HEIGHT, T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_FILLORDER, T_STRIP_OFFSETS, T_ORIENTATION, T_SPP, T_ROWS_PER_STRIP = 266, 273, 274, 277, 278
T_STRIP_COUNTS, T_PLANAR, T_PREDICTOR, T_COLORMAP, T_TILE_W = 279, 284, 317, 320, 322
T_TILE_H, T_TILE_OFFSETS, T_TILE_COUNTS, T_EXTRASAMPLES, T_SAMPLEFORMAT = 323, 324, 325, 338, 339
T_JPEG_TABLES, T_JPEG_IF, T_JPEG_IF_LEN, T_YCBCR_SUBSAMPLING = 347, 513, 514, 530

# compressions
C_NONE, C_CCITT, C_OLDJPEG, C_JPEG, C_ADEFLATE, C_PACKBITS = 1, 2, 6, 7, 8, 32773
C_LZW, C_DEFLATE = 5, 32946
C_G3, C_G4 = 3, 4
T_T4OPTIONS, T_T6OPTIONS = 292, 293

# FillOrder=2 stores bits lsb-first within each byte; libtiff reverses
# the raw segment bytes before decoding (TIFFReverseBits) and so do we
_BITREV = np.array([int(f"{i:08b}"[::-1], 2) for i in range(256)], np.uint8)

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


class _Ifd:
    __slots__ = ("tags",)

    def __init__(self):
        self.tags = {}

    def get(self, tag, default=None):
        v = self.tags.get(tag)
        if v is None:
            return default
        return v

    def one(self, tag, default=None):
        v = self.tags.get(tag)
        if v is None:
            return default
        return v[0] if isinstance(v, (list, tuple)) else v


def _parse_ifds(buf: bytes):
    if len(buf) < 8:
        raise CodecError("not a TIFF file")
    bom = buf[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise CodecError("not a TIFF file")
    magic, off = struct.unpack(e + "HI", buf[2:8])
    if magic != 42:
        raise CodecError("not a TIFF file")
    ifds = []
    seen = set()
    while off and off not in seen:
        seen.add(off)
        if off + 2 > len(buf):
            raise CodecError("truncated TIFF IFD")
        (n,) = struct.unpack_from(e + "H", buf, off)
        ifd = _Ifd()
        pos = off + 2
        if pos + n * 12 + 4 > len(buf):
            raise CodecError("truncated TIFF IFD")
        for _ in range(n):
            tag, typ, count = struct.unpack_from(e + "HHI", buf, pos)
            size = _TYPE_SIZES.get(typ, 1) * count
            if size <= 4:
                data = buf[pos + 8 : pos + 8 + size]
            else:
                (voff,) = struct.unpack_from(e + "I", buf, pos + 8)
                if voff + size > len(buf):
                    raise CodecError("truncated TIFF value")
                data = buf[voff : voff + size]
            if typ in _TYPE_FMT:
                vals = list(struct.unpack(e + _TYPE_FMT[typ] * count, data))
            elif typ == 5 or typ == 10:  # rational
                ints = struct.unpack(e + ("i" if typ == 10 else "I") * (2 * count), data)
                vals = [ints[2 * i] / (ints[2 * i + 1] or 1) for i in range(count)]
            else:
                vals = [data]
            ifd.tags[tag] = vals
            pos += 12
        (off,) = struct.unpack_from(e + "I", buf, pos)
        ifds.append(ifd)
    return e, ifds


def stat(buf: bytes):
    try:
        _, ifds = _parse_ifds(bytes(buf))
        if not ifds:
            return None
        ifd = ifds[0]
        w, h = ifd.one(T_WIDTH), ifd.one(T_HEIGHT)
        if not w or not h:
            return None
        # Deliberate deviation from libtiff: orientations 5-8 are fully
        # transposed by decode() (libtiff collapses them to 1-4 with a
        # warning, tif_getimage.c) — report the post-transpose dims so
        # stat and decode always agree on geometry.
        if int(ifd.one(T_ORIENTATION, 1)) in (5, 6, 7, 8):
            w, h = h, w
        return {"width": int(w), "height": int(h), "pixel": "rgba"}
    except (CodecError, *MALFORMED_EXCS):
        # corrupted tag tables can hand back bytes/garbage/empty lists
        # for numeric tags (fuzz-found); stat's contract is None, never
        # a raw leak
        return None


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decompress(data: bytes, comp: int, expected: int) -> bytes:
    if comp == C_NONE:
        return data
    if comp == C_LZW:
        return native.lzw_decode(data, expected)
    if comp in (C_ADEFLATE, C_DEFLATE):
        return native.zlib_inflate(data, expected)
    if comp == C_PACKBITS:
        return native.packbits_decode(data, expected)
    raise CodecError(f"unsupported TIFF compression {comp}")


def _undo_predictor(rows: np.ndarray, bits: int, spp: int) -> np.ndarray:
    """Horizontal differencing predictor (tag 317 == 2)."""
    h, rowbytes = rows.shape
    if bits == 8:
        arr = rows.reshape(h, rowbytes // spp, spp)
        return np.cumsum(arr, axis=1, dtype=np.uint8).reshape(h, rowbytes)
    if bits == 16:
        arr = rows.view(np.uint16).reshape(h, -1, spp)
        out = np.cumsum(arr, axis=1, dtype=np.uint16)
        return out.reshape(h, -1).view(np.uint8)
    raise CodecError("predictor unsupported for sub-byte samples")


def _expand_to_samples(rows: np.ndarray, width: int, spp: int,
                      bits: int) -> np.ndarray:
    """(h, rowbytes) -> (h, width, spp) uint8/uint16 raw sample values."""
    h = rows.shape[0]
    if bits == 8:
        return rows[:, : width * spp].reshape(h, width, spp)
    if bits == 16:
        return rows.view(np.uint16)[:, : width * spp].reshape(h, width, spp)
    per_byte = 8 // bits
    shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * bits
    mask = (1 << bits) - 1
    ex = (rows[:, :, None] >> shifts[None, None, :]) & mask
    return ex.reshape(h, -1)[:, : width * spp].reshape(h, width, spp)


def _rps(ifd: "_Ifd", height: int) -> int:
    """RowsPerStrip with crafted-value hardening: a zero/negative or
    signed-overflow value would make the strip loops run zero times and
    silently return a blank canvas (libtiff rejects such files)."""
    rps = int(ifd.one(T_ROWS_PER_STRIP, height)) or height
    if rps < 1:
        raise CodecError("bad TIFF RowsPerStrip")
    return rps


def _segments(ifd: _Ifd, endian, buf, width, height, spp, bits, comp,
              planar, predictor, fillorder=1):
    """Decode strips or tiles into a (height, width, spp) sample array."""
    bytedepth = 2 if bits == 16 else 1

    def seg_bytes(off, cnt):
        seg = buf[off : off + cnt]
        if fillorder == 2:
            seg = _BITREV[np.frombuffer(seg, np.uint8)].tobytes()
        return seg

    if comp in (C_CCITT, C_G3, C_G4):
        if T_TILE_OFFSETS in ifd.tags:
            raise CodecError("tiled fax TIFF unsupported")
        if bits != 1 or spp != 1:
            raise CodecError("CCITT fax TIFF must be 1-bit single-sample")
        offsets = ifd.get(T_STRIP_OFFSETS)
        counts = ifd.get(T_STRIP_COUNTS)
        if offsets is None or counts is None:
            raise CodecError("fax TIFF missing strip tables")
        rps = _rps(ifd, height)
        opts = int(ifd.one(T_T4OPTIONS if comp == C_G3 else T_T6OPTIONS, 0))
        out = np.zeros((height, width, 1), np.uint8)
        nstrips = math.ceil(height / rps)
        if len(offsets) < nstrips or len(counts) < nstrips:
            raise CodecError("TIFF strip tables too short")
        for s in range(nstrips):
            nrows = min(rps, height - s * rps)
            rows = native.fax_decode(seg_bytes(offsets[s], counts[s]),
                                     width, nrows, comp, opts)
            out[s * rps : s * rps + nrows, :, 0] = rows
        return out

    if T_TILE_OFFSETS in ifd.tags:
        tw, th = ifd.one(T_TILE_W), ifd.one(T_TILE_H)
        if not tw or not th or int(tw) <= 0 or int(th) <= 0:
            raise CodecError("TIFF tile dimensions missing or invalid")
        tw, th = int(tw), int(th)
        offsets = ifd.get(T_TILE_OFFSETS)
        counts = ifd.get(T_TILE_COUNTS)
        tiles_x = math.ceil(width / tw)
        tiles_y = math.ceil(height / th)
        planes = spp if planar == 2 else 1
        cpp = 1 if planar == 2 else spp
        rowbytes = (tw * cpp * bits + 7) // 8
        ntiles = planes * tiles_x * tiles_y
        if counts is None or offsets is None or \
                len(counts) < ntiles or len(offsets) < ntiles:
            raise CodecError("TIFF tile tables too short")
        out = np.zeros((height, width, spp),
                       dtype=np.uint16 if bits == 16 else np.uint8)
        i = 0
        for p in range(planes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    raw = _decompress(seg_bytes(offsets[i], counts[i]),
                                      comp, rowbytes * th)
                    i += 1
                    if len(raw) < rowbytes * th:
                        raise CodecError("TIFF tile too short")
                    rows = np.frombuffer(raw, np.uint8, rowbytes * th).reshape(
                        th, rowbytes).copy()
                    # byte order first, then predictor — the horizontal
                    # accumulator works on native-endian sample values
                    # (libtiff swabHorAcc16 ordering)
                    if endian == ">" and bits == 16:
                        rows = rows.reshape(th, -1, 2)[:, :, ::-1].reshape(th, -1)
                    if predictor == 2:
                        rows = _undo_predictor(rows, bits, cpp)
                    samples = _expand_to_samples(rows, tw, cpp, bits)
                    y0, x0 = ty * th, tx * tw
                    hh = min(th, height - y0)
                    ww = min(tw, width - x0)
                    if planar == 2:
                        out[y0:y0+hh, x0:x0+ww, p] = samples[:hh, :ww, 0]
                    else:
                        out[y0:y0+hh, x0:x0+ww] = samples[:hh, :ww]
        return out

    offsets = ifd.get(T_STRIP_OFFSETS)
    if offsets is None:
        raise CodecError("TIFF missing strip offsets")
    rps = _rps(ifd, height)
    counts = ifd.get(T_STRIP_COUNTS)
    strips_per_plane = math.ceil(height / rps)
    planes = spp if planar == 2 else 1
    cpp = 1 if planar == 2 else spp
    rowbytes = (width * cpp * bits + 7) // 8
    nstrips = planes * strips_per_plane
    if counts is None:
        # some writers omit StripByteCounts; only reconstructible for
        # uncompressed data (libtiff estimates the same way)
        if comp != C_NONE:
            raise CodecError("TIFF missing StripByteCounts")
        counts = [rowbytes * min(rps, height - s * rps)
                  for _ in range(planes) for s in range(strips_per_plane)]
    if len(counts) < nstrips or len(offsets) < nstrips:
        raise CodecError("TIFF strip tables too short")
    out = np.zeros((height, width, spp),
                   dtype=np.uint16 if bits == 16 else np.uint8)
    # LZW strips: one native call for all of them (per-call ctypes
    # overhead otherwise dominates small-strip files — ~50 us x strips)
    raws = None
    if (comp == C_LZW and fillorder == 1
            and all(0 <= offsets[i] and offsets[i] + counts[i] <= len(buf)
                    for i in range(nstrips))):
        caps = [rowbytes * min(rps, height - (i % strips_per_plane) * rps)
                for i in range(nstrips)]
        raws = native.lzw_decode_multi(
            buf, [offsets[i] for i in range(nstrips)],
            [counts[i] for i in range(nstrips)], caps)
    for p in range(planes):
        for s in range(strips_per_plane):
            i = p * strips_per_plane + s
            y0 = s * rps
            nrows = min(rps, height - y0)
            raw = raws[i] if raws is not None else _decompress(
                seg_bytes(offsets[i], counts[i]), comp, rowbytes * nrows)
            if len(raw) < rowbytes * nrows:
                raise CodecError("TIFF strip too short")
            rows = np.frombuffer(raw, np.uint8, rowbytes * nrows).reshape(
                nrows, rowbytes).copy()
            # byte order first, then predictor (see tile path)
            if endian == ">" and bits == 16:
                rows = rows.reshape(nrows, -1, 2)[:, :, ::-1].reshape(nrows, -1)
            if predictor == 2:
                rows = _undo_predictor(rows, bits, cpp)
            samples = _expand_to_samples(rows, width, cpp, bits)
            if planar == 2:
                out[y0:y0+nrows, :, p] = samples[:, :, 0]
            else:
                out[y0:y0+nrows] = samples
    return out


def _decode_ycbcr_subsampled(ifd: _Ifd, buf: bytes, width: int, height: int,
                             comp: int, subs, fillorder) -> np.ndarray:
    """Uncompressed/LZW/deflate subsampled YCbCr strips (TIFF 6.0 §21):
    each data unit is h*v Y samples then one Cb and one Cr; chroma
    upsamples by replication, as TIFFReadRGBAImage does."""
    try:
        hs, vs = int(subs[0]), int(subs[1])
    except (TypeError, ValueError) as e:
        raise CodecError("malformed YCbCrSubSampling tag") from e
    if hs not in (1, 2, 4) or vs not in (1, 2, 4):
        raise CodecError("bad YCbCr subsampling factors")
    offsets = ifd.get(T_STRIP_OFFSETS)
    counts = ifd.get(T_STRIP_COUNTS)
    if offsets is None or counts is None:
        raise CodecError("subsampled YCbCr TIFF missing strip tables")
    rps = _rps(ifd, height)
    rps = -(-rps // vs) * vs  # strips cover whole subsampling rows
    nstrips = math.ceil(height / rps)
    if len(offsets) < nstrips or len(counts) < nstrips:
        raise CodecError("TIFF strip tables too short")
    upr = -(-width // hs)  # units per row of units
    unit = hs * vs + 2
    out = np.zeros((nstrips * rps, upr * hs, 3), np.uint8)
    for s in range(nstrips):
        nrows = min(rps, height - s * rps)
        nur = -(-nrows // vs)
        expected = nur * upr * unit
        seg = buf[offsets[s] : offsets[s] + counts[s]]
        if fillorder == 2:
            seg = _BITREV[np.frombuffer(seg, np.uint8)].tobytes()
        raw = _decompress(seg, comp, expected)
        if len(raw) < expected:
            raise CodecError("YCbCr strip too short")
        units = np.frombuffer(raw, np.uint8, expected).reshape(nur, upr, unit)
        y = units[:, :, : hs * vs].reshape(nur, upr, vs, hs)
        y = y.transpose(0, 2, 1, 3).reshape(nur * vs, upr * hs)
        cb = units[:, :, hs * vs].repeat(vs, 0).repeat(hs, 1)
        cr = units[:, :, hs * vs + 1].repeat(vs, 0).repeat(hs, 1)
        y0 = s * rps
        rows = min(nur * vs, out.shape[0] - y0)
        out[y0 : y0 + rows, :, 0] = y[:rows]
        out[y0 : y0 + rows, :, 1] = cb[:rows]
        out[y0 : y0 + rows, :, 2] = cr[:rows]
    return out[:height, :width]


def _decode_jpeg_in_tiff(ifd: _Ifd, buf: bytes, width: int, height: int,
                         comp: int) -> np.ndarray:
    from . import jpeg as jpeg_codec

    if comp == C_OLDJPEG:
        off = ifd.one(T_JPEG_IF)
        length = ifd.one(T_JPEG_IF_LEN)
        if off is None:
            raise CodecError("old-style JPEG TIFF without interchange stream")
        if length is None or off + length > len(buf):
            length = len(buf) - off
        img = jpeg_codec.decode(buf[off : off + length], {})
        arr = img.to_array()
    else:  # C_JPEG: JPEGTables + per-strip streams
        tables = ifd.one(T_JPEG_TABLES)
        offsets = ifd.get(T_STRIP_OFFSETS)
        counts = ifd.get(T_STRIP_COUNTS)
        if offsets is None or counts is None:
            raise CodecError("JPEG-compressed TIFF missing strip tables")
        rps = _rps(ifd, height)
        parts = []
        for i, (o, c) in enumerate(zip(offsets, counts)):
            strip = buf[o : o + c]
            if tables is not None and len(tables) > 4:
                strip = b"\xff\xd8" + bytes(tables[2:-2]) + strip[2:]
            img = jpeg_codec.decode(strip, {})
            a = img.to_array()
            nrows = min(rps, height - i * rps)
            parts.append(a[:nrows])
        arr = np.concatenate(parts, axis=0)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr[:height, :width]


def _orient(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Normalise to top-left (TIFFReadRGBAImageOriented TOPLEFT)."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:
        return arr.transpose(1, 0, 2)
    if orientation == 6:
        return arr.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:
        return arr.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return arr.transpose(1, 0, 2)[::-1]
    return arr


def decode(buf: bytes, opts: dict) -> Image:
    buf = bytes(buf)
    endian, ifds = _parse_ifds(buf)
    idx = int(opts.get("index", 0))
    if idx < 0 or idx >= len(ifds):
        raise CodecError("invalid directory index")
    ifd = ifds[idx]

    # crafted files can carry the wrong tag TYPE (raw-bytes values);
    # coerce through CodecError instead of leaking ValueError/TypeError
    def itag(tag, default):
        try:
            return int(ifd.one(tag, default))
        except (TypeError, ValueError) as e:
            raise CodecError(f"malformed TIFF tag {tag}") from e

    width = itag(T_WIDTH, 0)
    height = itag(T_HEIGHT, 0)
    if width <= 0 or height <= 0:
        raise CodecError("bad TIFF dimensions")
    # same crafted-header cap as the PNG decoder: fail typed before any
    # size-derived allocation (a 60000x60000 claim over a 200-byte file
    # must not reach the canvas allocation)
    if width > 1_000_000 or height > 1_000_000 or width * height > 2**31:
        raise CodecError("TIFF dimensions exceed limit")
    spp = itag(T_SPP, 1)
    # bound samples too: a LONG SamplesPerPixel of 60000 over a tiny
    # file would otherwise pass the pixel cap yet drive a multi-GB
    # canvas allocation (width*height*spp*2 bytes)
    if spp <= 0 or width * height * spp > 2**31:
        raise CodecError("TIFF dimensions exceed limit")
    bits_list = ifd.get(T_BITS, [1])
    try:
        bits = int(bits_list[0])
    except (TypeError, ValueError) as e:
        raise CodecError("malformed TIFF BitsPerSample") from e
    if bits not in (1, 2, 4, 8, 16):
        # _expand_to_samples computes 8//bits (0 would divide-by-zero);
        # >16 has no sample dtype here (no float TIFF support)
        raise CodecError(f"unsupported TIFF BitsPerSample {bits}")
    comp = itag(T_COMPRESSION, C_NONE)
    fillorder = itag(T_FILLORDER, 1)
    photometric = itag(T_PHOTOMETRIC, 1)
    planar = itag(T_PLANAR, 1)
    predictor = itag(T_PREDICTOR, 1)
    if predictor not in (1, 2):
        # 3 = floating-point differencing (GDAL float TIFFs): silently
        # skipping the undo would return noise pixels; fail typed
        raise CodecError(f"unsupported TIFF predictor {predictor}")
    orientation = itag(T_ORIENTATION, 1)
    maxv = (1 << bits) - 1

    if comp in (C_OLDJPEG, C_JPEG):
        rgb = _decode_jpeg_in_tiff(ifd, buf, width, height, comp)
        alpha = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
        out = np.concatenate([rgb[..., :3], alpha], axis=-1)
        return Image.from_array(_orient(out, orientation), "rgba")

    subs = ifd.get(T_YCBCR_SUBSAMPLING, [2, 2]) if photometric == 6 else [1, 1]
    if photometric == 6 and list(subs)[:2] != [1, 1]:
        if bits != 8 or planar != 1:
            raise CodecError("subsampled YCbCr requires 8-bit contiguous data")
        samples = _decode_ycbcr_subsampled(ifd, buf, width, height, comp,
                                           subs, fillorder)
    else:
        samples = _segments(ifd, endian, buf, width, height, spp, bits, comp,
                            planar, predictor, fillorder)

    alpha = None
    extras = ifd.get(T_EXTRASAMPLES)

    def to8(x):
        if bits == 16:
            return (x >> 8).astype(np.uint8)
        if bits == 8:
            # already uint8 — callers concatenate/stack (which copies),
            # so no defensive copy here
            return x if x.dtype == np.uint8 else x.astype(np.uint8)
        return ((x.astype(np.uint16) * 255) // maxv).astype(np.uint8)

    if photometric == 2 and bits == 8 and spp == 4 \
            and samples.dtype == np.uint8:
        # common RGBA fast path: _segments already produced the exact
        # (h, w, 4) uint8 canvas — skip the slice/concat copies
        return Image.from_array(_orient(samples, orientation), "rgba")

    if photometric in (0, 1):  # grayscale
        grey = to8(samples[:, :, 0])
        if photometric == 0:
            grey = 255 - grey
        rgb = np.repeat(grey[:, :, None], 3, axis=-1)
        if spp > 1 and extras:
            alpha = to8(samples[:, :, 1])
    elif photometric == 2:  # RGB
        rgb = to8(samples[:, :, :3])
        if spp > 3:
            alpha = to8(samples[:, :, 3])
    elif photometric == 3:  # palette
        cmap = ifd.get(T_COLORMAP)
        if cmap is None:
            raise CodecError("palette TIFF missing colormap")
        n = len(cmap) // 3
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, n).T >> 8).astype(np.uint8)
        rgb = lut[samples[:, :, 0]]
    elif photometric == 5:  # CMYK (separated)
        c8 = to8(samples[:, :, :4])
        c, m, y_, k = (c8[..., i].astype(np.int32) for i in range(4))
        rgb = np.stack([(255 - c) * (255 - k) // 255,
                        (255 - m) * (255 - k) // 255,
                        (255 - y_) * (255 - k) // 255], axis=-1).astype(np.uint8)
        if spp > 4:
            alpha = to8(samples[:, :, 4])
    elif photometric == 6:  # YCbCr (non-JPEG)
        y = samples[:, :, 0].astype(np.int32)
        cb = samples[:, :, 1].astype(np.int32) - 128
        cr = samples[:, :, 2].astype(np.int32) - 128
        r = y + (91881 * cr + 32768 >> 16)
        g = y - ((22554 * cb + 46802 * cr + 32768) >> 16)
        b = y + (116130 * cb + 32768 >> 16)
        rgb = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
    else:
        raise CodecError(f"unsupported TIFF photometric {photometric}")

    if alpha is None:
        alpha = np.full((height, width), 255, np.uint8)
    out = np.concatenate([rgb, alpha[:, :, None]], axis=-1)
    return Image.from_array(_orient(out, orientation), "rgba")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

_COMP_OF = {"none": C_NONE, "lzw": C_LZW, "deflate": C_ADEFLATE}


def encode(img: Image, opts: dict) -> bytes:
    comp_name = opts.get("compression", "lzw")
    if comp_name not in _COMP_OF:
        raise InvalidOptionsError("invalid compression option")
    comp = _COMP_OF[comp_name]
    fmt = img.format
    arr = np.ascontiguousarray(img.to_array())
    h, w, spp = arr.shape
    bits = 16 if fmt.is_deep else 8
    raw = arr.tobytes()  # little-endian samples, matching the II header
    rowbytes = w * spp * (bits // 8)

    # 256 KiB strips (vs libtiff's classic 8 KiB): fewer per-strip
    # codec crossings on both sides and a warmer LZW dictionary;
    # readers accept any RowsPerStrip
    rps = max(1, min(h, 262144 // max(1, rowbytes)))
    nstrips = math.ceil(h / rps)
    strips = []
    for s in range(nstrips):
        chunk = raw[s * rps * rowbytes : min(h, (s + 1) * rps) * rowbytes]
        if comp == C_LZW:
            strips.append(native.lzw_encode(chunk))
        elif comp == C_ADEFLATE:
            strips.append(native.zlib_deflate(chunk, 6))
        else:
            strips.append(chunk)

    # layout: header | strip data | IFD | external values
    header = struct.pack("<2sHI", b"II", 42, 0)  # IFD offset patched below
    data_off = 8
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    # TIFF 6.0 requires the IFD (and value offsets) to begin on a word
    # boundary; LZW/deflate strips routinely have odd lengths. One pad
    # byte keeps strict readers (validators, some Windows components)
    # happy; our external value blocks are all even-sized so aligning
    # the IFD aligns them too.
    pad = pos & 1
    ifd_off = pos + pad

    entries = []
    external = b""

    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(T_WIDTH, 4, [w])
    add(T_HEIGHT, 4, [h])
    add(T_BITS, 3, [bits] * spp)
    add(T_COMPRESSION, 3, [comp])
    add(T_PHOTOMETRIC, 3, [1 if spp < 3 else 2])
    add(T_STRIP_OFFSETS, 4, offsets)
    add(T_ORIENTATION, 3, [1])
    add(T_SPP, 3, [spp])
    add(T_ROWS_PER_STRIP, 4, [rps])
    add(T_STRIP_COUNTS, 4, [len(s) for s in strips])
    add(T_PLANAR, 3, [1])
    if fmt.has_alpha:
        add(T_EXTRASAMPLES, 3, [2])  # unassociated alpha
    entries.sort(key=lambda x: x[0])

    ifd_size = 2 + len(entries) * 12 + 4
    ext_off = ifd_off + ifd_size
    body = struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        fmt_ch = _TYPE_FMT[typ]
        size = _TYPE_SIZES[typ] * len(vals)
        packed = struct.pack("<" + fmt_ch * len(vals), *vals)
        if size <= 4:
            body += struct.pack("<HHI", tag, typ, len(vals)) + packed.ljust(4, b"\0")
        else:
            body += struct.pack("<HHII", tag, typ, len(vals), ext_off + len(external))
            external += packed
    body += struct.pack("<I", 0)  # next IFD

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    for s in strips:
        out += s
    out += b"\0" * pad
    out += body
    out += external
    return bytes(out)


class TiffCodec:
    mimetype = "image/tiff"
    encodes = ["rgb", "rgba", "grey", "greya", "r16", "r16g16",
               "r16g16b16", "r16g16b16a16"]  # tiffcodec.cc:516-519

    @staticmethod
    def stat(buf):
        return stat(bytes(buf))

    @staticmethod
    def decode_sync(buf, opts):
        # the reference's setjmp trap converted ANY library abort into a
        # typed error (tiffcodec.cc:18-41); crafted tag tables can push
        # garbage through numpy/struct paths itag() doesn't cover, so
        # the boundary does the same conversion here
        try:
            return decode(buf, opts)
        except CodecError:
            raise
        except MALFORMED_EXCS as e:
            raise CodecError(f"malformed TIFF: {type(e).__name__}") from e

    @staticmethod
    def encode_sync(img, opts):
        return encode(img, opts)


CODEC = TiffCodec()
