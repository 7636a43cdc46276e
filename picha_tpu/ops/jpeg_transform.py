"""Lossless coefficient-domain JPEG transforms (the jpegtran feature
class): transpose, horizontal/vertical flip, rot90/180/270 without
dequantisation — the quantised DCT coefficients are rearranged, never
recomputed, so pixel content is preserved exactly and only the entropy
coding is regenerated.

The reference has no equivalent (its jpegcodec.cc:100-106 always
decodes to pixels); this falls out of the rebuild's coefficient
infrastructure: host entropy decode (native.jpeg_coefficients, which
uses the segment-parallel decoder when it can) -> block-domain numpy
ops here -> coefficient re-encode (native.jpeg_coef_write).

Math, for an 8x8 DCT block C[i, j] (i = vertical frequency, j =
horizontal; natural order index i*8+j):
  * transposing the pixels transposes each block AND the block grid
    AND the sampling factors (the 2-D DCT basis is symmetric);
  * mirroring pixels horizontally reverses the block COLUMNS and
    negates odd horizontal frequencies — the basis satisfies
    phi_j(7-x) = (-1)^j phi_j(x); vertical mirroring likewise on i.

Edge semantics follow jpegtran's default trim: a flip needs full
blocks on the reversed axis (partial edge blocks hold pixels past the
image that a mirror would surface), so the image is first trimmed to
the iMCU grid on that axis; `perfect=True` raises instead of
trimming. transpose is always perfect; rot90/270 inherit the trim
from their flip leg (on the transposed geometry, i.e. the ORIGINAL
height — jpegtran's rule).
"""
from __future__ import annotations

import numpy as np

from ..errors import CodecError, InvalidOptionsError

# natural-order permutation of a block transpose: i*8+j -> j*8+i
_TRANS = np.arange(64).reshape(8, 8).T.reshape(-1).copy()
# (-1)^j / (-1)^i per natural coefficient index
_SIGN_H = np.where(np.arange(64) % 8 % 2 == 1, -1, 1).astype(np.int16)
_SIGN_V = np.where(np.arange(64) // 8 % 2 == 1, -1, 1).astype(np.int16)

# each op as a sequence of primitives (t = transpose, h/v = mirrors)
OPS = {
    "transpose": ("t",),
    "fliph": ("h",),
    "flipv": ("v",),
    "rot90": ("t", "h"),    # clockwise
    "rot180": ("h", "v"),
    "rot270": ("t", "v"),   # counter-clockwise
    "transverse": ("t", "h", "v"),  # anti-diagonal mirror (jpegtran)
}


def _trim(width, comps, axis, op, perfect):
    """Trim `width` (extent along `axis`: 0 horizontal, 1 vertical) to
    the iMCU grid so every stored block on that axis is full."""
    key = "h_samp" if axis == 0 else "v_samp"
    m = 8 * max(c[key] for c in comps)
    new = width - width % m
    if new == width:
        return width
    if perfect:
        raise InvalidOptionsError(
            f"{op} is not perfect for these dimensions: extent {width} "
            f"is not a multiple of the {m}-pixel iMCU size "
            f"(trim would drop {width - new} pixels)")
    if new == 0:
        raise CodecError("image smaller than one iMCU; cannot trim for flip")
    return new


def _normalized_comps(co):
    """Shared load step: copy the component dicts with int16/uint16
    arrays; single-component scans get their sampling factors
    normalized to 1x1 (MCU = 1 block regardless of the declared
    factors, so the iMCU granule is 8, not 8*samp — same rule as the
    scan parser)."""
    return [{
        "h_samp": 1 if co.ncomp == 1 else c["h_samp"],
        "v_samp": 1 if co.ncomp == 1 else c["v_samp"],
        "coefs": np.asarray(c["coefs"], np.int16),
        "qtable": np.asarray(c["qtable"], np.uint16),
    } for c in co.comps]


def crop_coefficients(co, x: int, y: int, w: int, h: int,
                      perfect: bool = False):
    """Lossless coefficient-domain crop (jpegtran -crop semantics):
    the origin snaps DOWN to the nearest iMCU boundary and the size
    GROWS by the snap remainder, so the requested region stays covered
    (jpegtran transupp.c jtransform_request_workspace); `perfect=True`
    raises instead of snapping. The right/bottom edges may fall
    mid-block — the partial blocks are kept and the declared
    dimensions do the clipping, exactly like any non-multiple-of-8
    JPEG. DC stays absolute here; the re-encoder re-differences.

    Returns (w, h, comps) for native.jpeg_coef_write."""
    if co.ncomp not in (1, 3):
        raise CodecError("lossless crop supports 1- or 3-component JPEGs")
    if w < 1 or h < 1 or x < 0 or y < 0 or x + w > co.width \
            or y + h > co.height:
        raise InvalidOptionsError(
            f"crop {w}x{h}+{x}+{y} outside {co.width}x{co.height}")
    comps = _normalized_comps(co)
    hmax = max(c["h_samp"] for c in comps)
    vmax = max(c["v_samp"] for c in comps)
    x0, y0 = x - x % (8 * hmax), y - y % (8 * vmax)
    if perfect and (x0 != x or y0 != y):
        raise InvalidOptionsError(
            f"crop origin ({x},{y}) is not on the {8 * hmax}x{8 * vmax} "
            f"iMCU grid (snap would move it to ({x0},{y0}))")
    w, h = w + (x - x0), h + (y - y0)  # keep the requested region covered
    for c in comps:
        hs, vs = c["h_samp"], c["v_samp"]
        bx, by = x0 * hs // (hmax * 8), y0 * vs // (vmax * 8)
        dw = -(-w * hs // hmax)   # component-pixel extents (ceil)
        dh = -(-h * vs // vmax)
        nbw = -(-dw // 8)
        nbh = -(-dh // 8)
        c["coefs"] = np.ascontiguousarray(
            c["coefs"][by:by + nbh, bx:bx + nbw])
    return w, h, comps


def transform_coefficients(co, op: str, perfect: bool = False):
    """co: JpegCoefficients-like (width, height, ncomp, comps dicts).
    Returns (width, height, comps) ready for native.jpeg_coef_write."""
    if op not in OPS:
        raise InvalidOptionsError(
            f"unknown transform op {op!r}; one of {sorted(OPS)}")
    if co.ncomp not in (1, 3):
        raise CodecError(
            "lossless transform supports 1- or 3-component JPEGs")
    width, height = co.width, co.height
    comps = _normalized_comps(co)
    for prim in OPS[op]:
        if prim == "t":
            width, height = height, width
            for c in comps:
                c["coefs"] = np.ascontiguousarray(
                    c["coefs"].transpose(1, 0, 2)[:, :, _TRANS])
                c["qtable"] = np.ascontiguousarray(c["qtable"][_TRANS])
                c["h_samp"], c["v_samp"] = c["v_samp"], c["h_samp"]
        elif prim == "h":
            width = _trim(width, comps, 0, op, perfect)
            hmax = max(c["h_samp"] for c in comps)
            for c in comps:
                bw = width * c["h_samp"] // (hmax * 8)
                c["coefs"] = np.ascontiguousarray(
                    c["coefs"][:, :bw][:, ::-1] * _SIGN_H)
        else:  # "v"
            height = _trim(height, comps, 1, op, perfect)
            vmax = max(c["v_samp"] for c in comps)
            for c in comps:
                bh = height * c["v_samp"] // (vmax * 8)
                c["coefs"] = np.ascontiguousarray(
                    c["coefs"][:bh][::-1] * _SIGN_V)
    return width, height, comps
