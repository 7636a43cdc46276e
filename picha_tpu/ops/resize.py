"""Separable image resize, TPU-first.

The reference (src/resize.cc) streams rows through a float ring buffer,
applying per-output contribution windows precomputed by makeContribs
(resize.cc:19-50). On TPU the same math is a pair of dense matmuls with
banded weight matrices:

    tmp = Wh @ rows   (horizontal pass)     out = Wv @ tmp  (vertical)

which puts all the FLOPs on the MXU and lets XLA fuse unpack (u8->f32)
and pack (f32->u8, round-half-up) into the same kernel. Weight
construction reproduces resize.cc:19-50 numerics in float32, including:

  * output centres at (i + 0.5) * scale accumulated in float32
    (resize.cc:99,101 ``center += scale``)
  * window [ceil(c - fsupport), floor(c + fsupport)] clamped to the
    source, with exact-zero edge taps trimmed (resize.cc:29-34)
  * kernel widening on downscale: fscale = max(scale, 1, 1/support)
    (resize.cc:22,74-75)
  * per-window renormalisation to sum 1 (resize.cc:45-48)

Filter set and semantics (resize.cc:200-280):
  cubic (default, support 2), lanczos (lanczos-2), catmulrom & mitchel
  (Mitchell B/C family, B=C=0.333 for mitchel), box (support .5),
  triangle (support 1); all wrapped in ScaledFilter: support *= s,
  f(x) = base(x/s)/s.  filterScale default **0.70**; naming a filter
  explicitly resets it to 1.0 unless filterScale is also given
  (resize.cc:174, 179-198).
"""
from __future__ import annotations

import functools
import math

import numpy as np

from ..errors import InvalidImageError, InvalidOptionsError
from ..image import Image
from ..pixels import pixel_format

F32 = np.float32


# ---------------------------------------------------------------------------
# Filters (float32 scalar functions, reference resize.cc:200-260)
# ---------------------------------------------------------------------------

def _cubic(o):
    o = abs(o)
    return F32(1.0) - F32(o) * F32(o) * (F32(0.75) - F32(0.25) * F32(o))


def _triangle(o):
    return F32(1.0) - F32(abs(o))


def _box(o):
    return F32(1.0)


def _mitchell_family(B, C):
    B, C = F32(B), F32(C)
    A3 = F32((12 - 9 * B - 6 * C) / 6)
    A2 = F32((-18 + 12 * B + 6 * C) / 6)
    A0 = F32((6 - 2 * B) / 6)
    B3 = F32((-B - 6 * C) / 6)
    B2 = F32((6 * B + 30 * C) / 6)
    B1 = F32((-12 * B - 48 * C) / 6)
    B0 = F32((8 * B + 24 * C) / 6)

    def f(o):
        x = F32(abs(o))
        if x < 1:
            return F32(A0 + x * x * (A2 + x * A3))
        return F32(B0 + x * (B1 + x * (B2 + x * B3)))

    return f


def _lanczos2(o):
    x = F32(o) * F32(math.pi)
    x2 = F32(x * x)
    if x2 == 0:
        return F32(1.0)
    return F32(F32(2.0) * F32(math.sin(x)) * F32(math.sin(x / F32(2.0))) / x2)


FILTERS = {
    "cubic": (2.0, _cubic),
    "lanczos": (2.0, _lanczos2),
    "catmulrom": (2.0, _mitchell_family(0.0, 0.5)),
    "mitchel": (2.0, _mitchell_family(0.333, 0.333)),
    "box": (0.5, _box),
    "triangle": (1.0, _triangle),
}

DEFAULT_FILTER = "cubic"
DEFAULT_FILTER_SCALE = 0.70  # resize.cc:174


def parse_resize_options(opts: dict):
    """(filter, filterScale) with the reference's defaulting quirk
    (resize.cc:179-198): naming a filter resets scale to 1.0."""
    name = opts.get("filter")
    scale = DEFAULT_FILTER_SCALE
    if name is not None:
        scale = 1.0
        if name not in FILTERS:
            raise InvalidOptionsError("invalid filter mode")
    else:
        name = DEFAULT_FILTER
    fs = opts.get("filterScale", opts.get("filter_scale"))
    if fs is not None:
        fs = float(fs)
        if not (fs > 0) or math.isnan(fs):
            raise InvalidOptionsError("invalid filter width")
        scale = fs
    return name, scale


# ---------------------------------------------------------------------------
# Contribution weights -> dense (dst, src) float32 matrix
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=512)
def resize_weights(dst_size: int, src_size: int, filter_name: str,
                   filter_scale: float) -> np.ndarray:
    """Dense (dst_size, src_size) float32 contribution matrix, built with
    the reference's float32 arithmetic (resize.cc:19-50 + ScaledFilter
    resize.cc:262-268)."""
    base_support, base = FILTERS[filter_name]
    s = F32(filter_scale)
    support = F32(s * F32(base_support))

    def filt(x):
        return F32(base(F32(x) / s) / s)

    scale = F32(F32(src_size) / F32(dst_size))
    fscale = F32(max(max(scale, F32(1.0)), F32(F32(1.0) / support)))
    fsupport = F32(support * fscale)
    iscale = F32(F32(1.0) / fscale)

    W = np.zeros((dst_size, src_size), dtype=np.float32)
    center = F32(F32(0.5) * scale)
    for i in range(dst_size):
        left = int(max(F32(0.0), F32(math.ceil(center - fsupport))))
        right = int(min(F32(src_size - 1), F32(math.floor(center + fsupport))))
        while left < right and filt(F32(center - left) * iscale) == 0:
            left += 1
        while right > left and filt(F32(center - right) * iscale) == 0:
            right -= 1
        taps = np.arange(left, right + 1)
        w = np.array([filt(F32(center - F32(j)) * iscale) for j in taps],
                     dtype=np.float32)
        total = F32(w.sum(dtype=np.float32))
        if not total > 0:
            raise InvalidImageError("degenerate resize window")
        W[i, left:right + 1] = w * F32(F32(1.0) / total)
        center = F32(center + scale)
    return W


# ---------------------------------------------------------------------------
# JAX execution
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _jit_resize(dtype_name: str):
    import jax
    import jax.numpy as jnp

    from ..pixels import jpack, junpack_f32

    def fn(img, wh, wv):
        # img: (..., H, W, C) integer channels
        f = junpack_f32(img)
        # horizontal pass first, as the reference (resize.cc:103-119)
        tmp = jnp.einsum("ow,...hwc->...hoc", wh, f,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("oh,...hwc->...owc", wv, tmp,
                         preferred_element_type=jnp.float32)
        return jpack(out, np.dtype(dtype_name))

    return jax.jit(fn)


def resize_array(arr: np.ndarray, width: int, height: int,
                 filter: str = None, filter_scale: float = None):
    """(H, W, C) or (N, H, W, C) channel array -> resized array (same rank).

    Executes on the default JAX backend (TPU when present)."""
    opts = {}
    if filter is not None:
        opts["filter"] = filter
    if filter_scale is not None:
        opts["filterScale"] = filter_scale
    name, fscale = parse_resize_options(opts)
    src_h, src_w = arr.shape[-3], arr.shape[-2]
    wh = resize_weights(width, src_w, name, fscale)
    wv = resize_weights(height, src_h, name, fscale)
    out = _jit_resize(arr.dtype.name)(arr, wh, wv)
    return np.asarray(out)


def resize_image(img: Image, opts: dict) -> Image:
    """Image-level resize matching reference resize(Sync) semantics
    (resize.cc:321-403): output keeps the source pixel format."""
    width = int(opts.get("width", 0))
    height = int(opts.get("height", 0))
    if width <= 0 or height <= 0:
        raise InvalidOptionsError("invalid dimensions")
    if img.width <= 0 or img.height <= 0:
        raise InvalidImageError("invalid image")
    name, fscale = parse_resize_options(opts)
    arr = img.to_array()
    out = resize_array(arr, width, height, filter=name, filter_scale=fscale)
    return Image.from_array(out, img.pixel)
