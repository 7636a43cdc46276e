"""Pallas fused JPEG decode+resize: the banded fold on the MXU without
gather materialisation.

The XLA fused path (ops/jpeg_fused.py) runs dense (dst, src)-sized
contractions — ~80% of f32 MXU peak but 7x more FLOPs than the band
needs; its banded XLA variant loses to HBM gather traffic (see
docs/PERFORMANCE.md). This path expresses each folded operator
T (dst, blocks*8) as a block-banded matrix and runs it through the
shared Pallas banded-matmul (ops/banded_pallas.py): per output tile,
one windowed dot against the VMEM-resident coefficient row-tile.

Data flow per component (all on device):

  cq (n, bh, bw, v, u) f32 --transpose--> (n, bh, v, bw*8)
     --banded H fold-->      (n, bh, v, out_w)
     --transpose-->          (n, out_w, bh*8)
     --banded V fold-->      (n, out_w, out_h) --> +128, colour, pack

Numerics identical to the XLA fused path (same folded T matrices;
window tails are exact zeros).
"""
from __future__ import annotations

import numpy as np

from .banded_pallas import apply_banded, ensure_plan
from .jpeg_fused import component_weights
from .resize import banded_plan_from_matrix


def _fold_key(dst_size: int, full_size: int, comp_size: int, factor: int,
              filter_name: str, fscale: float) -> str:
    def build():
        T = component_weights(dst_size, full_size, comp_size, factor,
                              filter_name, fscale)  # (dst, blocks, 8)
        W = T.reshape(T.shape[0], -1)  # flat K = blocks*8
        starts, weights, dst_pad = banded_plan_from_matrix(W, tile=128,
                                                           align=128)
        return starts, weights, dst_pad, dst_size

    return ensure_plan(
        f"jfold:{dst_size}:{full_size}:{comp_size}:{factor}:"
        f"{filter_name}:{fscale}", build)


def fused_component_pallas(coefs, qtable, geom, interpret: bool = False):
    """coefs (N, bh, bw, 64) int16, qtable (N,1,1,64) -> (N, oy, ox) f32
    (level-shifted, unclamped). Same geom tuple as
    jpeg_fused.fused_component."""
    import jax.numpy as jnp

    (out_w, out_h, width, height, dw, dh, fx, fy, filter_name,
     fscale) = geom
    cq = coefs.astype(jnp.float32) * qtable.astype(jnp.float32)
    n, bh, bw = cq.shape[0], cq.shape[1], cq.shape[2]
    cq = cq.reshape(n, bh, bw, 8, 8)          # [v, u]
    x = jnp.swapaxes(cq, 2, 3)                # (n, bh, v, bw, u)
    x = x.reshape(n, bh, 8, bw * 8)

    hkey = _fold_key(out_w, width, dw, fx, filter_name, fscale)
    tmp = apply_banded(hkey, x.reshape(-1, bw * 8), interpret)
    tmp = tmp.reshape(n, bh, 8, out_w)        # (n, bh, v, out_w)

    # V fold consumes (bh, v) flattened as K = bh*8
    xt = jnp.moveaxis(tmp, 3, 1)              # (n, out_w, bh, v)
    xt = xt.reshape(n, out_w, bh * 8)
    vkey = _fold_key(out_h, height, dh, fy, filter_name, fscale)
    out = apply_banded(vkey, xt.reshape(-1, bh * 8), interpret)
    out = out.reshape(n, out_w, out_h)
    return jnp.swapaxes(out, 1, 2) + 128.0    # (n, out_h, out_w)


def fused_decode_resize_pallas(comp_sig, color_space, width, height,
                               out_w, out_h, filter_name, fscale,
                               coefs, qtabs, interpret: bool = False):
    """Pallas-kernel twin of jpeg_fused.fused_decode_resize."""
    import jax.numpy as jnp

    from . import jpeg_fused as jf

    max_h = max(s[2] for s in comp_sig)
    max_v = max(s[3] for s in comp_sig)
    planes = []
    for i, (bh, bw, hs, vs) in enumerate(comp_sig):
        dw = -(-width * hs // max_h)
        dh = -(-height * vs // max_v)
        geom = (out_w, out_h, width, height, dw, dh,
                max_h // hs, max_v // vs, filter_name, fscale)
        planes.append(fused_component_pallas(coefs[i], qtabs[i], geom,
                                             interpret))

    if color_space == jf.CS_GRAYSCALE or len(planes) == 1:
        return planes[0][..., None]
    if color_space == jf.CS_RGB:
        return jnp.stack(planes[:3], axis=-1)

    def ycc_to_rgb(y, cb, cr):
        cbs = cb - 128.0
        crs = cr - 128.0
        r = y + 1.40200 * crs
        g = y - 0.34414 * cbs - 0.71414 * crs
        b = y + 1.77200 * cbs
        return jnp.stack([r, g, b], axis=-1)

    if color_space == jf.CS_YCBCR:
        return ycc_to_rgb(planes[0], planes[1], planes[2])
    if color_space == jf.CS_YCCK:
        cmy = 255.0 - jnp.clip(
            ycc_to_rgb(planes[0], planes[1], planes[2]), 0.0, 255.0)
        k = jnp.clip(planes[3], 0.0, 255.0)
        return cmy * k[..., None] * (1.0 / 255.0)
    if color_space == jf.CS_CMYK:
        cmy = jnp.stack(planes[:3], axis=-1)
        k = planes[3]
        return (jnp.clip(cmy, 0.0, 255.0)
                * jnp.clip(k, 0.0, 255.0)[..., None] * (1.0 / 255.0))
    raise ValueError(f"unsupported colour space {color_space}")
