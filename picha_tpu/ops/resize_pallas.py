"""Pallas TPU path for the banded separable resize.

The XLA path (ops/resize.py) expresses the banded contraction as
vmap-gather + batched matmul, which materialises the gathered windows
in HBM. The Pallas path (shared kernel in ops/banded_pallas.py) keeps
a row-tile of the source resident in VMEM and slices each output
tile's window with a scalar-prefetched start index — no gather
materialisation. Both spatial axes run through the same kernel via
planar transposes (resize is separable; reference algorithm
resize.cc:66-134, weights bit-identical to ops/resize.py).

Opt-in: resize_batch_pallas(...), or PICHA_RESIZE_IMPL=pallas makes
ops.resize use it for large images on TPU backends.
"""
from __future__ import annotations

import numpy as np

from .banded_pallas import apply_banded, ensure_plan
from .resize import banded_resize_plan, parse_resize_options


def _plan_key(src_size: int, dst_size: int, name: str, fscale: float) -> str:
    def build():
        starts, weights, dst_pad = banded_resize_plan(
            dst_size, src_size, name, fscale, tile=128, align=128)
        return starts, weights, dst_pad, dst_size

    return ensure_plan(f"resize:{src_size}:{dst_size}:{name}:{fscale}", build)


def _axis_pass(f, dst_size: int, name: str, fscale: float, interpret: bool):
    """Resize the last axis of a float32 (..., L) tensor."""
    src_size = f.shape[-1]
    lead = f.shape[:-1]
    r = int(np.prod(lead))
    key = _plan_key(src_size, dst_size, name, fscale)
    out = apply_banded(key, f.reshape(r, src_size), interpret)
    return out.reshape(lead + (dst_size,))


def resize_batch_pallas(img, dst_w: int, dst_h: int,
                        filter: str | None = None,
                        filter_scale: float | None = None,
                        interpret: bool = False):
    """(N, H, W, C) uint8/uint16 -> resized, same dtype.

    Same numerics as ops.resize (identical weight tensors; dot order
    within a window may differ by float addition order, ≤1 LSB)."""
    import jax.numpy as jnp

    from ..pixels import jpack, junpack_f32

    opts = {}
    if filter is not None:
        opts["filter"] = filter
    if filter_scale is not None:
        opts["filterScale"] = filter_scale
    name, fscale = parse_resize_options(opts)

    f = junpack_f32(jnp.asarray(img))
    # planar: (N,H,W,C) -> (N,C,H,W); W pass; swap; H pass; back
    f = jnp.moveaxis(f, -1, 1)
    f = _axis_pass(f, dst_w, name, fscale, interpret)        # W resized
    f = jnp.swapaxes(f, -1, -2)                              # (N,C,W',H)
    f = _axis_pass(f, dst_h, name, fscale, interpret)        # H resized
    f = jnp.swapaxes(f, -1, -2)
    f = jnp.moveaxis(f, 1, -1)
    return jpack(f, np.dtype(img.dtype))
