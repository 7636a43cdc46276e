"""Pallas TPU kernel for the banded separable resize.

The XLA path (ops/resize.py) expresses the banded contraction as
vmap-gather + batched matmul, which materialises the gathered windows
in HBM. This kernel keeps a row-tile of the source resident in VMEM
and slices each output tile's input window with a scalar-prefetched
start index — one dot per (row-tile, output-tile) grid cell, windows
read straight from VMEM, no gather materialisation:

  grid = (R / TILE_R, T)           T = output tiles of TILE_O columns
  x:   (TILE_R, W_src)   VMEM      whole source row span per row-tile
  w:   (1, TILE_O, IN_LEN) VMEM    per-tile banded weight block
  out: (TILE_R, TILE_O)  VMEM      out = x[:, s_t : s_t+IN_LEN] @ w_t^T

Both spatial axes run through the same kernel via planar transposes
(resize is separable; reference algorithm resize.cc:66-134, weights
bit-identical to ops/resize.py).

Opt-in: resize_batch_pallas(...), or PICHA_RESIZE_IMPL=pallas makes
ops.resize use it for large images on TPU backends.
"""
from __future__ import annotations

import functools

import numpy as np

from .resize import banded_resize_plan, parse_resize_options

TILE_R = 256  # rows of the (R, W) matrix per grid cell
MAX_VMEM_SRC = 6 * 1024 * 1024  # keep x-block under ~6 MB of VMEM


@functools.lru_cache(maxsize=128)
def _hpass(src_size: int, dst_size: int, filter_name: str, fscale: float,
           interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # tile 128 (output lane width), starts lane-aligned for the in-kernel
    # dynamic slice; extra taps are exact zeros
    starts, weights, dst_pad = banded_resize_plan(
        dst_size, src_size, filter_name, fscale, tile=128, align=128)
    t_tiles, tile_o, in_len = weights.shape
    x_pad = max(src_size, int(starts.max()) + in_len)

    # keep the row-tile of the source within the VMEM budget
    tile_r = TILE_R
    while tile_r > 8 and tile_r * x_pad * 4 > MAX_VMEM_SRC:
        tile_r //= 2

    def kernel(starts_ref, x_ref, w_ref, o_ref):
        t = pl.program_id(1)
        s = pl.multiple_of(starts_ref[t], 128)
        xs = x_ref[:, pl.ds(s, in_len)]          # (TILE_R, in_len)
        w = w_ref[0]                              # (tile_o, in_len)
        o_ref[:, :] = jax.lax.dot_general(
            xs, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    in_specs = [
        pl.BlockSpec((tile_r, x_pad), lambda r, t, s: (r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_o, in_len), lambda r, t, s: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((tile_r, tile_o), lambda r, t, s: (r, t),
                             memory_space=pltpu.VMEM)

    @jax.jit
    def apply(x):  # x: (R, src_size) f32
        if x_pad != src_size:
            x = jnp.pad(x, ((0, 0), (0, x_pad - src_size)))
        r = x.shape[0]
        rp = -(-r // tile_r) * tile_r
        if rp != r:
            x = jnp.pad(x, ((0, rp - r), (0, 0)))
        r_tiles = x.shape[0] // tile_r
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r_tiles, t_tiles),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((x.shape[0], dst_pad), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(starts), x, jnp.asarray(weights))
        return out[:r, :dst_size]

    return apply


def _axis_pass(f, dst_size: int, filter_name: str, fscale: float,
               interpret: bool):
    """Apply the H-pass kernel to the last axis of (..., L) f32."""
    import jax.numpy as jnp

    src_size = f.shape[-1]
    lead = f.shape[:-1]
    r = int(np.prod(lead))
    x = f.reshape(r, src_size)
    out = _hpass(src_size, dst_size, filter_name, fscale, interpret)(x)
    return out.reshape(lead + (dst_size,))


def resize_batch_pallas(img, dst_w: int, dst_h: int,
                        filter: str | None = None,
                        filter_scale: float | None = None,
                        interpret: bool = False):
    """(N, H, W, C) uint8/uint16 -> resized, same dtype.

    Same numerics as ops.resize (identical weight tensors; dot order
    within a window may differ by float addition order, ≤1 LSB)."""
    import jax.numpy as jnp

    opts = {}
    if filter is not None:
        opts["filter"] = filter
    if filter_scale is not None:
        opts["filterScale"] = filter_scale
    name, fscale = parse_resize_options(opts)

    from ..pixels import jpack, junpack_f32

    f = junpack_f32(jnp.asarray(img))
    # planar: (N,H,W,C) -> (N,C,H,W); W pass; swap; H pass; back
    f = jnp.moveaxis(f, -1, 1)
    f = _axis_pass(f, dst_w, name, fscale, interpret)        # W resized
    f = jnp.swapaxes(f, -1, -2)                              # (N,C,W',H)
    f = _axis_pass(f, dst_h, name, fscale, interpret)        # H resized
    f = jnp.swapaxes(f, -1, -2)
    f = jnp.moveaxis(f, 1, -1)
    return jpack(f, np.dtype(img.dtype))
