"""Generic Pallas banded-matmul: y = x @ W^T for a block-banded W,
expressed as per-output-tile windowed dots with the source row-tile
resident in VMEM and window starts scalar-prefetched.

This is the kernel under both the Pallas resize path
(ops/resize_pallas.py) and the Pallas fused JPEG decode
(ops/jpeg_fused_pallas.py): any (dst, src) banded operator tiled by
resize.banded_plan_from_matrix(tile=128, align=128) runs through it.

  grid = (R / tile_r, T)
  x:   (tile_r, x_pad)      VMEM   full source span per row-tile
  w:   (1, 128, in_len)     VMEM   per-tile weight block
  out: (tile_r, 128)        VMEM   x[:, s_t : s_t+in_len] @ w_t^T
"""
from __future__ import annotations

import threading

import numpy as np

TILE_R = 256
MAX_VMEM_SRC = 6 * 1024 * 1024

_plans: dict = {}
_appliers: dict = {}
_lock = threading.Lock()


def register_plan(key: str, starts: np.ndarray, weights: np.ndarray,
                  dst_pad: int, dst_size: int) -> str:
    """Register a banded plan (from banded_plan_from_matrix with
    tile=128, align=128) under a unique key; returns the key."""
    with _lock:
        _plans[key] = (np.asarray(starts, np.int32),
                       np.asarray(weights, np.float32), int(dst_pad),
                       int(dst_size))
    return key


def ensure_plan(key: str, builder) -> str:
    """Idempotent registration: `builder()` must return
    (starts, weights, dst_pad, dst_size); built at most once per key."""
    with _lock:
        if key in _plans:
            return key
    starts, weights, dst_pad, dst_size = builder()
    return register_plan(key, starts, weights, dst_pad, dst_size)


def apply_banded(key: str, x, interpret: bool = False):
    """x: (R, src) float32 -> (R, dst_size) float32 via the plan."""
    fn = _get_applier(key, int(x.shape[-1]), bool(interpret))
    return fn(x)


def _get_applier(key: str, src_size: int, interpret: bool):
    ck = (key, src_size, interpret)
    with _lock:
        if ck in _appliers:
            return _appliers[ck]
    fn = _build(key, src_size, interpret)
    with _lock:
        _appliers[ck] = fn
    return fn


def _build(key: str, src_size: int, interpret: bool):
    import os

    if os.environ.get("PICHA_PALLAS_VARIANT", "grid2d") == "loop":
        return _build_loop(key, src_size, interpret)
    return _build_grid2d(key, src_size, interpret)


def _build_loop(key: str, src_size: int, interpret: bool):
    """1-D grid over row-tiles; the output-tile loop runs inside the
    kernel, so the source block is fetched once per row-tile and the
    full weight tensor stays resident."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    starts, weights, dst_pad, dst_size = _plans[key]
    t_tiles, tile_o, in_len = weights.shape
    x_pad = max(src_size, int(starts.max()) + in_len)

    budget = MAX_VMEM_SRC
    tile_r = TILE_R
    w_bytes = weights.size * 4
    while tile_r > 8 and tile_r * (x_pad + dst_pad) * 4 + w_bytes > budget:
        tile_r //= 2

    def kernel(starts_ref, x_ref, w_ref, o_ref):
        def body(t, carry):
            s = pl.multiple_of(starts_ref[t], 128)
            xs = x_ref[:, pl.ds(s, in_len)]
            w = w_ref[t]
            o_ref[:, pl.ds(t * tile_o, tile_o)] = jax.lax.dot_general(
                xs, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(0, t_tiles, body, 0)

    in_specs = [
        pl.BlockSpec((tile_r, x_pad), lambda r, s: (r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t_tiles, tile_o, in_len), lambda r, s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((tile_r, dst_pad), lambda r, s: (r, 0),
                             memory_space=pltpu.VMEM)

    @jax.jit
    def apply(x):
        if x_pad != src_size:
            x = jnp.pad(x, ((0, 0), (0, x_pad - src_size)))
        r = x.shape[0]
        rp = -(-r // tile_r) * tile_r
        if rp != r:
            x = jnp.pad(x, ((0, rp - r), (0, 0)))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(x.shape[0] // tile_r,),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",))
        out = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((x.shape[0], dst_pad), jnp.float32),
            interpret=interpret,
            **params,
        )(jnp.asarray(starts), x, jnp.asarray(weights))
        return out[:r, :dst_size]

    return apply


def _build_grid2d(key: str, src_size: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    starts, weights, dst_pad, dst_size = _plans[key]
    t_tiles, tile_o, in_len = weights.shape
    x_pad = max(src_size, int(starts.max()) + in_len)

    tile_r = TILE_R
    while tile_r > 8 and tile_r * x_pad * 4 > MAX_VMEM_SRC:
        tile_r //= 2

    import os

    use_bf16 = os.environ.get("PICHA_PALLAS_BF16", "0") != "0"

    def kernel(starts_ref, x_ref, w_ref, o_ref):
        t = pl.program_id(1)
        s = pl.multiple_of(starts_ref[t], 128)
        xs = x_ref[:, pl.ds(s, in_len)]
        w = w_ref[0]
        if use_bf16:
            # bf16 operands + f32 accumulate: the MXU fast path (same
            # numerics XLA uses for f32 matmuls at default precision)
            xs = xs.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
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
    def apply(x):
        if x_pad != src_size:
            x = jnp.pad(x, ((0, 0), (0, x_pad - src_size)))
        r = x.shape[0]
        rp = -(-r // tile_r) * tile_r
        if rp != r:
            x = jnp.pad(x, ((0, rp - r), (0, 0)))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(x.shape[0] // tile_r, t_tiles),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        params = {}
        if not interpret:
            # row-tiles are independent ("parallel"); output tiles
            # within a row-tile reuse the same x block ("arbitrary")
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
        out = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((x.shape[0], dst_pad), jnp.float32),
            interpret=interpret,
            **params,
        )(jnp.asarray(starts), x, jnp.asarray(weights))
        return out[:r, :dst_size]

    return apply
