"""Densification experiments for the decoder's emission scatter.

The r4 ablation (tools/profile_decode2.py) pinned 270 ms of the 410 ms
device decode on the single 30M-element sorted scalar scatter-add that
turns per-lane (index, value) emission streams into dense coefficient
planes. Variants timed here at the exact bench static key:

  a) current:   flat sorted scatter-add into (nblk_total*64,)
  b) unique:    same but padding rows get UNIQUE trash indices so the
                scatter can also promise unique_indices=True
  c) matmul:    factor local index = blk_slot*64 + coef; densify with a
                per-lane one-hot batched matmul (MXU), then place lane
                blocks globally with a 64-wide-slice row gather.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_scatter.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

L, S = 16384, 1856            # lanes, emission rows (bench static key)
NBLKMAX = 48                  # blocks per lane (DRI=8 x B=6)
N_IMG, NBLK_IMG = 16, 48960
NBLK_TOTAL = N_IMG * NBLK_IMG  # 783360 = L(-pad) * NBLKMAX
N_CHUNKS = 8


def log(*a):
    print(*a, flush=True)


def make_synthetic(rng):
    """Realistic emission streams: ~700 sorted local emissions per lane
    (DC + value-carrying ACs at q85 density), zero-value padding."""
    n_real = rng.integers(500, 900, size=L)
    buf_loc = np.zeros((L, S), np.int32)
    buf_v = np.zeros((L, S), np.int32)
    for l in range(L):
        k = int(n_real[l])
        idx = np.sort(rng.choice(NBLKMAX * 64, size=k, replace=False))
        buf_loc[l, :k] = idx
        buf_loc[l, k:] = idx[-1]
        buf_v[l, :k] = rng.integers(-128, 128, size=k)
    return buf_loc, buf_v


def time_fn(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt * 1e3:.1f} ms")
    return out, dt


def main():
    rng = np.random.default_rng(0)
    buf_loc, buf_v = make_synthetic(rng)
    # lane -> global block base (lane-major contiguous tiling)
    lane_base = (np.arange(L, dtype=np.int64) * NBLKMAX)
    lane_base = np.minimum(lane_base, NBLK_TOTAL).astype(np.int32)
    flat_i = (buf_loc.astype(np.int64)
              + lane_base[:, None].astype(np.int64) * 64)
    flat_i = np.minimum(flat_i, NBLK_TOTAL * 64).astype(np.int32)
    d_flat_i = jax.device_put(flat_i.reshape(-1))
    d_flat_v = jax.device_put(buf_v.reshape(-1))
    d_loc = jax.device_put(buf_loc)
    d_v = jax.device_put(buf_v)
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))  # warm

    @jax.jit
    def variant_a(fi, fv):
        out = jnp.zeros(NBLK_TOTAL * 64 + 64, jnp.int32)
        out = out.at[fi].add(fv, indices_are_sorted=True)
        return out[: NBLK_TOTAL * 64].sum()

    # b) unique indices: padding rows -> unique trash slots after the
    # real range (lane-major so still globally sorted)
    n_real = (buf_v != 0).sum(axis=1)  # approx: first zero-run treated real
    trash = (NBLK_TOTAL * 64
             + np.arange(L, dtype=np.int64)[:, None] * S
             + np.arange(S, dtype=np.int64)[None, :])
    is_pad = np.zeros((L, S), bool)
    for l in range(L):
        k = int(n_real[l])
        is_pad[l, k:] = True
    flat_iu = np.where(is_pad, trash, flat_i.astype(np.int64))
    d_flat_iu = jax.device_put(flat_iu.reshape(-1).astype(np.int32))

    @jax.jit
    def variant_b(fi, fv):
        out = jnp.zeros(NBLK_TOTAL * 64 + L * S, jnp.int32)
        out = out.at[fi].add(fv, indices_are_sorted=True,
                             unique_indices=True)
        return out[: NBLK_TOTAL * 64].sum()

    # c) matmul densification
    blk2lane = np.repeat(np.arange(L, dtype=np.int32), NBLKMAX)
    blk2lane = blk2lane[:NBLK_TOTAL]
    blk2loc = np.tile(np.arange(NBLKMAX, dtype=np.int32), L)[:NBLK_TOTAL]
    d_b2l = jax.device_put(blk2lane)
    d_b2c = jax.device_put(blk2loc)

    @jax.jit
    def variant_c(loc, v, b2l, b2c):
        hi = (loc >> 6).astype(jnp.int32)            # (L, S) block slot
        lo = (loc & 63).astype(jnp.int32)            # (L, S) coef
        CH = L // N_CHUNKS

        def one_chunk(args):
            hi_c, lo_c, v_c = args                    # (CH, S)
            hv = (v_c.astype(jnp.float32)[:, :, None]
                  * (hi_c[:, :, None]
                     == jnp.arange(NBLKMAX)[None, None, :]))
            ln = (lo_c[:, :, None]
                  == jnp.arange(64)[None, None, :]).astype(jnp.float32)
            return jnp.einsum("lsb,lsc->lbc", hv, ln,
                              preferred_element_type=jnp.float32)

        loc3 = jax.lax.map(one_chunk,
                           (hi.reshape(N_CHUNKS, CH, S),
                            lo.reshape(N_CHUNKS, CH, S),
                            v.reshape(N_CHUNKS, CH, S)))
        loc3 = loc3.reshape(L, NBLKMAX, 64)
        out = loc3[b2l, b2c].astype(jnp.int32)       # (NBLK_TOTAL, 64)
        return out.sum()

    ra, _ = time_fn("a) sorted scatter  ", variant_a, d_flat_i, d_flat_v)
    rb, _ = time_fn("b) unique scatter  ", variant_b, d_flat_iu, d_flat_v)
    rc, _ = time_fn("c) matmul densify  ", variant_c, d_loc, d_v,
                    d_b2l, d_b2c)
    log("checksums:", int(ra), int(rb), int(rc))


if __name__ == "__main__":
    main()
