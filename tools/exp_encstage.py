"""Encoder-stage primitives microbench (real chip).

Questions this answers (shapes = bench 16x960x544 encode):
  A) windowed ROW scatter-add (65-wide rows, non-overlapping, sorted)
     as a compaction replacement — do window scatters vectorize where
     scalar scatters serialize?
  B) same with OVERLAPPING rows (57-wide word rows, block boundaries
     share words) — the bit-assembly analog.
  C) dense-width 256-entry broadcast one-hot select vs
  D) dense-width scalar gather — the Huffman table lookup at dense
     (no-compaction) width.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_encstage.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

N_IMG = 16
NBLK = 12240                    # blocks per image at 960x544 4:2:0
NB = N_IMG * NBLK               # 195840
K = NBLK * 16                   # compact slots per image
DENSE = NBLK * 65               # dense slots per image
NWORDS = 65536 + 2


def log(*a):
    print(*a, flush=True)


def time_fn(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt * 1e3:.2f} ms")
    return dt


def row_scatter(operand_len, starts, upd):
    W = upd.shape[1]

    def f(ops):
        st, up = ops
        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        return lax.scatter_add(
            jnp.zeros(operand_len + W, jnp.int32), st[:, None], up,
            dnums, indices_are_sorted=True, unique_indices=False,
            mode=lax.GatherScatterMode.CLIP)

    return f


def main():
    rng = np.random.default_rng(0)
    log("devices:", jax.devices())
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))

    # A) non-overlapping sorted 65-wide rows (compaction analog)
    counts = rng.integers(4, 17, size=NB)
    starts_a = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    upd_a = rng.integers(0, 1 << 20, size=(NB, 65), dtype=np.int32)
    fa = jax.jit(row_scatter(N_IMG * K, starts_a, upd_a))
    da, ua = jax.device_put(starts_a), jax.device_put(upd_a)
    time_fn("A) row scatter 65w non-overlap", fa, (da, ua))

    # B) overlapping 57-wide word rows (bit assembly analog): adjacent
    # block word-starts ~13 words apart -> ~4x overlap
    wstarts = np.cumsum(rng.integers(6, 20, size=NB)).astype(np.int32)
    upd_b = rng.integers(0, 1 << 20, size=(NB, 57), dtype=np.int32)
    fb = jax.jit(row_scatter(N_IMG * NWORDS, wstarts, upd_b))
    db, ub = jax.device_put(wstarts), jax.device_put(upd_b)
    time_fn("B) row scatter 57w overlapping", fb, (db, ub))

    # C/D) table lookup at dense width
    sym = rng.integers(0, 256, size=(N_IMG, DENSE), dtype=np.int32)
    row = rng.integers(0, 4, size=(N_IMG, DENSE), dtype=np.int32)
    table = rng.integers(0, 1 << 21, size=(4, 256), dtype=np.int32)
    d_sym, d_row = jax.device_put(sym), jax.device_put(row)

    @jax.jit
    def lookup_gather(s, r):
        return jnp.asarray(table)[r, s].sum()

    @jax.jit
    def lookup_onehot(s, r):
        t = jnp.asarray(table)
        tsel = jnp.where(r[:, :, None] >= 2,
                         jnp.where((r[:, :, None] & 1) == 1, t[3], t[2]),
                         jnp.where((r[:, :, None] & 1) == 1, t[1], t[0]))
        oh = s[:, :, None] == jnp.arange(256)[None, None, :]
        return jnp.sum(jnp.where(oh, tsel, 0), axis=2).sum()

    @jax.jit
    def lookup_bitselect(s, r):
        # 8-level binary selection tree over the 256-entry axis
        t = jnp.asarray(table)
        tsel = jnp.where(r[:, :, None] >= 2,
                         jnp.where((r[:, :, None] & 1) == 1, t[3], t[2]),
                         jnp.where((r[:, :, None] & 1) == 1, t[1], t[0]))
        cur = tsel  # (N, DENSE, 256)
        width = 256
        for bit in range(7, -1, -1):
            half = width // 2
            take_hi = ((s >> bit) & 1)[:, :, None].astype(bool)
            cur = jnp.where(take_hi, cur[:, :, half:width],
                            cur[:, :, 0:half])
            width = half
        return cur[:, :, 0].sum()

    time_fn("D) dense gather (4,256)", lookup_gather, d_sym, d_row)
    time_fn("C) dense one-hot select 256", lookup_onehot, d_sym, d_row)
    time_fn("E) dense bit-select tree", lookup_bitselect, d_sym, d_row)


if __name__ == "__main__":
    main()
