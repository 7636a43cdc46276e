"""Device-stage profiler for the TPU entropy coders (round 4).

Decomposes the device-only roofline (BENCH: scan -> TPU Huffman decode
-> fused -> TPU Huffman encode) into per-stage and per-component costs
on the REAL chip, at the exact bench shapes (16x1080p q85, restart=8).
Everything prints progressively (the tunnel can die mid-run).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_device.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import importlib.util

_spec = importlib.util.spec_from_file_location("benchmod", "/root/repo/bench.py")
benchmod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(benchmod)

import jax
import jax.numpy as jnp

from picha_tpu.native import lib as native
from picha_tpu.pipeline import JpegBatchPipeline
from picha_tpu.ops.jpeg_huffman_decode_tpu import (
    build_decoder_core, build_wire_unpack)

BATCH, W, H, OW, OH = 16, 1920, 1088, 960, 544
MPIX = W * H / 1e6


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, iters=4, readback=lambda r: np.asarray(r)):
    """Sequential dispatch + dependent readback (block_until_ready is
    unreliable on this platform). Returns seconds per iter."""
    r = fn(0)
    readback(r)  # warm (compile) + force
    t0 = time.perf_counter()
    rs = [fn(1 + i) for i in range(iters)]
    readback(rs[-1])
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt * 1e3:.1f} ms/iter ({BATCH * MPIX / dt:.1f} Mpix/s)")
    return dt


def main():
    log("devices:", jax.devices())
    bufs = benchmod.make_test_images(BATCH, W, H)
    corpus = [native.jpeg_encode(native.jpeg_decode(b, 3, W, H), 85,
                                 restart=8) for b in bufs]
    p = JpegBatchPipeline(width=OW, height=OH, encode_quality=85,
                          encode_backend="device", fused=True,
                          upload="scan")
    wires, ks0, sig0 = [], None, None
    for r in range(3):
        rot = corpus[r:] + corpus[:r]
        cos = p.entropy_decode(rot)
        sig, ks, args = p.stack_bucket(cos)
        if ks0 is None:
            sig0, ks0 = sig, ks
        elif ks != ks0:
            continue
        wires.append([jax.device_put(a) for a in args])
    log("static key:", ks0)
    (C, n_lanes, steps, B, comp_of, mcus, n_img, n_uniq, single, nw) = ks0
    ncomp = len(sig0[3])

    # warm the link
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))

    # ---- full e2e (decode+fused+encode) -----------------------------
    def e2e(i):
        return p.run_bucket(sig0, wires[i % len(wires)], scan_ks=ks0)

    timeit("e2e run_bucket", e2e, readback=lambda r: np.asarray(r[0][1]))

    # ---- decode only -------------------------------------------------
    unpack = build_wire_unpack(ks0, ncomp)
    core = build_decoder_core(*ks0[:-1])

    @jax.jit
    def dec(buf):
        dec_args, _q = unpack(buf)
        out, ok = core(*dec_args)
        return out.sum(), ok

    timeit("decode only", lambda i: dec(wires[i % len(wires)][0]),
           readback=lambda r: np.asarray(r[0]))

    # ---- decode debug: trips + per-lane step distribution ------------
    core_dbg = build_decoder_core(*ks0[:-1], debug=True)

    @jax.jit
    def dec_dbg(buf):
        dec_args, _q = unpack(buf)
        out, ok, trips, lane_steps = core_dbg(*dec_args)
        return out.sum(), ok, trips, lane_steps

    _, ok, trips, lane_steps = dec_dbg(wires[0][0])
    ls = np.asarray(lane_steps)
    live = ls[ls > 0]
    log(f"emit trips: {int(trips)} of budget {steps}; lanes {n_lanes} "
        f"live {live.size}")
    log(f"lane_steps: mean {live.mean():.0f} p50 {np.percentile(live, 50):.0f} "
        f"p90 {np.percentile(live, 90):.0f} p99 {np.percentile(live, 99):.0f} "
        f"max {live.max()}")
    log(f"total symbols {live.sum()} vs lockstep work {n_lanes * int(trips)} "
        f"-> packing efficiency {live.sum() / (n_lanes * int(trips)):.2f}")

    # ---- decode ablations (fixed FULL-budget trips; relative only) ---
    abl_times = {}
    for ab in ["fixed", "fixed,window", "fixed,tables", "fixed,gather",
               "fixed,window,tables,gather"]:
        try:
            core_a = build_decoder_core(*ks0[:-1], ablate=ab)

            @jax.jit
            def dec_a(buf, _core=core_a):
                dec_args, _q = unpack(buf)
                out, ok = _core(*dec_args)
                return out.sum(), ok

            abl_times[ab] = timeit(
                f"decode ablate[{ab}]",
                lambda i, f=dec_a: f(wires[i % len(wires)][0]),
                iters=2, readback=lambda r: np.asarray(r[0]))
        except Exception as e:  # noqa: BLE001
            log(f"ablate[{ab}] failed: {type(e).__name__}: {e}")
    if "fixed" in abl_times:
        base = abl_times["fixed"]
        for k, v in abl_times.items():
            if k != "fixed":
                log(f"  component {k.split(',', 1)[1]}: "
                    f"{(base - v) / base:.1%} of fixed-decode time")

    # ---- encoder: fDCT+quant vs scan encode -------------------------
    from picha_tpu.ops import jpeg_tpu
    from picha_tpu.ops.jpeg_huffman_tpu import build_scan_encoder
    from picha_tpu.pipeline.jpeg_batch import _resized_comp_sig

    rsig = _resized_comp_sig(OH, OW, 3)
    cap = p._scan_cap_for(sig0)
    qluma, qchroma = jpeg_tpu.quality_tables(85)
    enc_scan = build_scan_encoder(rsig, cap)
    fdct = jpeg_tpu._jit_encode.__wrapped__(OH, OW, 3, True)
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 256, (BATCH, OH, OW, 3), np.uint8))

    @jax.jit
    def fdct_only(img, salt):
        coefs = fdct(img + salt.astype(jnp.uint8), qluma, qchroma)
        return tuple(c.sum() for c in coefs)

    timeit("encode fDCT+quant only",
           lambda i: fdct_only(img, jnp.uint8(i)),
           readback=lambda r: np.asarray(r[0]))

    coefs0 = jax.jit(lambda im: fdct(im, qluma, qchroma))(img)
    coefs0 = tuple(jax.device_put(np.asarray(c)) for c in coefs0)

    @jax.jit
    def scan_only(salt, *coefs):
        coefs = tuple(c + salt for c in coefs)
        by, nb = enc_scan(coefs)
        return by.sum(), nb

    timeit("encode scan (huffman) only",
           lambda i: scan_only(jnp.int32(0), *coefs0),
           readback=lambda r: np.asarray(r[1]))

    # ---- micro: gather + select costs per decode step ----------------
    L = n_lanes
    T = 512
    tab = jax.device_put(
        rng.integers(0, 256, (2048,), np.int32))
    tab256 = jax.device_put(rng.integers(0, 256, (256,), np.int32))
    tab_u8 = jax.device_put(tab.astype(jnp.uint8))
    idx0 = jax.device_put(rng.integers(0, 2048, (L,), np.int32))

    def loop_cost(name, body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, T, body, x)

        r = run(init)
        jax.tree_util.tree_map(np.asarray, r)
        t0 = time.perf_counter()
        r = run(init)
        jax.tree_util.tree_map(np.asarray, r)
        dt = time.perf_counter() - t0
        log(f"micro {name}: {dt / T * 1e6:.1f} us/step "
            f"({dt / T / L * 1e9:.2f} ns/lane)")
        return dt / T

    loop_cost("gather L from 2048",
              lambda k, x: (x + tab[(x + k) & 2047]) & 0x7FFFFFFF, idx0)
    loop_cost("gather L from 256",
              lambda k, x: (x + tab256[(x + k) & 255]) & 0x7FFFFFFF, idx0)
    loop_cost("gather u8 L from 2048",
              lambda k, x: (x + tab_u8[(x + k) & 2047].astype(jnp.int32))
              & 0x7FFFFFFF, idx0)

    tab_f = jax.device_put(np.asarray(tab256, np.float32))

    def onehot_matmul(k, x):
        ii = (x + k) & 255
        oh = (ii[:, None] == jnp.arange(256)[None, :]).astype(jnp.float32)
        v = (oh @ tab_f).astype(jnp.int32)
        return (x + v) & 0x7FFFFFFF

    loop_cost("onehot-matmul L x 256", onehot_matmul, idx0)

    # packed bit-select: table as (64,) u32 of 4 x u8 entries
    packed = np.zeros(64, np.uint32)
    t256 = np.asarray(tab256, np.uint32) & 0xFF
    for kk in range(64):
        packed[kk] = (t256[4 * kk] | (t256[4 * kk + 1] << 8)
                      | (t256[4 * kk + 2] << 16) | (t256[4 * kk + 3] << 24))
    packed = jax.device_put(packed)

    def select_packed(k, x):
        ii = (x + k) & 255
        w = jnp.sum(jnp.where(
            (ii[:, None] >> 2) == jnp.arange(64)[None, :],
            packed[None, :], 0), axis=1)
        v = ((w >> ((ii & 3) << 3).astype(jnp.uint32)) & 0xFF).astype(
            jnp.int32)
        return (x + v) & 0x7FFFFFFF

    loop_cost("select-packed L x 64 words", select_packed, idx0)

    # window one-hot select at the real W
    Wn = C // 32 + 2
    win_pair = jax.device_put(
        rng.integers(0, 2**31, (L, Wn, 2)).astype(np.uint32))

    def window_sel(k, x):
        wl = (x + k) & (Wn - 1)
        sel = (wl[:, None] == jnp.arange(Wn)[None, :])
        pair = jnp.sum(jnp.where(sel[:, :, None], win_pair, 0), axis=1)
        return (x + pair[:, 0].astype(jnp.int32)) & 0x7FFFFFFF

    loop_cost(f"window one-hot select W={Wn}", window_sel, idx0)


if __name__ == "__main__":
    main()
