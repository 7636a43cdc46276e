"""Decode fixed-cost decomposition: ablates the post-loop dense stages
(emission scatter, dezigzag permutation, DC scan) and the loop itself.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_decode2.py
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

from picha_tpu.native import lib as native
from picha_tpu.pipeline import JpegBatchPipeline
from picha_tpu.ops.jpeg_huffman_decode_tpu import (
    build_decoder_core, build_wire_unpack)

BATCH, W, H, OW, OH = 16, 1920, 1088, 960, 544
MPIX = W * H / 1e6


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    bufs = benchmod.make_test_images(BATCH, W, H)
    corpus = [native.jpeg_encode(native.jpeg_decode(b, 3, W, H), 85,
                                 restart=8) for b in bufs]
    p = JpegBatchPipeline(width=OW, height=OH, encode_quality=85,
                          encode_backend="device", fused=True,
                          upload="scan")
    cos = p.entropy_decode(corpus)
    sig0, ks0, args = p.stack_bucket(cos)
    wire = jax.device_put(args[0])
    log("static key:", ks0)
    ncomp = len(sig0[3])
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))

    unpack = build_wire_unpack(ks0, ncomp)
    times = {}
    for ab in ["", "noemit", "noscatter", "noperm", "nodc",
               "noemit,noscatter,noperm,nodc"]:
        core = build_decoder_core(*ks0[:-1], ablate=ab)

        @jax.jit
        def dec(buf, _core=core):
            dec_args, _q = unpack(buf)
            out, ok = _core(*dec_args)
            return out.sum(), ok

        try:
            r = dec(wire)
            np.asarray(r[0])
            iters = 4
            t0 = time.perf_counter()
            rs = [dec(wire) for _ in range(iters)]
            np.asarray(rs[-1][0])
            dt = (time.perf_counter() - t0) / iters
            times[ab] = dt
            log(f"decode ablate[{ab or 'FULL'}]: {dt * 1e3:.1f} ms/iter "
                f"({BATCH * MPIX / dt:.1f} Mpix/s)")
        except Exception as e:  # noqa: BLE001
            log(f"ablate[{ab}] failed: {type(e).__name__}: {e}")
    if "" in times:
        base = times[""]
        for k, v in times.items():
            if k:
                log(f"  stage {k}: {(base - v) / base:.1%} of full decode")


if __name__ == "__main__":
    main()
