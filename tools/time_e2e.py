"""Real-chip timing of the FULL device loop (scan -> TPU huffdec ->
fused decode+resize -> TPU huffenc -> scan bytes), restart and
no-restart corpora.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/time_e2e.py [restart]
      restart: JPEG restart interval for the corpus prep (0 = as-is,
      exercises the chunked speculative decoder). Default 8.
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

RESTART = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BATCH = 16
W, H, OW, OH = 1920, 1088, 960, 544
MPIX = W * H / 1e6


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices(), "restart:", RESTART)
    bufs = benchmod.make_test_images(BATCH, W, H)
    if RESTART:
        corpus = [native.jpeg_encode(native.jpeg_decode(b, 3, W, H), 85,
                                     restart=RESTART) for b in bufs]
    else:
        corpus = [bytes(b) for b in bufs]
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
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))  # warm link

    res, okf = p.run_bucket(sig0, wires[0], scan_ks=ks0)
    log("converged:", bool(np.asarray(okf)))
    jpegs = p.scan_finish(res, sig0)
    # parity vs strict host path
    pn = JpegBatchPipeline(width=OW, height=OH, encode_quality=85,
                           encode_backend="host")
    diffs = []
    for got_b, ref_b in zip(jpegs, pn.host_encode_batch(corpus)):
        got = native.jpeg_decode(bytes(got_b), 3, OW, OH)
        ref = native.jpeg_decode(bytes(ref_b), 3, OW, OH)
        diffs.append(np.abs(got.astype(int) - ref.astype(int)).mean())
    log(f"parity vs host: {np.mean(diffs):.3f} LSB")

    iters = 6
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        r, _ok = p.run_bucket(sig0, wires[i % len(wires)], scan_ks=ks0)
        outs.append(r)
    np.asarray(outs[-1][1])
    dt = (time.perf_counter() - t0) / iters
    log(f"e2e device loop: {dt * 1e3:.1f} ms/iter "
        f"({BATCH * MPIX / dt:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
