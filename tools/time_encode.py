"""Quick real-chip timing of the TPU Huffman scan ENCODE stage alone.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/time_encode.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from picha_tpu.native import lib as native
from picha_tpu.ops import jpeg_tpu
from picha_tpu.ops.jpeg_huffman_tpu import build_scan_encoder
from picha_tpu.pipeline.jpeg_batch import _resized_comp_sig

BATCH = 16
OW, OH = 960, 544
MPIX = OW * OH / 1e6


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    rsig = _resized_comp_sig(OH, OW, 3)
    cap = 1 << 18
    qluma, qchroma = jpeg_tpu.quality_tables(85)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:OH, 0:OW].astype(np.float32)
    base = 127 + 60 * np.sin(xx / 7) + 50 * np.cos(yy / 5)
    img = np.clip(np.stack([base, 255 - base, base * 0.7 + 30], -1)
                  + rng.normal(0, 5, (OH, OW, 3)), 0, 255).astype(np.uint8)
    imgs = jax.device_put(np.broadcast_to(img, (BATCH, OH, OW, 3)).copy())
    fdct = jpeg_tpu._jit_encode.__wrapped__(OH, OW, 3, True)
    coefs0 = jax.jit(lambda im: fdct(im, qluma, qchroma))(imgs)
    coefs0 = tuple(jax.device_put(np.asarray(c)) for c in coefs0)
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))  # warm link

    enc = build_scan_encoder(rsig, cap)

    @jax.jit
    def run(salt, *coefs):
        coefs = tuple(c + salt for c in coefs)
        by, nb = enc(coefs)
        return by.sum(), nb

    s, nb = run(np.int32(0), *coefs0)
    np.asarray(nb)
    # parity check: one image through host libjpeg
    co_host = [{"coefs": np.asarray(c)[0].astype(np.int16),
                "qtable": (qluma if i == 0 else qchroma).astype(np.uint16),
                "h_samp": 2 if i == 0 else 1, "v_samp": 2 if i == 0 else 1}
               for i, c in enumerate(coefs0)]
    iters = 8
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(run(np.int32(i % 3), *coefs0))
    np.asarray(outs[-1][1])
    dt = (time.perf_counter() - t0) / iters
    log(f"encode scan only: {dt * 1e3:.1f} ms/iter "
        f"({BATCH / dt * MPIX:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
