"""Per-stage ablation profile of the TPU Huffman scan encoder.

Times the full encoder and shape-preserving stage fakes on the real
chip at the bench shapes; each stage's cost is the difference vs full.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_encoder.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from picha_tpu.ops import jpeg_tpu
from picha_tpu.ops.jpeg_huffman_tpu import build_scan_encoder
from picha_tpu.pipeline.jpeg_batch import _resized_comp_sig

BATCH, OW, OH = 16, 960, 544
MPIX = OW * OH / 1e6


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    rsig = _resized_comp_sig(OH, OW, 3)
    # byte cap like the pipeline would pick for q85 1080p->half
    cap = 262144
    qluma, qchroma = jpeg_tpu.quality_tables(85)
    fdct = jpeg_tpu._jit_encode.__wrapped__(OH, OW, 3, True)
    rng = np.random.default_rng(0)
    # structured content -> realistic packet density
    yy, xx = np.mgrid[0:OH, 0:OW].astype(np.float32)
    base = 127 + 70 * np.sin(xx / 23) + 50 * np.cos(yy / 17)
    img = np.clip(np.stack([base, 255 - base, base * 0.6 + 50], -1)
                  + rng.normal(0, 5, (OH, OW, 3)), 0, 255).astype(np.uint8)
    imgs = jax.device_put(np.broadcast_to(
        img, (BATCH, OH, OW, 3)).copy())
    coefs0 = jax.jit(lambda im: fdct(im, qluma, qchroma))(imgs)
    coefs0 = tuple(jax.device_put(np.asarray(c)) for c in coefs0)
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))  # warm link

    log(f"comp_sig {rsig} cap {cap}")

    times = {}
    for ab in ["", "blocks", "codes", "offsets", "words",
               "stuff", "blocks,codes,offsets,words,stuff"]:
        enc = build_scan_encoder(rsig, cap, ablate=ab)

        @jax.jit
        def run(salt, *coefs, _e=enc):
            coefs = tuple(c + salt for c in coefs)
            by, nb = _e(coefs)
            return by.sum(), nb

        try:
            r = run(jnp.int32(0), *coefs0)
            np.asarray(r[0])
            iters = 4
            t0 = time.perf_counter()
            rs = [run(jnp.int32(0), *coefs0) for _ in range(iters)]
            np.asarray(rs[-1][0])
            dt = (time.perf_counter() - t0) / iters
            times[ab] = dt
            log(f"encode ablate[{ab or 'FULL'}]: {dt * 1e3:.1f} ms/iter "
                f"({BATCH * MPIX / dt:.1f} Mpix/s out-res)")
        except Exception as e:  # noqa: BLE001
            log(f"ablate[{ab}] failed: {type(e).__name__}: {e}")
    if "" in times:
        base = times[""]
        for k, v in times.items():
            if k:
                log(f"  stage {k}: {(base - v) / base:.1%} of full encode")


if __name__ == "__main__":
    main()
