"""Quick real-chip timing of the TPU Huffman decode stage alone.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/time_decode.py [batch]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
W, H, OW, OH = 1920, 1088, 960, 544
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
    ncomp = len(sig0[3])
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))  # warm link

    unpack = build_wire_unpack(ks0, ncomp)
    core = build_decoder_core(*ks0[:-1])

    @jax.jit
    def dec(buf):
        dec_args, _q = unpack(buf)
        out, ok = core(*dec_args)
        return out.sum(), ok

    r = dec(wires[0][0])
    log("ok:", bool(np.asarray(r[1])), "sum:", int(np.asarray(r[0])))
    iters = 6
    t0 = time.perf_counter()
    rs = [dec(wires[(1 + i) % len(wires)][0]) for i in range(iters)]
    np.asarray(rs[-1][0])
    dt = (time.perf_counter() - t0) / iters
    log(f"decode only: {dt * 1e3:.1f} ms/iter "
        f"({BATCH * MPIX / dt:.1f} Mpix/s)")

    # parity vs host libjpeg path
    from picha_tpu.ops.jpeg_huffman_decode_tpu import decode_planes
    from picha_tpu.ops.jpeg_scan import parse_baseline
    from picha_tpu.ops.jpeg_huffman_decode_tpu import ScanBatch
    infos = [parse_baseline(bytes(b)) for b in corpus[:4]]
    sb = ScanBatch(infos)
    planes = decode_planes(sb)
    assert planes is not None
    for i, b in enumerate(corpus[:4]):
        want = native.JpegCoefficients(bytes(b))
        for ci in range(want.ncomp):
            got = planes[ci][i]
            w = want.comps[ci]["coefs"]
            assert np.array_equal(got[: w.shape[0], : w.shape[1]], w), (
                i, ci)
    log("parity vs libjpeg: exact")


if __name__ == "__main__":
    main()
