"""Single-core host-stage accounting (VERDICT r3 "Missing #3").

Measures every host pipeline stage on one core at the bench shapes and
prints a ms/image + MB/s + cycles/byte table. These are the measured
inputs to the multi-core projection in docs/PERFORMANCE.md: the stages
share no mutable state (TSAN-verified, native/check_tsan.sh) and run
GIL-released through ctypes, so an N-core host runs N whole-image
chains concurrently; the projection is N x the single-core rate until
memory bandwidth binds (the memcpy row bounds that).

Run:  python tools/profile_host_stages.py
"""
from __future__ import annotations

import re
import time

import numpy as np

import picha_tpu as picha
from picha_tpu.native import lib as native
from picha_tpu.ops import jpeg_scan

W, H, OW, OH = 1920, 1088, 960, 544
MPIX = W * H / 1e6


def cpu_ghz() -> float:
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        m = re.search(r"cpu MHz\s*:\s*([\d.]+)", txt)
        if m:
            return float(m.group(1)) / 1e3
        m = re.search(r"@ ([\d.]+)GHz", txt)
        if m:
            return float(m.group(1))
    except OSError:
        pass
    return 0.0


GHZ = cpu_ghz()
ROWS = []


def stage(name, fn, in_bytes, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    cyc = dt * GHZ * 1e9 / in_bytes if GHZ and in_bytes else 0.0
    ROWS.append((name, dt * 1e3, in_bytes / dt / 1e6, cyc))
    print(f"{name:<38} {dt * 1e3:8.2f} ms  {in_bytes / dt / 1e6:8.1f} MB/s"
          f"  {cyc:7.2f} cyc/B")
    return dt


def main():
    print(f"cpu: {GHZ:.2f} GHz nominal; shapes {W}x{H} -> {OW}x{OH}")
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 127 + 70 * np.sin(xx / 23) + 50 * np.cos(yy / 17)
    arr = np.clip(np.stack([base, 255 - base, base * 0.6 + 50], -1)
                  + rng.normal(0, 5, (H, W, 3)), 0, 255).astype(np.uint8)
    jpg = native.jpeg_encode(arr, 85, restart=8)
    jpg_nr = native.jpeg_encode(arr, 85)  # no restart markers
    info = jpeg_scan.parse_baseline(bytes(jpg))
    scan_bytes = sum(len(s) for s in info.segments)
    img = picha.Image.from_array(arr, "rgb")
    png = picha.encodePngSync(img)
    raw = arr.nbytes

    print(f"1080p q85: file {len(jpg)} B, scan {scan_bytes} B")
    buf = np.empty_like(arr)
    stage("memcpy raw frame (bandwidth bound)",
          lambda: np.copyto(buf, arr), raw)
    stage("jpeg header parse (python)",
          lambda: jpeg_scan.parse_baseline(bytes(jpg)), len(jpg))
    stage("entropy decode native 1T (restart)",
          lambda: native.jpeg_entropy_decode(info, nthreads=1), scan_bytes)
    stage("entropy decode libjpeg (coefs)",
          lambda: native.JpegCoefficients(bytes(jpg)), scan_bytes)
    stage("full decode libjpeg -> rgb",
          lambda: native.jpeg_decode(bytes(jpg), 3, W, H), len(jpg))
    stage("full decode libjpeg (no restart)",
          lambda: native.jpeg_decode(bytes(jpg_nr), 3, W, H), len(jpg_nr))
    stage("raw420 decode (scaled, denom=2)",
          lambda: native.jpeg_decode_raw420(bytes(jpg), W, H,
                                            scale_denom=2), len(jpg))
    from picha_tpu.ops.resize import _resize_native
    stage("resize AVX2 u8x3 1080p -> half",
          lambda: _resize_native(arr, OW, OH, "cubic", 0.7), raw)
    small = _resize_native(arr, OW, OH, "cubic", 0.7)
    stage("jpeg encode q85 (libjpeg)",
          lambda: native.jpeg_encode(small, 85), small.nbytes)
    stage("one-call transcode 1080p -> half",
          lambda: picha.transcodeJpegSync(jpg, {"width": OW, "height": OH}),
          len(jpg))
    stage("png decode (inflate+unfilter)",
          lambda: picha.decodePngSync(png), len(png))
    stage("png encode l1 (filter+deflate)",
          lambda: picha.encodePngSync(img, {"level": 1}), raw)
    stage("png encode l6 (filter+deflate)",
          lambda: picha.encodePngSync(img), raw, reps=3)

    print("\nmarkdown rows:")
    for name, ms, mbs, cyc in ROWS:
        print(f"| {name} | {ms:.2f} | {mbs:.0f} | {cyc:.1f} |")


if __name__ == "__main__":
    main()
