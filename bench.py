#!/usr/bin/env python
"""picha_tpu benchmark — runs on the real TPU chip.

Measures the BASELINE.json driver metric: megapixels/sec/chip for the
batched JPEG decode -> resize -> encode pipeline (1080p inputs), plus
p50 latency for a single 1080p image and the TPU-pixel-stage-only
throughput, plus host<->device link bandwidth (this environment reaches
the chip through a network tunnel, so the link — not the chip — can
bound end-to-end numbers; the stage decomposition in `detail` shows
where time goes).

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
vs_baseline = ratio over a single-threaded CPU stand-in doing the same
work through PIL/libjpeg (the reference is a single-threaded C path per
request and publishes no numbers of its own — BASELINE.md).

Supplementary logs go to stderr.
"""
from __future__ import annotations

import io
import json
import os
import statistics
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- global wall-clock budget (VERDICT r4 #1) --------------------------
# The driver runs `python bench.py` under a timeout; two rounds lost
# their official number to it (r3: stdout line too long, r4: rc 124
# before the final JSON printed). Every stage is now gated on a hard
# deadline, and the compact JSON line is emitted by atexit/SIGTERM
# handlers from whatever completed — a kill still yields a parseable
# artifact.
BENCH_T0 = time.monotonic()
BENCH_DEADLINE_S = float(os.environ.get("PICHA_BENCH_DEADLINE_S", "1350"))
EMIT_RESERVE_S = 25.0  # kept back for the final emit + detail write

# emission state shared with the atexit/SIGTERM handlers; main() fills
# these in place as stages complete
_RESULT = {"detail": {}, "violations": [], "cpu_ips": None,
           "e2e_ips": None, "emitted": False}


def budget_left() -> float:
    return BENCH_DEADLINE_S - (time.monotonic() - BENCH_T0)


def emit_compact(reason: str = "") -> None:
    """Print the ONE compact JSON line the driver parses, exactly once,
    from whatever has been measured so far. Safe to call from atexit
    and from a SIGTERM handler."""
    if _RESULT["emitted"]:
        return
    _RESULT["emitted"] = True
    detail = _RESULT["detail"]
    violations = _RESULT["violations"]
    e2e_ips = _RESULT["e2e_ips"] or 0.0
    cpu_ips = _RESULT["cpu_ips"] or 0.0
    mpix = BENCH_W * BENCH_H / 1e6
    detail["strict_parity_mpix_s"] = round(e2e_ips * mpix, 1)
    detail["bench_wall_s"] = round(time.monotonic() - BENCH_T0, 1)
    if reason:
        detail["emit_reason"] = reason
    if violations:
        detail["violations"] = violations
        log(f"PARITY VIOLATIONS — poisoning result: {violations}")
        e2e_ips = 0.0
    full = {
        "metric": "batched 1080p JPEG decode->resize(960x544 cubic)->encode "
                  "q85, end-to-end per chip, strict <=1 LSB parity",
        "value": round(e2e_ips * mpix, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(e2e_ips / cpu_ips, 2) if cpu_ips else 0.0,
        "detail": detail,
    }
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError as e:
        log(f"could not write BENCH_DETAIL.json: {e}")
    # the driver tail-captures only the last ~2000 bytes of stdout, so
    # the one JSON line it parses must be SMALL (BENCH_r03 was truncated
    # to parsed=null by a ~3 KB line). Full detail goes to disk instead.
    compact = {
        "metric": "jpeg e2e decode->resize->encode, strict <=1 LSB",
        "value": full["value"],
        "unit": "Mpix/s",
        "vs_baseline": full["vs_baseline"],
        "p50_ms_1080p": detail.get("p50_ms_1080p"),
        "device_only_mpix_s": detail.get("device_only_mpix_s"),
        "device_only_norestart_mpix_s":
            detail.get("device_only_norestart_mpix_s"),
        "png_e2e_mpix_s": detail.get("png_e2e_mpix_s"),
        "webp_e2e_mpix_s": detail.get("webp_e2e_mpix_s"),
        "tiff_e2e_mpix_s": detail.get("tiff_e2e_mpix_s"),
        "violations": len(violations),
        "detail_file": "BENCH_DETAIL.json",
    }
    print(json.dumps(compact), flush=True)


def make_test_images(n: int, w: int, h: int, seed: int = 42) -> list:
    from picha_tpu.native import lib as native

    rng = np.random.default_rng(seed)
    bufs = []
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    noise = rng.normal(0, 6, (h, w, 3)).astype(np.float32)
    for i in range(n):
        fx, fy = rng.uniform(1, 6, 2)
        base = (127 + 60 * np.sin(2 * np.pi * fx * xx / w + i)
                + 50 * np.cos(2 * np.pi * fy * yy / h))
        img = np.stack([base, np.roll(base, 37, axis=1),
                        np.roll(base, 71, axis=0)], axis=-1)
        arr = np.clip(img + np.roll(noise, i * 13, axis=1), 0, 255).astype(np.uint8)
        bufs.append(native.jpeg_encode(arr, 85))
    return bufs


def steal_ticks() -> int:
    """Hypervisor steal ticks for this vCPU (/proc/stat col 8). This
    box's single core loses bursts of 10-60% of wall time to the
    hypervisor (measured: iterations at steal+0 run 2x faster than
    iterations at steal+14 of ~15 ticks) — any timed window must either
    be attributed or retried."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:  # noqa: BLE001
        return 0


def best_window(fn, windows=3, max_windows=None):
    """Run the timed window `fn() -> (work, seconds)` several times and
    return (rate, steal_ticks_of_best): the best window approximates
    what the hardware delivers when the hypervisor isn't stealing the
    core mid-measurement. All windows + their steal deltas are logged
    for attribution. When every window was stolen from, keep retrying
    (up to `max_windows`, default 2x `windows`) — a steal burst hitting
    all of a handful of windows otherwise publishes a 30-50% low
    headline (observed: 14 steal ticks -> 90.9 img/s vs ~120 clean)."""
    if max_windows is None:
        max_windows = 2 * windows
    rates, steals = [], []
    for _ in range(windows):
        s0 = steal_ticks()
        work, dt = fn()
        rates.append(work / dt)
        steals.append(steal_ticks() - s0)
    # retry while every window was stolen from, OR while the best
    # window is uncorroborated — no second window within 15% of it
    # (observed: adjacent zero-steal windows 4.5x apart on this box —
    # contention the steal counter doesn't see, e.g. hypervisor CPU
    # capping). Corroboration, not total spread, is the stop rule: a
    # slow outlier stays in `rates` forever, so a spread test would
    # never pass and every call would silently run max_windows.
    def _uncorroborated():
        best = max(rates)
        return sum(1 for r in rates if r >= best / 1.15) < 2

    while (min(steals) > 1 or _uncorroborated()) \
            and len(rates) < max_windows:
        s0 = steal_ticks()
        work, dt = fn()
        rates.append(work / dt)
        steals.append(steal_ticks() - s0)
    i = max(range(len(rates)), key=lambda j: rates[j])
    log(f"  windows: {[round(r, 1) for r in rates]} img/s, "
        f"steal ticks {steals} -> best {rates[i]:.1f}")
    return rates[i], steals[i]


def _hostile_images(n: int, w: int = 1920, h: int = 1088) -> list:
    """Adversarial 4:2:0 corpus: 32px block mosaics and 4px band-limited
    noise — heavy spectral energy at the half-grid Nyquist, the worst
    case for any draft-decode path."""
    from picha_tpu.native import lib as native

    r = np.random.default_rng(1234)
    out = []
    for i in range(n):
        if i % 2 == 0:
            t = r.integers(0, 256, (h // 32, w // 32, 3)).astype(np.float32)
            img = np.kron(t, np.ones((32, 32, 1), np.float32))
        else:
            g = r.normal(0, 1, (h // 4, w // 4, 3)).astype(np.float32)
            img = 127 + 45 * np.kron(g, np.ones((4, 4, 1), np.float32))
        out.append(native.jpeg_encode(
            np.clip(img, 0, 255).astype(np.uint8), 85))
    return out


def measure_link():
    # block_until_ready is unreliable here — force the upload to finish
    # with a tiny dependent readback before stopping the clock
    import jax

    d = jax.device_put(np.zeros((8 * 1024 * 1024,), np.uint8))
    np.asarray(d[:8])  # warm both directions
    t0 = time.perf_counter()
    d2 = jax.device_put(np.ones((8 * 1024 * 1024,), np.uint8))
    np.asarray(d2[:8])
    up = 8 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(d2)
    down = 8 / (time.perf_counter() - t0)
    return up, down


def bench_tpu_stage(p, sig, dargs, batch, mpix, iters=6, fused=False,
                    inner=8):
    """Device-only throughput.

    This environment's platform does not reliably block in
    block_until_ready, and may memoize identical dispatches — so
    completion is forced by a small readback of the LAST output (TPU
    executes a single in-order stream, so the last completing implies
    all completed). Two further tunnel artifacts are handled:

    * per-dispatch RPC enqueue cost: at ~2.4 ms/batch of real device
      time, 20 dispatches measured mostly the tunnel (observed 13.1 vs
      3.4 GPix/s between runs for the SAME graph). Each dispatch now
      runs `inner` chained executions in one lax.fori_loop, the input
      of each perturbed by the previous carry (data dependence defeats
      both XLA CSE and any platform memoization, and amortises the
      enqueue 8x);
    * the fixed readback latency (~0.3 s+, worse on bad days): a
      second readback of an ALREADY-complete output right after the
      timed one measures the empty-stream RPC cost, which is
      subtracted (floored at half the window)."""
    import jax
    import jax.numpy as jnp

    from picha_tpu.pipeline.jpeg_batch import _jit_batch_graph

    base = _jit_batch_graph(sig, p._width, p._height, p._filter, p._fscale,
                            False, None, None, False, fused)

    @jax.jit
    def step(salt, *args):
        def body(_k, carry):
            perturbed = args[0] + (carry & 1).astype(args[0].dtype)
            o = base(perturbed, *args[1:])
            # full reduction: every output element feeds the carry, so
            # XLA can neither slice-propagate the dependence down to a
            # corner of the graph nor dead-code any of the work
            return carry + o.astype(jnp.int32).sum()

        return jax.lax.fori_loop(0, inner, body, salt)

    out = step(jnp.int32(0), *dargs)
    np.asarray(out)  # warm + force
    t0 = time.perf_counter()
    outs = [step(jnp.int32(1 + i), *dargs) for i in range(iters)]
    np.asarray(outs[-1])  # dependent readback: forces the stream
    t1 = time.perf_counter()
    np.asarray(outs[-2])  # stream now empty: pure readback RPC cost
    t_rb = time.perf_counter() - t1
    dt = max(t1 - t0 - t_rb, (t1 - t0) / 2)
    return batch * iters * inner / dt


_POOL_CACHE = {}


def _device_pool(bufs, batch):
    """96-image pool for device-config dispatch diversity (cached per
    process; the subprocess probes each build their own)."""
    key = (len(bufs), batch)
    if key not in _POOL_CACHE:
        _POOL_CACHE[key] = list(bufs) + make_test_images(
            96 - len(bufs), BENCH_W, BENCH_H, seed=1337)
    return _POOL_CACHE[key]


def bench_e2e(bufs, batch, out_w, out_h, rounds=12, config="host",
              windows=3):
    """End-to-end decode -> resize -> encode in one of three
    configurations an operator could deploy:

      host         pure-host streaming: libjpeg decode, AVX2 native
                   resize, libjpeg encode — no device in the loop
      gap4+device  hybrid: host path fills the core while the device
                   chain (gap4 coefficient upload -> fused decode+
                   resize -> full on-chip Huffman encode) runs `depth`
                   batches deep with async dispatch/readback
      scan+device  hybrid where even the entropy DECODE is on-chip —
                   the upload is the raw JPEG scan; the host keeps only
                   the header parse

    Returns (img/s, detail). bench_e2e_best probes all three and runs
    the final measurement on the winner (the compilation cache makes
    the probes cheap after round one). The timed measurement runs
    `windows` times and keeps the best (steal-attributed — see
    best_window); one untimed warm batch precedes timing so weight
    caches / zlib state never land inside the window."""
    from picha_tpu.pipeline import JpegBatchPipeline

    if config in ("host", "host-fast", "host-raw", "host-draft"):
        p = JpegBatchPipeline(width=out_w, height=out_h, encode_quality=85,
                              encode_backend="host", upload="gap4",
                              host_fast_scale=(config == "host-fast"),
                              host_raw=(config == "host-raw"),
                              host_draft=(config == "host-draft"))
        runner = p.stream_host
        up_b = down_b = 0.0
    else:
        upload, backend = config.split("+")
        # the hybrid's host worker runs the raw-domain path too — faster
        # than the RGB path, ≤1 LSB parity (measured by config_parity
        # every run, not assumed)
        p = JpegBatchPipeline(width=out_w, height=out_h, encode_quality=85,
                              encode_backend=backend, fused=True,
                              upload=upload, host_raw=True)
        warm = p(bufs[:batch])
        cos = p.entropy_decode(bufs[:batch])
        _, _, args = p.stack_bucket(cos)
        up_b = sum(a.nbytes for a in args) / 1e6
        down_b = (sum(len(e) for e in warm) / 1e6 if backend == "device"
                  else batch * (((out_h + 15) & ~15)
                                * (((out_w + 15) & ~15)) * 3) / 2 / 1e6)
        runner = p.stream_hybrid
    for _ in runner([bufs]):  # untimed warmup
        pass

    # every round of every window must present distinct wire bytes to
    # the device chain (this platform may memoize identical dispatches
    # — see bench_tpu_stage). Rotations of a 16-image corpus give only
    # 16 distinct compositions, so device configs draw batch windows
    # from a 96-image pool instead: rounds x windows stays below the
    # number of distinct ring windows. Host configs really do the CPU
    # work every time; rotation only varies the order.
    pool = bufs if "+" not in config else _device_pool(bufs, batch)
    P = len(pool)
    win = [0]

    def window():
        base = win[0] * rounds + 1  # +1: warmup used rotation 0
        win[0] += 1
        t0 = time.perf_counter()
        n = 0
        for encoded in runner(
                [pool[(base + r + i) % P] for i in range(batch)]
                for r in range(rounds)):
            n += len(encoded)
        return n, time.perf_counter() - t0

    # device configs must never re-dispatch wire bytes the platform has
    # already seen (it may memoize identical dispatches, timing a no-op
    # window as near-infinite throughput) — cap steal retries so
    # total windows x rounds + warmup stays within the pool's P
    # distinct ring positions. Host configs really do the CPU work
    # every time; retries are unbounded-by-pool there.
    max_w = None if "+" not in config else max(windows, (P - 1) // rounds)
    ips, stl = best_window(window, windows=windows, max_windows=max_w)
    return ips, {"up_MB_per_batch": round(up_b, 1),
                 "down_MB_per_batch": round(down_b, 1),
                 "e2e_config": config, "steal_ticks_best_window": stl}


def config_parity(bufs, out_w, out_h, config, refs):
    """Average LSB diff of a host config's decoded outputs vs the
    strict cubic path, measured over the WHOLE corpus (the north-star
    gate is ≤1 LSB, BASELINE.json — a one-image gate on friendly
    content is not a gate)."""
    from picha_tpu.native import lib as native
    from picha_tpu.pipeline import JpegBatchPipeline

    p = JpegBatchPipeline(width=out_w, height=out_h, encode_quality=85,
                          encode_backend="host",
                          host_fast_scale=(config == "host-fast"),
                          host_raw=(config == "host-raw"),
                          host_draft=(config == "host-draft"))
    diffs = []
    for b, ref in zip(p.host_encode_batch(bufs), refs):
        got = native.jpeg_decode(bytes(b), 3, out_w, out_h)
        diffs.append(np.abs(got.astype(int) - ref.astype(int)).mean())
    return float(np.mean(diffs)), p.fast_guard_trips


def bench_e2e_best(bufs, batch, out_w, out_h):
    """Probe each deployable configuration briefly, then measure the
    winner properly — what an operator would run. The HEADLINE winner
    is drawn only from configs whose full-corpus output parity is
    ≤1 LSB vs the strict cubic path (the north-star clause); faster
    non-strict configs (host-fast's DCT-domain draft decode) are
    reported in detail but cannot carry the headline. Device configs
    probe inside a watchdogged subprocess: their first compile through
    this environment's remote compile service has taken anywhere from
    15 s to 30+ min (one-time; the persistent cache keeps it warm for
    every later run). Returns (ips, detail, violations)."""
    import json as _json
    import os
    import subprocess
    import sys

    from picha_tpu.native import lib as native
    from picha_tpu.pipeline import JpegBatchPipeline

    violations = []
    probes = {}
    for hc in ("host", "host-raw", "host-draft", "host-fast"):
        ips, _ = bench_e2e(bufs, batch, out_w, out_h, rounds=6, config=hc,
                           windows=2)
        probes[hc] = round(ips, 1)

    # full-corpus parity gates vs the strict cubic path
    pn = JpegBatchPipeline(width=out_w, height=out_h, encode_quality=85,
                           encode_backend="host")
    refs = [native.jpeg_decode(bytes(b), 3, out_w, out_h)
            for b in pn.host_encode_batch(bufs)]
    diffs = {"host": 0.0}
    fast_trips = {}
    for hc in ("host-raw", "host-draft", "host-fast"):
        try:
            diffs[hc], trips = config_parity(bufs, out_w, out_h, hc, refs)
            if hc == "host-fast":
                fast_trips["corpus"] = trips
                if trips:
                    # the divergence guard exists for hostile content;
                    # tripping on the HEADLINE corpus means the fast
                    # path quietly became the staged path
                    violations.append(
                        f"host-fast divergence guard tripped on {trips} "
                        f"bench-corpus images")
            log(f"{hc} vs cubic avg diff (full corpus, n={len(bufs)}): "
                f"{diffs[hc]:.3f} LSB ({'strict' if diffs[hc] <= 1.0 else 'NOT strict'}"
                f" of the <=1 LSB north-star clause)")
        except Exception as e:  # noqa: BLE001
            log(f"{hc} parity check failed: {e}")
            probes.pop(hc, None)
    # host-raw is SUPPOSED to be strict — if it ever isn't, that's a
    # correctness regression, not a race outcome
    if "host-raw" in diffs and diffs["host-raw"] > 1.0:
        violations.append(
            f"host-raw parity {diffs['host-raw']:.3f} LSB > 1.0")

    # hostile-content parity, WITH ATTRIBUTION: block mosaics + 4px
    # noise put heavy spectral energy at the half-grid Nyquist and many
    # out-of-gamut colours. host-fast formerly measured ~2.7 LSB there
    # (the 4x4 draft IDCT truncates what no filter can recover); its
    # divergence guard (ops/fastfix.py draft_hf_probe, round 4) now
    # routes such content to the staged strict path, so the number
    # below measures the GUARDED config and must sit at/below the
    # re-encode floor. host-raw measures ~1.4 — which is AT/BELOW
    # the dust-control floor published next to it: the SAME staged
    # pre-encode image perturbed by sub-LSB dust and re-encoded at q85
    # lands 1.1-2.2 LSB from the un-dusted encode on this content
    # (quantisation amplification any non-bit-identical pipeline pays;
    # the raw path tracks the pure linear composition to <=0.25 LSB in
    # the plane domain — tests/test_raw420.py pins both). The gamut
    # guard (rawguard.cc) separately bounds the one mechanism that
    # grows without bound (out-of-gamut clamp divergence); it must
    # never trip on the headline corpus.
    hostile_parity = {}
    guard_fallbacks = {}
    hostile_floor = None
    try:
        from picha_tpu.ops.resize import (_resize_native,
                                          parse_resize_options)
        fname, fscale = parse_resize_options({})
        hb = _hostile_images(6)
        hrefs = [native.jpeg_decode(bytes(b), 3, out_w, out_h)
                 for b in pn.host_encode_batch(hb)]
        for hc in ("host-raw", "host-draft", "host-fast"):
            par, trips = config_parity(hb, out_w, out_h, hc, hrefs)
            hostile_parity[hc] = round(par, 3)
            if hc == "host-fast":
                fast_trips["hostile"] = trips
        rng = np.random.default_rng(0)
        floors = []
        for b, ref in zip(hb, hrefs):
            st = native.jpeg_stat(bytes(b))
            src = native.jpeg_decode(bytes(b), 3, st[0], st[1])
            pre = _resize_native(src, out_w, out_h, fname, fscale)
            dust = np.clip(pre.astype(np.int16)
                           + rng.integers(0, 2, pre.shape),
                           0, 255).astype(np.uint8)
            got = native.jpeg_decode(native.jpeg_encode(
                np.ascontiguousarray(dust), 85), 3, out_w, out_h)
            floors.append(np.abs(got.astype(int) - ref.astype(int)).mean())
        hostile_floor = round(float(np.mean(floors)), 3)
        log(f"hostile-content parity (LSB): {hostile_parity}; "
            f"sub-LSB-dust re-encode floor {hostile_floor}; "
            f"host-fast guard trips {fast_trips}")
        if hostile_parity.get("host-fast", 0.0) > hostile_floor:
            violations.append(
                f"guarded host-fast hostile parity "
                f"{hostile_parity['host-fast']} LSB exceeds the "
                f"re-encode floor {hostile_floor}")
    except Exception as e:  # noqa: BLE001
        log(f"hostile parity check failed: {e}")
    # the guard-count tripwire runs in its OWN try: an incidental
    # failure above must not silently skip the corpus check, and a
    # failure here is recorded in the JSON rather than swallowed
    try:
        from picha_tpu.ops.raw420 import transcode_raw420
        from picha_tpu.ops.resize import parse_resize_options
        fname, fscale = parse_resize_options({})
        for name, corpus in (("hostile", _hostile_images(6)),
                             ("corpus", bufs)):
            # None means EITHER unsupported layout (rc=1) or the gamut
            # guard (rc=2) — count a guard trip only when the same
            # source succeeds with the guard disabled
            n = 0
            for b in corpus:
                if transcode_raw420(bytes(b), out_w, out_h, fname,
                                    fscale, 85) is None and \
                   transcode_raw420(bytes(b), out_w, out_h, fname,
                                    fscale, 85, gamut_guard=0.0) \
                   is not None:
                    n += 1
            guard_fallbacks[name] = n
        log(f"gamut-guard fallbacks: {guard_fallbacks['hostile']}/6 "
            f"hostile, {guard_fallbacks['corpus']}/{len(bufs)} corpus")
    except Exception as e:  # noqa: BLE001
        log(f"gamut-guard tripwire failed: {e}")
        guard_fallbacks = {"error": f"{type(e).__name__}: {e}"}
    if diffs.get("host-fast", 99.0) >= 2.0:
        probes.pop("host-fast", None)  # outside even the golden tolerance

    if os.environ.get("PICHA_BENCH_TRY_DEVICE", "1") != "0":
        for config in ("gap4+device", "scan+device"):
            # each probe's watchdog is a slice of the remaining global
            # budget (VERDICT r4 #1): never let one cold remote compile
            # eat the format rows' share
            probe_t = min(600.0, (budget_left() - 240) * 0.4)
            if probe_t < 90:
                log(f"{config} probe SKIPPED: {budget_left():.0f}s left")
                continue
            code = (
                "import json, sys\n"
                "sys.path.insert(0, %r)\n"
                "from bench import make_test_images, bench_e2e\n"
                "bufs = make_test_images(%d, %d, %d)\n"
                "ips, d = bench_e2e(bufs, %d, %d, %d, rounds=6, config=%r,"
                " windows=2)\n"
                "print('RESULT ' + json.dumps(ips))\n"
                % (os.path.dirname(os.path.abspath(__file__)),
                   batch, 1920, 1088, batch, out_w, out_h, config))
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", code], env=dict(os.environ),
                    capture_output=True, text=True, timeout=probe_t)
                for line in proc.stdout.splitlines():
                    if line.startswith("RESULT "):
                        probes[config] = round(
                            _json.loads(line[len("RESULT "):]), 1)
            except subprocess.TimeoutExpired:
                log(f"{config} probe timed out (remote compile)")
            except Exception as e:  # noqa: BLE001
                log(f"{config} probe failed: {type(e).__name__}: {e}")
    log(f"e2e config probes (img/s): {probes}")

    # strict pool: everything except configs that measured >1 LSB
    # (device chains run the fused composed operator + byte-exact
    # entropy coding — held ≤1 LSB by bench_tpu_parity and tests)
    strict = {c: v for c, v in probes.items() if diffs.get(c, 0.0) <= 1.0}
    # hostile admission gate (VERDICT r4 #6), for EVERY candidate, not
    # just host-fast: a config whose hostile-content parity exceeds the
    # sub-LSB-dust re-encode floor is doing something worse than
    # quantisation amplification and cannot carry the headline, however
    # fast its probe. Enforced by exclusion so a future draft-path
    # change that drifts past the floor demotes the config instead of
    # silently publishing it.
    hostile_excluded = []
    if hostile_floor is not None:
        for hc, par in sorted(hostile_parity.items()):
            if hc in strict and par > hostile_floor:
                log(f"{hc} EXCLUDED from the strict pool: hostile "
                    f"parity {par} LSB > re-encode floor {hostile_floor}")
                strict.pop(hc)
                hostile_excluded.append(hc)
    if not strict:
        violations.append("no strict-parity config available")
        return 0.0, {"config_probes_img_s": probes}, violations
    # among configs within probe noise (2%) of the fastest, prefer the
    # one with the tighter MEASURED parity — a 0.1% probe-speed edge is
    # not worth publishing the config with more corpus divergence.
    # Configs without a parity measurement this run (device chains,
    # whose ≤1 LSB is held by tests) rank at the admissibility bound
    # 1.0, so the absence of a measurement never wins a tie-break.
    best_ips = max(strict.values())
    near = [c for c in strict if strict[c] >= 0.98 * best_ips]
    winner = min(near, key=lambda c: (diffs.get(c, 1.0), -strict[c]))
    # device winners: 3 windows x 20 rounds + warmup = 61 dispatches,
    # below the 96-window pool's distinct ring positions. Host winners
    # use SHORT windows, many of them: a 20-round (~1.8 s) window on
    # this box almost always absorbs a steal burst (observed: probes at
    # 6 rounds hit 123.8 img/s while the 20-round final published
    # 108.8), so the steal-free estimate needs windows shorter than the
    # typical inter-burst gap.
    # Budget-tight path (VERDICT r4 #1): the probes above already raced
    # every config under the same steal controls — reuse the winner's
    # probe instead of re-racing when the clock is short.
    if budget_left() < 180 + EMIT_RESERVE_S:
        log(f"final race SKIPPED ({budget_left():.0f}s left) — "
            f"publishing {winner}'s probe result")
        ips, d = strict[winner], {"e2e_config": winner,
                                  "e2e_from_probe": True}
    elif "+" in winner:
        ips, d = bench_e2e(bufs, batch, out_w, out_h, rounds=20,
                           config=winner, windows=3)
    else:
        ips, d = bench_e2e(bufs, batch, out_w, out_h, rounds=8,
                           config=winner, windows=8)
    # cross-check the final race against the winner's own probe: when
    # every final window lands >20% below a rate this same config
    # demonstrated minutes earlier, the race was externally loaded in a
    # way the steal counter can't see (observed: another process on the
    # core made 8 windows AGREE at 64 img/s while the probe had
    # measured 126.5 — corroboration alone can't catch consistent
    # contention). One bounded retry; if the slowness persists it is
    # real and publishes.
    if ips < 0.8 * strict[winner] and budget_left() > 120 + EMIT_RESERVE_S:
        log(f"final race {ips:.1f} img/s fell >20% below this config's "
            f"own probe {strict[winner]:.1f} — external load suspected, "
            f"re-running once")
        if "+" in winner:
            ips2, d2 = bench_e2e(bufs, batch, out_w, out_h, rounds=20,
                                 config=winner, windows=3)
        else:
            ips2, d2 = bench_e2e(bufs, batch, out_w, out_h, rounds=8,
                                 config=winner, windows=8)
        if ips2 > ips:
            ips, d = ips2, d2
    d["config_probes_img_s"] = probes
    d["config_parity_lsb"] = {k: round(v, 3) for k, v in diffs.items()}
    if hostile_parity:
        d["hostile_parity_lsb"] = hostile_parity
    if hostile_floor is not None:
        d["hostile_reencode_floor_lsb"] = hostile_floor
        d["hostile_gate_excluded"] = hostile_excluded
    if fast_trips:
        d["fast_guard_trips"] = fast_trips
    if guard_fallbacks:
        d["raw_guard_fallbacks"] = guard_fallbacks
        if guard_fallbacks.get("corpus", 0) > 0:
            violations.append(
                f"gamut guard tripped on {guard_fallbacks['corpus']} "
                f"bench-corpus images — host-raw would quietly run the "
                f"staged path")
    fastest_any = max(probes, key=probes.get)
    d["fastest_any_config"] = fastest_any
    d["fastest_any_img_s"] = probes[fastest_any]
    return ips, d, violations


def bench_device_roofline(bufs, batch, out_w, out_h, mpix, iters=6,
                          restart=8):
    """Chip-bound roofline (the number production hosts would see):
    the ENTIRE decode->resize->encode loop on device — scan bytes
    resident -> TPU Huffman decode (ops/jpeg_huffman_decode_tpu.py,
    restart corpora take the Jacobi-free single-pass kernel) -> fused
    dequant+IDCT+upsample+resize -> TPU Huffman encode -> scan bytes
    resident. No tunnel, no host, inside the measured window; timing
    forced by a dependent readback of the last output. Parity of the
    produced JPEGs vs the strict host path is enforced (<=1 LSB).

    Returns (mpix_per_s, parity_lsb, used_single_pass)."""
    import jax

    from picha_tpu.native import lib as native
    from picha_tpu.pipeline import JpegBatchPipeline

    # corpus prep: restart markers make entropy decode exactly
    # parallel-decodable (the standard prep for accelerator decoding;
    # ~1-2% file size). restart=0 measures the speculative decoder.
    if restart:
        corpus = [native.jpeg_encode(
            native.jpeg_decode(b, 3, 1920, 1088), 85, restart=restart)
            for b in bufs[:batch]]
    else:
        corpus = [bytes(b) for b in bufs[:batch]]
    p = JpegBatchPipeline(width=out_w, height=out_h, encode_quality=85,
                          encode_backend="device", fused=True,
                          upload="scan")
    # distinct device-resident wires (rotations share the static key),
    # so every timed dispatch presents fresh bytes — this platform may
    # memoize identical dispatches
    wires = []
    ks0 = sig0 = None
    single = False
    for r in range(3):
        rot = corpus[r:] + corpus[:r]
        cos = p.entropy_decode(rot)
        from picha_tpu.ops.jpeg_scan import ScanInfo

        if not isinstance(cos[0], ScanInfo):
            raise RuntimeError("scan path unavailable for corpus")
        sig, ks, args = p.stack_bucket(cos)
        if ks0 is None:
            sig0, ks0 = sig, ks
        elif ks != ks0:
            continue  # rotation changed the bucketed key; skip it
        wires.append([jax.device_put(a) for a in args])
    single = bool(ks0[-2])  # ScanBatch.static_key()'s single_pass flag
    # warm + parity: run once, assemble JPEGs, compare vs strict host
    res, okf = p.run_bucket(sig0, wires[0], scan_ks=ks0)
    if not bool(np.asarray(okf)):
        raise RuntimeError("device decoder did not converge")
    jpegs = p.scan_finish(res, sig0)
    pn = JpegBatchPipeline(width=out_w, height=out_h, encode_quality=85,
                           encode_backend="host")
    diffs = []
    for got_b, ref_b in zip(jpegs, pn.host_encode_batch(corpus)):
        got = native.jpeg_decode(bytes(got_b), 3, out_w, out_h)
        ref = native.jpeg_decode(bytes(ref_b), 3, out_w, out_h)
        diffs.append(np.abs(got.astype(int) - ref.astype(int)).mean())
    parity = float(np.mean(diffs))

    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        r, _ok = p.run_bucket(sig0, wires[i % len(wires)], scan_ks=ks0)
        outs.append(r)
    np.asarray(outs[-1][1])  # dependent readback: byte counts
    dt = (time.perf_counter() - t0) / iters
    return batch / dt * mpix, parity, single


def bench_train_ingest(bufs, batch, rounds=10):
    """Training-input ingest (BASELINE config 5): JPEG bytes ->
    normalized 224x224 float batches resident on device — no readback."""
    import jax

    from picha_tpu.pipeline import JpegBatchPipeline

    p = JpegBatchPipeline(width=224, height=224, normalize=True, fused=True,
                          upload="gap4")
    out = p(bufs[:batch])
    np.asarray(out[0, :2, 0])  # force
    t0 = time.perf_counter()
    outs = []
    for _ in range(rounds):
        _, dev = p._stage_device(p.entropy_decode(bufs[:batch]))
        outs.append(dev)
    np.asarray(outs[-1][0, :2, 0])  # dependent readback forces the stream
    dt = time.perf_counter() - t0
    return batch * rounds / dt


def bench_train_crop_ingest(bufs, batch, rounds=8):
    """The TRUE config-5 shape: JPEG bytes -> random 224-crop -> resize
    224 -> normalized device-resident batches via TrainingInput, whose
    DCT-domain ROI pre-crop packs/uploads only the iMCU region around
    each window (~25x fewer wire bytes on 1080p sources than the
    decode-everything path)."""
    from picha_tpu.pipeline.training import TrainingInput

    ti = TrainingInput(list(bufs), batch=batch, crop=224, size=224, seed=0)
    b = next(ti)
    np.asarray(b[0, :2, 0])  # warm + force
    t0 = time.perf_counter()
    outs = [next(ti) for _ in range(rounds)]
    np.asarray(outs[-1][0, :2, 0])  # dependent readback
    return batch * rounds / (time.perf_counter() - t0)


def bench_host_stage(bufs, batch, out_w, out_h, iters=3):
    """All host-side CPU work per batch (entropy decode + gap4 sparse
    pack + raw420 re-encode) — the serial-core roofline term."""
    from picha_tpu.pipeline import JpegBatchPipeline

    p = JpegBatchPipeline(width=out_w, height=out_h, encode_quality=85,
                          encode_backend="raw420", fused=True,
                          upload="gap4")
    hp, wp = (out_h + 15) & ~15, (out_w + 15) & ~15
    planes = np.full((batch, hp * wp + 2 * (hp // 2) * (wp // 2)), 128,
                     np.uint8)

    def window():
        t0 = time.perf_counter()
        for _ in range(iters):
            cos = p.entropy_decode(bufs[:batch])
            sig, ks, args = p.stack_bucket(cos)
            p.raw420_encode(planes, sig)
        return batch * iters, time.perf_counter() - t0

    window()  # warm
    return best_window(window, windows=2)[0]


def bench_tpu_parity(bufs):
    """Real-chip smoke parity: fused gap8 TPU decode vs host libjpeg,
    must stay within 1 LSB average (CLAUDE.md invariant)."""
    from picha_tpu.native import lib as native
    from picha_tpu.pipeline import JpegBatchPipeline

    p = JpegBatchPipeline(fused=True, upload="gap8")
    got = np.asarray(p(bufs[:2]))
    w, h, _ = native.jpeg_stat(bufs[0])
    diffs = []
    for i in range(2):
        want = native.jpeg_decode(bufs[i], 3, w, h)
        diffs.append(np.abs(got[i].astype(int) - want.astype(int)).mean())
    return max(diffs)


def bench_entropy(bufs, batch, iters=4):
    from picha_tpu.pipeline import JpegBatchPipeline

    p = JpegBatchPipeline()
    p.entropy_decode(bufs[:2])  # warm

    def window():
        t0 = time.perf_counter()
        for _ in range(iters):
            p.entropy_decode(bufs[:batch])
        return batch * iters, time.perf_counter() - t0

    return best_window(window, windows=2)[0]


def bench_entropy_native(bufs, iters=4):
    """Segment-parallel native decoder (jpegentropy.cc) single-thread
    img/s on the bench corpus — the per-thread rate production hosts
    multiply by their core count for narrow batches (this box has one
    core, so only the 1-thread point is measurable here). Returns None
    when the corpus has no restart segments (the decoder then defers to
    libjpeg by design)."""
    from picha_tpu.native import lib as native
    from picha_tpu.ops.jpeg_scan import parse_baseline

    # the main corpus is restart-free; author restart variants the way
    # the device-only roofline does (same pixels, DRI=8)
    def reencode(b):
        w, h, _ = native.jpeg_stat(bytes(b))
        return native.jpeg_encode(native.jpeg_decode(bytes(b), 3, w, h),
                                  85, restart=8)

    rbufs = [reencode(b) for b in bufs[:4]]
    infos = [parse_baseline(bytes(b)) for b in rbufs]
    infos = [i for i in infos if i is not None and len(i.segments) > 1]
    if not infos:
        return None
    native.jpeg_entropy_decode(infos[0], nthreads=1)  # warm

    def window():
        t0 = time.perf_counter()
        for _ in range(iters):
            for i in infos:
                native.jpeg_entropy_decode(i, nthreads=1)
        return len(infos) * iters, time.perf_counter() - t0

    return best_window(window, windows=2)[0]


def bench_png_e2e(bufs, out_w, out_h, n=10):
    """BASELINE config 1: PNG decode -> resize -> PNG encode.

    Lossless both ways, so unlike JPEG's host-fast there is no quality
    axis — every deflate level / filter strategy produces a bit-exact
    round-trip PNG. The bench races the libpng-default settings
    (level 6, adaptive 5-filter search — what the reference's
    pngcodec.cc:361-399 did) against a throughput config (level 1,
    fixed Paeth filter, both surfaced as encode options) and reports
    the winner, plus a stage decomposition and the size cost.

    Returns (img/s winner, detail dict)."""
    import zlib

    import picha_tpu as picha
    from picha_tpu.codecs import png as png_codec
    from picha_tpu.native import lib as native
    from picha_tpu.ops.resize import _resize_native, parse_resize_options

    pngs = []
    for b in bufs[: max(2, n // 3)]:
        img = picha.decodeJpegSync(b)
        pngs.append(picha.encodePngSync(img))

    # ---- stage decomposition (one representative image) -------------
    buf = pngs[0]
    h = png_codec._parse_header(buf)
    idat = b"".join(d for t, d in png_codec._parse_chunks(buf)
                    if t == b"IDAT")
    fname, fscale = parse_resize_options({})
    stages = {}
    # time the shipped inflate path (libdeflate when built in, zlib
    # fallback otherwise) so the decomposition matches the codec
    expected = h.height * (h.width * 3 + 1)
    t0 = time.perf_counter()
    raw = native.zlib_inflate(idat, expected)
    stages["inflate_ms"] = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    plane = png_codec._unfilter_to_plane(raw, h.width, h.height, 3,
                                         h.bit_depth)
    stages["unfilter_ms"] = (time.perf_counter() - t0) * 1e3
    arr = plane.reshape(h.height, h.width, 3)
    _resize_native(arr, out_w, out_h, fname, fscale)  # warm weight cache
    t0 = time.perf_counter()
    small = _resize_native(arr, out_w, out_h, fname, fscale)
    stages["resize_ms"] = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    filt_adapt = native.png_filter(np.ascontiguousarray(small), out_h,
                                   out_w * 3, 3, -1)
    stages["filter_adaptive_ms"] = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    filt_fixed = native.png_filter(np.ascontiguousarray(small), out_h,
                                   out_w * 3, 3, 4)
    stages["filter_paeth_ms"] = (time.perf_counter() - t0) * 1e3
    _deflate = native.zlib_deflate

    t0 = time.perf_counter()
    z6 = _deflate(filt_adapt, 6)
    stages["deflate_l6_ms"] = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    z1 = _deflate(filt_fixed, 1)
    stages["deflate_l1_ms"] = (time.perf_counter() - t0) * 1e3
    stages = {k: round(v, 2) for k, v in stages.items()}
    size_cost = len(z1) / max(1, len(z6))

    # ---- config race ------------------------------------------------
    # default (round 5): deflate-probed filter selection + libdeflate
    # level 4 — measured 0.98-1.01x the libpng-default size (the probe
    # picks the filter deflate actually prefers; the MSD heuristic's
    # paeth/avg mix ran 1-5% LARGER) while encoding ~2.3x faster and
    # producing streams that also DECODE faster (UP-heavy filters
    # unfilter at SIMD speed). `quality` is the libpng-parity point
    # (exact reference defaults: MSD-adaptive + level 6) and serves as
    # the honest SIZE BASELINE for the ≤+2% admission below. Multi-core
    # hosts additionally get the pigz-style parallel deflate; on this
    # 1-core box deflateThreads=1 is the serial libdeflate path.
    import os as _os

    nthr = _os.cpu_count() or 1
    configs = {
        "default": ({"deflateThreads": nthr} if nthr > 1 else {}),
        "quality": {"compressionLevel": 6, "filterStrategy": -1},
        "fast": {"compressionLevel": 1, "filter_strategy": 4},
    }
    rates, sizes = {}, {}
    for name, opts in configs.items():
        szs = []
        for p in pngs:
            sm0 = picha.resizeSync(picha.decodePngSync(p),
                                   {"width": out_w, "height": out_h})
            szs.append(len(picha.encodePngSync(sm0, opts)))
        sizes[name] = float(np.mean(szs))

        def window():
            t0 = time.perf_counter()
            for i in range(n):
                img = picha.decodePngSync(pngs[i % len(pngs)])
                sm = picha.resizeSync(img, {"width": out_w, "height": out_h})
                picha.encodePngSync(sm, opts)
            return n, time.perf_counter() - t0

        rates[name] = round(best_window(window, windows=2)[0], 2)

    # PIL stand-in doing the same work (decode->resize->save level 6)
    import io as _io

    from PIL import Image as PILImage

    def pil_window():
        t0 = time.perf_counter()
        for i in range(max(2, n // 2)):
            im = PILImage.open(_io.BytesIO(pngs[i % len(pngs)]))
            im = im.resize((out_w, out_h), PILImage.BICUBIC)
            o = _io.BytesIO()
            im.save(o, format="PNG")
        return max(2, n // 2), time.perf_counter() - t0

    pil_ips = best_window(pil_window, windows=2)[0]

    # headline policy (same as webp): the fastest config whose output
    # stays within 2% of the libpng-parity (`quality`) size;
    # byte-costlier configs ride alongside in png_configs_img_s, never
    # on top
    size_ok = {c for c in rates
               if sizes[c] <= sizes["quality"] * 1.02}
    win = max(size_ok, key=rates.get)
    detail = {"png_configs_img_s": rates, "png_e2e_config": win,
              "png_config_size_ratio": {
                  c: round(sizes[c] / sizes["quality"], 3) for c in rates},
              "png_stage_ms": stages,
              "png_zlib_backend": ("libdeflate" if native.have_libdeflate()
                                   else "zlib"),
              "png_fast_size_ratio": round(size_cost, 3),
              "png_pil_standin_img_s": round(pil_ips, 2)}
    return rates[win], detail


def bench_config4(n=256):
    """BASELINE config 4: 256-image batched decode -> subView crop ->
    resize -> encodeWebP (alpha, preset) / encodeTiff lzw, through
    ImageBatchPipeline. The transform graph runs on the CPU backend
    here — a 256-image RGBA batch through this environment's tunnel
    costs more than the whole pipeline (PERFORMANCE.md) — and on the
    chip on production hosts. PIL stand-ins do the same work.

    Returns dict of {webp,tiff}_e2e_mpix_s + stand-ins."""
    import io as _io

    from PIL import Image as PILImage

    import picha_tpu as picha
    from picha_tpu.pipeline import ImageBatchPipeline

    W, H = 384, 256
    rng = np.random.default_rng(9)
    srcs = []
    for i in range(8):
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        base = 127 + 70 * np.sin(xx / (11 + i)) + 40 * np.cos(yy / (7 + i))
        a = np.clip(np.stack(
            [base, 255 - base, base * 0.5 + 60,
             np.full_like(base, 255) - (xx + yy) % 17], -1)
            + rng.normal(0, 4, (H, W, 4)), 0, 255).astype(np.uint8)
        srcs.append(picha.Image.from_array(a, "rgba"))
    webps = [picha.encodeWebPSync(im, {"preset": "picture", "quality": 90})
             for im in srcs]
    tiffs = [picha.encodeTiffSync(im, {"compression": "lzw"})
             for im in srcs]
    mpix_total = n * W * H / 1e6

    out = {}
    for name, corpus, encs in (
            # webp default (round 5): method 3 — measured ~1.1x the
            # libwebp-default e2e at +3.7% bytes, identical round-trip
            # diff, bit-exact alpha (the alpha coder's effort follows
            # `method` and is ~64% of the RGBA encode cost;
            # codecs/webp.py docstring). `reference` is the exact
            # libwebp-default point (method 4, the PIL stand-in's
            # settings) and anchors the ≤+5% size gate; fast (method 0)
            # rides alongside at ~+27% bytes. All gated on the
            # reference's own lossy oracle (test/webp_codec.js: <8 LSB).
            ("webp", webps, {
                "default": ("image/webp", {"quality": 85}),
                "reference": ("image/webp", {"quality": 85, "method": 4}),
                "fast": ("image/webp", {"quality": 85, "method": 0})}),
            ("tiff", tiffs, {
                "default": ("image/tiff", {"compression": "lzw"})})):
        bufs = [corpus[i % len(corpus)] for i in range(n)]
        mt = "image/webp" if name == "webp" else "image/tiff"
        # quality gate ground truth: the exact crop+resize pixels via
        # the single-image API (what the pipeline computes pre-encode).
        # Only the webp race consumes these — skip the work otherwise.
        refs = []
        if len(encs) > 1:
            for b in bufs[:4]:
                im = picha.decodeSync(bytes(b))
                v = im.sub_view(16, 16, W - 32, H - 32)
                refs.append(picha.resizeSync(v, {"width": 176,
                                                 "height": 112}))
        configs, sizes, diffs = {}, {}, {}
        for cname, enc in encs.items():
            # backend='host': crop view + native AVX2 resize per image —
            # the deployable winner on this box (the XLA:CPU graph
            # measured 13x slower/img; a 256-image RGBA round trip
            # through the tunnel costs more than the whole pipeline)
            p = ImageBatchPipeline(crop=(16, 16, W - 32, H - 32),
                                   resize=(176, 112), encode=enc,
                                   backend="host")
            outs8 = p(bufs[:8], mimetype=mt)  # warm caches
            sizes[cname] = sum(len(o) for o in outs8)
            if name == "webp":
                d = [picha.decodeSync(o).avg_channel_diff(refs[i])
                     for i, o in enumerate(outs8[:4])]
                diffs[cname] = round(sum(d) / len(d), 2)

            def window(p=p):
                t0 = time.perf_counter()
                outs = p(bufs, mimetype=mt)
                assert len(outs) == n
                return mpix_total, time.perf_counter() - t0

            configs[cname] = round(best_window(window, windows=2)[0], 1)
        admissible = {c: v for c, v in configs.items()
                      if diffs.get(c, 0.0) < 8.0}  # reference oracle
        if not admissible:
            # even the default config failed the reference's own lossy
            # oracle — report its rate anyway (this row isn't the
            # parity-gated headline) but flag the failure loudly so the
            # regression is visible in the JSON, not a crash
            out[f"{name}_quality_oracle_failed"] = diffs
            admissible = {"default": configs["default"]}
        winner = max(admissible, key=admissible.get)
        if len(configs) > 1:
            # honest headline: a faster config that pays >5% bytes over
            # the libwebp-default (`reference`) size is not the same
            # job — it rides alongside, never on top
            base = sizes.get("reference", sizes["default"])
            ratios = {c: round(sizes[c] / base, 3) for c in configs}
            size_ok = [c for c in admissible if ratios[c] <= 1.05]
            if size_ok:
                winner = max(size_ok, key=admissible.get)
            out[f"{name}_configs_mpix_s"] = configs
            out[f"{name}_e2e_config"] = winner
            out[f"{name}_config_diff_lsb"] = diffs
            out[f"{name}_config_size_ratio"] = ratios
        out[f"{name}_e2e_mpix_s"] = admissible[winner]

        # PIL stand-in: same decode->crop->resize->encode, same formats
        def pil_window():
            t0 = time.perf_counter()
            for i in range(n // 4):
                im = PILImage.open(_io.BytesIO(bufs[i]))
                im = im.crop((16, 16, W - 16, H - 16)).resize(
                    (176, 112), PILImage.BICUBIC)
                o = _io.BytesIO()
                if name == "webp":
                    im.save(o, format="WEBP", quality=85)
                else:
                    im.save(o, format="TIFF", compression="tiff_lzw")
            return mpix_total / 4, time.perf_counter() - t0

        out[f"{name}_pil_standin_mpix_s"] = round(
            best_window(pil_window, windows=2)[0], 1)
    return out


def bench_config23(out_w, out_h, n=12):
    """BASELINE configs 2 and 3: the CMYK JPEG round-trip with colour
    convert (decode -> rgb fold -> lanczos downscale -> encode q85) and
    the 16-bit deep path (deep PNG decode -> catmulrom resize -> grey16
    convert). Both host-side; PIL stand-in for the CMYK leg."""
    import io as _io

    from PIL import Image as PILImage

    import picha_tpu as picha

    W, H = BENCH_W, BENCH_H
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 127 + 70 * np.sin(xx / 23) + 50 * np.cos(yy / 17)
    rgbish = np.clip(np.stack(
        [base, 255 - base, base * 0.6 + 50], -1)
        + rng.normal(0, 5, (H, W, 3)), 0, 255).astype(np.uint8)
    pim = PILImage.fromarray(rgbish, "RGB").convert("CMYK")
    o = _io.BytesIO()
    pim.save(o, format="JPEG", quality=90)
    cmyk = o.getvalue()

    deep = (rng.integers(0, 65536, (H // 2, W // 2, 4))
            .astype(np.uint16))
    deep_png = picha.encodePngSync(
        picha.Image.from_array(deep, "r16g16b16a16"))

    out = {}

    def window2():
        t0 = time.perf_counter()
        for _ in range(n):
            img = picha.decodeJpegSync(cmyk)  # CMYK folds to rgb
            sm = picha.resizeSync(img, {"width": out_w, "height": out_h,
                                        "filter": "lanczos"})
            picha.encodeJpegSync(sm, {"quality": 85})
        return n * W * H / 1e6, time.perf_counter() - t0

    picha.decodeJpegSync(cmyk)
    out["cmyk_e2e_mpix_s"] = round(best_window(window2, windows=2)[0], 1)

    def window2_pil():
        t0 = time.perf_counter()
        for _ in range(max(2, n // 2)):
            im = PILImage.open(_io.BytesIO(cmyk)).convert("RGB")
            im = im.resize((out_w, out_h), PILImage.LANCZOS)
            oo = _io.BytesIO()
            im.save(oo, format="JPEG", quality=85)
        return max(2, n // 2) * W * H / 1e6, time.perf_counter() - t0

    out["cmyk_pil_standin_mpix_s"] = round(
        best_window(window2_pil, windows=2)[0], 1)

    def window3():
        t0 = time.perf_counter()
        for _ in range(n):
            img = picha.decodePngSync(deep_png, {"deep": True})
            sm = picha.resizeSync(img, {"width": out_w // 2,
                                        "height": out_h // 2,
                                        "filter": "catmulrom"})
            picha.colorConvertSync(sm, {"pixel": "r16"})
        return n * (W // 2) * (H // 2) / 1e6, time.perf_counter() - t0

    picha.decodePngSync(deep_png, {"deep": True})
    out["deep16_mpix_s"] = round(best_window(window3, windows=2)[0], 1)

    # stand-in denominator for config 3: the same decode->resize->grey
    # job through PIL. PIL cannot do this at 16 bits — it silently
    # truncates a 16-bit RGBA PNG to uint8 on open (mode 'RGBA') — so
    # the stand-in runs at HALF the fidelity of the measured path;
    # the ratio is therefore a floor on the real advantage.
    def window3_pil():
        t0 = time.perf_counter()
        for _ in range(n):
            im = PILImage.open(_io.BytesIO(bytes(deep_png)))
            im = im.resize((out_w // 2, out_h // 2), PILImage.BICUBIC)
            im.convert("L")
        return n * (W // 2) * (H // 2) / 1e6, time.perf_counter() - t0

    out["deep16_pil_standin_mpix_s"] = round(
        best_window(window3_pil, windows=2)[0], 1)
    out["deep16_standin_fidelity"] = "8-bit (PIL truncates 16-bit PNG)"
    if out["deep16_pil_standin_mpix_s"]:
        out["deep16_vs_standin"] = round(
            out["deep16_mpix_s"] / out["deep16_pil_standin_mpix_s"], 2)
    return out


def bench_single_latency(buf, out_w, out_h, reps=15):
    # median of 15: steal bursts hit a minority of reps (measured), so
    # the median is the no-contention latency. Returns (staged p50,
    # one-call transcode p50) — the latter is the public
    # transcodeJpegSync fast path.
    import picha_tpu as picha

    picha.encodeJpegSync(
        picha.resizeSync(picha.decodeJpegSync(buf),
                         {"width": out_w, "height": out_h}), {"quality": 85})
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        img = picha.decodeJpegSync(buf)
        small = picha.resizeSync(img, {"width": out_w, "height": out_h})
        picha.encodeJpegSync(small, {"quality": 85})
        lat.append((time.perf_counter() - t0) * 1e3)
    # separate failure fate: a transcode-path error must not discard
    # the independently measured staged p50
    try:
        topts = {"width": out_w, "height": out_h, "quality": 85}
        picha.transcodeJpegSync(buf, topts)
        tlat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            picha.transcodeJpegSync(buf, topts)
            tlat.append((time.perf_counter() - t0) * 1e3)
        t50 = statistics.median(tlat)
    except Exception as e:  # noqa: BLE001
        log(f"transcode p50 FAILED: {type(e).__name__}: {e}")
        t50 = None
    return statistics.median(lat), t50


def bench_cpu_standin(bufs, out_w, out_h, n=24):
    """The vs_baseline denominator gets the same steal-aware best-of-
    windows treatment as the headline — a denominator measured during a
    steal burst would inflate the ratio dishonestly."""
    from PIL import Image as PILImage

    def window():
        t0 = time.perf_counter()
        for i in range(n):
            im = PILImage.open(io.BytesIO(bufs[i % len(bufs)]))
            im = im.resize((out_w, out_h), PILImage.BICUBIC)
            out = io.BytesIO()
            im.save(out, format="JPEG", quality=85)
        return n, time.perf_counter() - t0

    return best_window(window, windows=3)[0]


# one corpus for every stage: the decomposition in `detail` is only
# comparable because the subprocess and main() measure the same batch
BENCH_W, BENCH_H = 1920, 1088
BENCH_BATCH = 16
BENCH_OUT_W, BENCH_OUT_H = 960, 544


def run_stage(name, fn, *a):
    try:
        return fn(*a)
    except Exception as e:  # noqa: BLE001 — flaky platform, keep going
        log(f"{name} FAILED: {type(e).__name__}: {e}")
        return None


def device_stages_main():
    """Everything that touches the TPU tunnel, run as a subprocess so a
    dead/hung tunnel (first-readback cold starts have exceeded 20 min;
    occasional ABORTED) can be timed out by main() instead of hanging
    the whole bench. Prints a DEVJSON snapshot after EVERY stage — a
    hang in stage N costs stages N.. only; main() keeps the last
    snapshot."""
    import jax

    from picha_tpu.pipeline import JpegBatchPipeline

    W, H = BENCH_W, BENCH_H
    mpix = W * H / 1e6
    batch = BENCH_BATCH
    bufs = make_test_images(batch, W, H)
    out_w, out_h = BENCH_OUT_W, BENCH_OUT_H
    detail = {}
    violations = []

    def snapshot():
        print("DEVJSON " + json.dumps({"detail": detail,
                                       "violations": violations}),
              flush=True)

    # this subprocess gets its own deadline slice from main() so it can
    # skip late stages gracefully instead of being watchdog-killed
    dev_t0 = time.monotonic()
    dev_deadline = float(os.environ.get("PICHA_BENCH_DEV_DEADLINE_S", "1e9"))

    def stage(name, fn, *a, est_s=30):
        left = dev_deadline - (time.monotonic() - dev_t0)
        if left < est_s:
            log(f"{name} SKIPPED (device budget: {left:.0f}s < ~{est_s}s)")
            detail.setdefault("skipped_device", []).append(name)
            return None
        return run_stage(name, fn, *a)

    # warm the device->host path once (first readback on this tunnel can
    # take minutes; everything after is fast)
    stage("link warmup", lambda: np.asarray(
        jax.device_put(np.zeros(1024 * 1024, np.uint8))), est_s=0)

    link = stage("link", measure_link)
    if link:
        detail["link_up_MBps"] = round(link[0], 1)
        detail["link_down_MBps"] = round(link[1], 1)
        log(f"link bandwidth: up {link[0]:.0f} MB/s, down {link[1]:.1f} MB/s")
    snapshot()

    roof = stage("device-only roofline", bench_device_roofline, bufs,
                 batch, out_w, out_h, mpix, est_s=60)
    if roof:
        roof_mpix, roof_parity, roof_single = roof
        detail["device_only_mpix_s"] = round(roof_mpix, 1)
        detail["device_only_parity_lsb"] = round(roof_parity, 3)
        detail["device_only_single_pass"] = roof_single
        log(f"device-only roofline (scan->TPU huffdec->fused->TPU "
            f"huffenc->scan, restart corpus, "
            f"{'single-pass' if roof_single else 'chunked'}): "
            f"{roof_mpix:.0f} Mpix/s, parity {roof_parity:.3f} LSB")
        if roof_parity > 1.0:
            violations.append(
                f"device-only roofline parity {roof_parity:.3f} LSB > 1.0")
    snapshot()

    # the same loop on the corpus AS-IS (no restart markers — what wild
    # JPEGs look like): the chunked speculative decoder's number. The
    # restart row above is the best case; this row keeps the device
    # story honest (VERDICT r3 "what's missing" #2).
    roof_nr = stage("device-only roofline (no restart)",
                    bench_device_roofline, bufs, batch, out_w, out_h,
                    mpix, 6, 0)
    if roof_nr:
        nr_mpix, nr_parity, nr_single = roof_nr
        detail["device_only_norestart_mpix_s"] = round(nr_mpix, 1)
        detail["device_only_norestart_parity_lsb"] = round(nr_parity, 3)
        log(f"device-only roofline (NO restart markers, "
            f"{'single-pass' if nr_single else 'chunked'} decoder): "
            f"{nr_mpix:.0f} Mpix/s, parity {nr_parity:.3f} LSB")
        if nr_parity > 1.0:
            violations.append(
                f"no-restart roofline parity {nr_parity:.3f} LSB > 1.0")
    snapshot()

    train_ips = stage("train ingest", bench_train_ingest, bufs, batch)
    if train_ips:
        detail["train_ingest_mpix_s"] = round(train_ips * mpix, 1)
        log(f"training-input ingest (decode+resize 224+normalize, on-device): "
            f"{train_ips:.1f} img/s ({train_ips * mpix:.0f} Mpix/s)")
    snapshot()

    crop_ips = stage("train crop ingest", bench_train_crop_ingest, bufs,
                     batch)
    if crop_ips:
        detail["train_crop_ingest_mpix_s"] = round(crop_ips * mpix, 1)
        log(f"training-input RANDOM-CROP ingest (TrainingInput, DCT-ROI "
            f"pre-crop): {crop_ips:.1f} img/s "
            f"({crop_ips * mpix:.0f} source Mpix/s)")
    snapshot()

    parity = stage("tpu parity", bench_tpu_parity, bufs)
    if parity is not None:
        detail["tpu_host_avg_diff_lsb"] = round(float(parity), 3)
        log(f"TPU fused decode vs host libjpeg: avg diff {parity:.3f} LSB "
            f"({'OK' if parity <= 1.0 else 'VIOLATION'} of <=1 LSB invariant)")
        if parity > 1.0:
            violations.append(
                f"TPU fused decode parity {parity:.3f} LSB > 1.0")
    snapshot()

    def tpu_stage(fused):
        p = JpegBatchPipeline(width=out_w, height=out_h)
        cos = p.entropy_decode(bufs[:batch])
        sig, args = p.stack_bucket(cos)
        dargs = [jax.device_put(a) for a in args]
        return bench_tpu_stage(p, sig, dargs, batch, mpix, fused=fused)

    tpu_ips = stage("tpu pixel stage (fused)", tpu_stage, True)
    if tpu_ips:
        detail["tpu_fused_stage_mpix_s"] = round(tpu_ips * mpix, 1)
        log(f"TPU fused stage (dequant+IDCT+upsample+resize as 2 matmuls/comp "
            f"+ YCbCr + pack): {tpu_ips:.1f} img/s ({tpu_ips * mpix:.0f} Mpix/s)")
    snapshot()

    staged_ips = stage("tpu pixel stage (staged)", tpu_stage, False)
    if staged_ips:
        detail["tpu_staged_stage_mpix_s"] = round(staged_ips * mpix, 1)
        log(f"TPU staged stage: {staged_ips:.1f} img/s "
            f"({staged_ips * mpix:.0f} Mpix/s)")
    snapshot()


def stage_budgeted(detail, name, est_s, fn, *a):
    """run_stage gated on the global deadline: a stage whose estimated
    cost doesn't fit in the remaining budget is skipped and recorded
    (VERDICT r4 #1 — skip what doesn't fit, never blow the deadline)."""
    left = budget_left()
    if left < est_s + EMIT_RESERVE_S:
        log(f"{name} SKIPPED: {left:.0f}s left < ~{est_s}s estimated")
        detail.setdefault("skipped", []).append(name)
        return None
    return run_stage(name, fn, *a)


def main():
    import atexit
    import os
    import signal
    import subprocess
    import sys

    W, H = BENCH_W, BENCH_H
    mpix = W * H / 1e6
    batch = BENCH_BATCH
    bufs = make_test_images(batch, W, H)
    log(f"generated {len(bufs)} jpegs, ~{len(bufs[0])//1024} KiB each; "
        f"deadline {BENCH_DEADLINE_S:.0f}s")

    out_w, out_h = BENCH_OUT_W, BENCH_OUT_H
    detail = _RESULT["detail"]
    violations = _RESULT["violations"]
    detail["host_cores"] = os.cpu_count() or 1

    # even a driver kill must yield the one parseable line: atexit for
    # normal/exception exits, SIGTERM for the `timeout` utility's kill
    atexit.register(emit_compact)

    def _on_term(signum, frame):  # noqa: ARG001
        emit_compact(reason=f"signal {signum}")
        os._exit(1)

    signal.signal(signal.SIGTERM, _on_term)

    def stage(name, est_s, fn, *a):
        return stage_budgeted(detail, name, est_s, fn, *a)

    # ---- 0. device liveness (cheap; a hard-down tunnel hangs instead
    # of erroring, so probe in a subprocess with a bounded wait) -------
    try_device = os.environ.get("PICHA_BENCH_TRY_DEVICE", "1") != "0"
    if try_device:
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                env=dict(os.environ),
                timeout=min(240, max(60, budget_left() * 0.15)),
                check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except Exception as e:  # noqa: BLE001 — timeout or rc != 0
            log(f"device liveness probe failed ({type(e).__name__}) — "
                f"tunnel down; skipping device stages, host rows only")
            try_device = False
            # keep the host paths off jax entirely: their cpu-device
            # helpers would initialize the backend stack and hang
            os.environ["PICHA_NO_DEVICE"] = "1"
            os.environ["PICHA_BENCH_TRY_DEVICE"] = "0"
            detail["device_unavailable"] = True
            # and pin every jit stage (png/webp/tiff/cmyk pipelines) to
            # XLA:CPU — no backend has initialized in this process yet,
            # so the switch is still possible; without it the first
            # device-placed jit would hang on the dead tunnel
            import jax

            jax.config.update("jax_platforms", "cpu")

    # ---- 1. the strict-parity e2e headline (the driver metric) ------
    # runs FIRST: whatever else the deadline eats, the value lands
    e2e_ips = None
    e2e = stage("e2e", 90, bench_e2e_best, bufs, batch, out_w, out_h)
    if e2e:
        e2e_ips, ebytes, e2e_violations = e2e
        violations.extend(e2e_violations)
        detail.update(ebytes)
        _RESULT["e2e_ips"] = e2e_ips
        log(f"e2e decode->resize->encode (pipelined): {e2e_ips:.1f} img/s "
            f"({e2e_ips * mpix:.0f} Mpix/s)")

    # ---- 2. the vs_baseline denominator (cheap, PIL-only) -----------
    cpu_ips = stage("cpu standin", 30, bench_cpu_standin, bufs, out_w, out_h)
    if cpu_ips:
        detail["cpu_standin_mpix_s"] = round(cpu_ips * mpix, 1)
        _RESULT["cpu_ips"] = cpu_ips
        log(f"CPU stand-in (PIL single-thread): {cpu_ips:.1f} img/s "
            f"({cpu_ips * mpix:.0f} Mpix/s)")

    # ---- 3. device rooflines + train ingest, watchdogged subprocess -
    # a hung tunnel costs the remaining device rows, not the artifact
    # (the subprocess snapshots DEVJSON after every stage; main keeps
    # the last snapshot). Its watchdog is a SLICE of the global budget:
    # at least ~360s is held back for the host-side format rows.
    if try_device:
        dev_budget = budget_left() - 360 - EMIT_RESERVE_S
        if dev_budget < 120:
            log(f"device stages SKIPPED: only {budget_left():.0f}s left")
            detail.setdefault("skipped", []).append("device stages")
        else:
            env = dict(os.environ)
            env["PICHA_BENCH_DEV_DEADLINE_S"] = str(int(dev_budget))
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--device-stages"],
                    env=env, timeout=dev_budget + 60, text=True,
                    stdout=subprocess.PIPE, stderr=sys.stderr)
            except subprocess.TimeoutExpired as te:
                log("device stages TIMED OUT (tunnel hung) — keeping rows "
                    "snapshotted before the hang")
                proc = te  # .stdout holds output captured before the kill
            except Exception as e:  # noqa: BLE001
                log(f"device stages failed: {type(e).__name__}: {e}")
                proc = None
            out_text = getattr(proc, "stdout", None) or ""
            if isinstance(out_text, bytes):
                out_text = out_text.decode(errors="replace")
            for line in out_text.splitlines():
                if line.startswith("DEVJSON "):
                    try:  # a timeout kill can truncate the last snapshot
                        dev = json.loads(line[len("DEVJSON "):])
                    except ValueError:
                        continue
                    detail.update(dev["detail"])
                    violations.extend(dev["violations"])

    # ---- 4. host-side stage decompositions ---------------------------
    host_ips = stage("host stage", 40, bench_host_stage, bufs, batch,
                     out_w, out_h)
    if host_ips:
        detail["host_stage_mpix_s"] = round(host_ips * mpix, 1)
        log(f"host stage (entropy + gap8 pack + raw420 encode): "
            f"{host_ips:.1f} img/s ({host_ips * mpix:.0f} Mpix/s)")
        link = (detail.get("link_up_MBps"), detail.get("link_down_MBps"))
        if all(link) and e2e_ips and detail.get("up_MB_per_batch"):
            up_ips = link[0] * batch / detail["up_MB_per_batch"]
            down_ips = link[1] * batch / detail["down_MB_per_batch"]
            roof = min(up_ips, down_ips, host_ips)
            detail["roofline_mpix_s"] = round(roof * mpix, 1)
            detail["achieved_vs_roofline"] = round(e2e_ips / roof, 2)
            log(f"roofline: up {up_ips:.1f} img/s, down {down_ips:.1f} "
                f"img/s, host {host_ips:.1f} img/s -> min {roof:.1f} img/s; "
                f"achieved {e2e_ips / roof:.0%}")

    entropy_ips = stage("entropy", 30, bench_entropy, bufs, batch)
    if entropy_ips:
        detail["host_entropy_mpix_s"] = round(entropy_ips * mpix, 1)
        log(f"host entropy decode: {entropy_ips:.1f} img/s "
            f"({entropy_ips * mpix:.0f} Mpix/s)")

    nat_ips = stage("entropy-native", 25, bench_entropy_native, bufs)
    if nat_ips:
        detail["host_entropy_native_1t_mpix_s"] = round(nat_ips * mpix, 1)
        log(f"native segment decoder (1 thread, restart corpus): "
            f"{nat_ips:.1f} img/s ({nat_ips * mpix:.0f} Mpix/s); "
            f"scales ~linearly with threads x segments on wide hosts")

    # ---- 5. format rows (configs 1-4) --------------------------------
    png = stage("png e2e", 75, bench_png_e2e, bufs, out_w, out_h)
    if png:
        png_ips, png_detail = png
        detail["png_e2e_mpix_s"] = round(png_ips * mpix, 1)
        detail.update(png_detail)
        log(f"PNG decode->resize->encode (config 1): {png_ips:.1f} img/s "
            f"({png_ips * mpix:.0f} Mpix/s) "
            f"[winner {png_detail['png_e2e_config']}, "
            f"configs {png_detail['png_configs_img_s']}, "
            f"stages {png_detail['png_stage_ms']}]")

    c4 = stage("config4 webp/tiff", 110, bench_config4)
    if c4:
        detail.update(c4)
        log(f"config 4 (256-img batched decode->crop->resize->encode): "
            f"webp {c4.get('webp_e2e_mpix_s')} Mpix/s "
            f"(PIL {c4.get('webp_pil_standin_mpix_s')}), "
            f"tiff {c4.get('tiff_e2e_mpix_s')} Mpix/s "
            f"(PIL {c4.get('tiff_pil_standin_mpix_s')})")

    c23 = stage("config2/3 cmyk+deep16", 60, bench_config23, out_w, out_h)
    if c23:
        detail.update(c23)
        log(f"config 2 (CMYK decode->rgb->lanczos->q85): "
            f"{c23.get('cmyk_e2e_mpix_s')} Mpix/s "
            f"(PIL {c23.get('cmyk_pil_standin_mpix_s')}); "
            f"config 3 (deep16 PNG->catmulrom->grey16): "
            f"{c23.get('deep16_mpix_s')} Mpix/s")

    # ---- 6. stand-in latency row --------------------------------------
    p50 = stage("latency", 20, bench_single_latency, bufs[0], out_w, out_h)
    if p50:
        detail["p50_ms_1080p"] = round(p50[0], 1)
        log(f"p50 single-image 1080p decode->resize->encode: {p50[0]:.1f} ms")
        if p50[1] is not None:
            detail["p50_transcode_ms_1080p"] = round(p50[1], 1)
            log(f"one-call transcodeJpegSync p50: {p50[1]:.1f} ms")

    emit_compact()
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    if "--device-stages" in sys.argv:
        device_stages_main()
    else:
        main()
