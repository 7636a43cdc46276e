"""Draft-decode correction: a separable 5-tap filter that maps the
libjpeg `scale_denom=2` output grid onto the reference cubic-resize
grid (src/resize.cc:19-50 weights, filterScale 0.70).

Why it exists: the draft path (jpeg_idct_4x4) and the strict path
(IDCT8 -> cubic downsample) are both linear operators on the DCT
coefficients, so their mismatch is a fixed linear operator too. Its
dominant separable component — fit by alternating least squares over a
mixed corpus (gratings, gradients, block edges, band-limited noise) at
1080p->2x, q85 — turns out to be a quarter-pixel phase shift plus a
mild sharpening:

    h ~ [0.000, 0.101, 0.556, 0.327, 0.011]       (per axis)

Applying it (two banded passes through the AVX2 native resizer,
picha_resize_u8 with identity-size windows) cuts the draft path's
deviation from the strict path roughly 3-4x on every content class
measured: bench-style gratings 1.14 -> 0.65 LSB, smooth gradients
0.41 -> 0.25, 32px block mosaics 5.78 -> 1.56, 4px band-limited noise
15.0 -> 3.86. The filter cannot restore what the 4x4 scaled IDCT
truncates (frequencies above the half-grid Nyquist), so content with
substantial energy there stays above 1 LSB — `host_raw`
(ops/raw420.py) deviates far less (0.55 LSB on the bench corpus; ~1.4
on adversarial out-of-gamut synthetics, where its YCbCr-domain resize
and the staged path's intermediate RGB clipping genuinely diverge),
and bench.py gates the headline on measured full-corpus parity rather
than assuming either path's number.

Refit recipe (offline, no fixture data checked in): decode a corpus
both ways, sample 5x5 patches of the draft output against strict-path
pixels, alternate per-axis least squares to convergence (4 iters),
renormalize each axis filter to unit DC gain. See fit_correction().
"""
from __future__ import annotations

import functools

import numpy as np

# Fit at 1920x1088 -> 2x, quality 85, 8-image mixed corpus, 960k
# samples (alternating LS, converged rmse 1.337). Unit DC gain.
HX = np.array([-0.0004, 0.1007, 0.5565, 0.3270, 0.0111], np.float32)
HY = np.array([-0.0005, 0.1017, 0.5623, 0.3303, 0.0113], np.float32)
HX = (HX / HX.sum()).astype(np.float32)
HY = (HY / HY.sum()).astype(np.float32)

# the filter the taps were fit against: applying the correction when
# the pipeline targets a DIFFERENT filter would pull the draft output
# toward the wrong reference (callers gate on these)
FIT_FILTER = "cubic"
FIT_SCALE = 0.70


def correction_windows(n: int, axis: str):
    """Identity-size banded windows for one axis: row i applies the
    5-tap filter centred at i with edge-replicate semantics (the tap
    weight of an out-of-range neighbour folds onto the edge sample,
    matching the fit's padding). Returns (starts int32 (n,), taps
    float32 (n, k)) in the picha_resize_u8 layout."""
    h = HX if axis == "x" else HY
    return windows_from_taps(n, tuple(float(v) for v in h))


@functools.lru_cache(maxsize=64)
def windows_from_taps(n: int, taps: tuple):
    """correction_windows for an arbitrary odd-length axis filter
    (hashable tuple) — the raw-domain draft path fits its own per-plane
    taps (ops/raw420.py) and shares this window construction."""
    h = np.asarray(taps, np.float32)
    k = len(h)
    half = k // 2
    if n <= k:  # degenerate tiny axis: everything folds onto n taps
        taps = np.zeros((n, n), np.float32)
        for i in range(n):
            for o, w in enumerate(h):
                taps[i, min(max(i + o - half, 0), n - 1)] += w
        return np.zeros(n, np.int32), taps
    # O(n*k): window i covers columns clip(i-half .. i+half); edge rows
    # fold the out-of-range tap weights onto the edge sample
    starts = np.clip(np.arange(n) - half, 0, n - k).astype(np.int32)
    taps = np.broadcast_to(h, (n, k)).copy()
    for i in range(half):  # top/left edge rows
        row = np.zeros(k, np.float32)
        for o, w in enumerate(h):
            row[min(max(i + o - half, 0), k - 1) - starts[i]] += w
        taps[i] = row
    for i in range(n - half, n):  # bottom/right edge rows
        row = np.zeros(k, np.float32)
        for o, w in enumerate(h):
            row[min(i + o - half, n - 1) - starts[i]] += w
        taps[i] = row
    return starts, np.ascontiguousarray(taps)


# Draft-divergence tripwire (the scaleDenom-draft analog of the raw
# path's gamut guard, rawguard.cc): the denom=2 scaled IDCT discards
# the 4..7 frequency bands of every 8x8 block, and no fitted linear
# correction can recover them. Content with heavy energy near those
# bands shows up in the DRAFT output as strong pixel-scale curvature,
# so a mean |second difference| over subsampled rows is a ~free,
# monotone predictor of the draft-vs-strict divergence. Calibration at
# 1920x1088 -> 2x, q85 (tools round 4): bench corpus d2 ~ 4.1-4.2 at
# 0.40 LSB pre-encode error; hostile mosaics 10.5 at 0.50; 4px band
# noise 54.5 at 1.66 (whose post-encode parity blew the 1.61 re-encode
# floor). The default threshold routes both hostile classes to the
# staged strict path while natural content clears it 1.7x below.
GUARD_D2_LSB = 7.0


def draft_hf_probe(img: np.ndarray, step: int = 16) -> float:
    """Mean |second difference| (LSB) along rows of every `step`-th row
    of a draft-decoded image — the tripwire statistic above."""
    rows = img[::step].astype(np.int32)
    return float(np.abs(rows[:, 2:] - 2 * rows[:, 1:-1]
                        + rows[:, :-2]).mean())


def apply_correction(img: np.ndarray) -> np.ndarray:
    """(H, W, C) u8 draft-decoded image -> corrected u8 image via the
    native banded resizer (same-size 'resize' whose windows encode the
    filter). Cost ~1 ms for 960x544x3 on one AVX2 core."""
    from ..native import lib as native

    h, w = img.shape[:2]
    xs, xw = correction_windows(w, "x")
    ys, yw = correction_windows(h, "y")
    return native.resize_u8(img, w, h, xs, xw, ys, yw, precision="i16")


def fit_correction(pairs, k: int = 5, iters: int = 6, samples: int = 120000,
                   seed: int = 7):
    """Refit the per-axis taps from (draft_f32, strict_f32) image pairs.
    Returns (hx, hy) with unit DC gain. Used offline and by the
    regression test (which checks the shipped taps against a fresh
    small fit)."""
    rng = np.random.default_rng(seed)
    V, R = [], []
    for fast, ref in pairs:
        v = np.lib.stride_tricks.sliding_window_view(
            fast.astype(np.float32), (k, k), axis=(0, 1))
        r = ref.astype(np.float32)[k // 2:-(k // 2), k // 2:-(k // 2)]
        flat = v.reshape(-1, k, k)
        idx = rng.choice(flat.shape[0], size=min(samples, flat.shape[0]),
                         replace=False)
        V.append(flat[idx])
        R.append(r.reshape(-1)[idx])
    V = np.concatenate(V)
    R = np.concatenate(R)
    hy = np.zeros(k, np.float32)
    hy[k // 2] = 1.0
    hx = hy.copy()
    for _ in range(iters):
        A = np.einsum("i,nij->nj", hy, V)
        hx = np.linalg.lstsq(A, R, rcond=None)[0]
        A = np.einsum("nij,j->ni", V, hx)
        hy = np.linalg.lstsq(A, R, rcond=None)[0]
    return ((hx / hx.sum()).astype(np.float32),
            (hy / hy.sum()).astype(np.float32))
