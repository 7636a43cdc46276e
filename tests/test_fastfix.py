"""Draft-decode correction filter (ops/fastfix.py): the host-fast
scaleDenom=2 path's corrected output must sit measurably closer to the
strict cubic path than the uncorrected draft decode, on friendly AND
hostile content (the filter is a phase+sharpening fix, not a corpus
hack — it must never make any class worse)."""
import numpy as np
import pytest

from picha_tpu.native import lib as native
from picha_tpu.ops.fastfix import (HX, HY, apply_correction,
                                   correction_windows, fit_correction)
from picha_tpu.ops.resize import _resize_native
from picha_tpu.pipeline import JpegBatchPipeline

W, H = 640, 384
OW, OH = W // 2, H // 2


def _corpus():
    r = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    imgs = []
    base = 127 + 60 * np.sin(2 * np.pi * 3 * xx / W) \
        + 50 * np.cos(2 * np.pi * 2 * yy / H)
    imgs.append(np.stack([base, np.roll(base, 17, 1),
                          np.roll(base, 31, 0)], -1)
                + r.normal(0, 6, (H, W, 3)))
    imgs.append(np.stack([xx / W * 255, yy / H * 255,
                          (xx + yy) / (W + H) * 255], -1))
    t = r.integers(0, 256, (H // 16, W // 16, 3)).astype(np.float32)
    imgs.append(np.kron(t, np.ones((16, 16, 1), np.float32)))
    return [native.jpeg_encode(np.clip(i, 0, 255).astype(np.uint8), 85)
            for i in imgs]


def _diffs(bufs, corrected):
    out = []
    for b in bufs:
        fast = native.jpeg_decode(b, 3, OW, OH, scale_denom=2)
        if corrected:
            fast = apply_correction(fast)
        ref = _resize_native(native.jpeg_decode(b, 3, W, H), OW, OH,
                             "cubic", 0.7)
        out.append(np.abs(fast.astype(int) - ref.astype(int)).mean())
    return out


def test_correction_improves_every_class():
    bufs = _corpus()
    raw = _diffs(bufs, corrected=False)
    corr = _diffs(bufs, corrected=True)
    for r, c in zip(raw, corr):
        assert c < r  # never worse, on any class
    # friendly classes land strict
    assert corr[0] <= 1.0
    assert corr[1] <= 1.0


def test_windows_unit_gain_and_edges():
    for n, axis in ((64, "x"), (64, "y"), (7, "x")):
        starts, taps = correction_windows(n, axis)
        assert starts.shape == (n,)
        np.testing.assert_allclose(taps.sum(axis=1), 1.0, atol=1e-5)
        assert (starts >= 0).all() and (starts + taps.shape[1] <= n).all()
    # flat field is a fixed point (unit DC gain end to end)
    flat = np.full((40, 48, 3), 131, np.uint8)
    np.testing.assert_array_equal(apply_correction(flat), flat)


def test_host_fast_pipeline_applies_correction():
    bufs = _corpus()
    p = JpegBatchPipeline(width=OW, height=OH, encode_quality=85,
                          encode_backend="host", host_fast_scale=True)
    outs = p.host_encode_batch(bufs)
    pn = JpegBatchPipeline(width=OW, height=OH, encode_quality=85,
                          encode_backend="host")
    refs = pn.host_encode_batch(bufs)
    d = np.mean([np.abs(
        native.jpeg_decode(bytes(o), 3, OW, OH).astype(int)
        - native.jpeg_decode(bytes(rb), 3, OW, OH).astype(int)).mean()
        for o, rb in zip(outs[:2], refs[:2])])  # friendly classes only
    assert d <= 1.0  # corrected draft mode is strict on this content


def test_refit_matches_shipped_taps():
    # a fresh small fit on grating content must land near the shipped
    # operator-level taps (loose tolerance: content-weighting shifts
    # the LS solution slightly)
    bufs = _corpus()[:1]
    pairs = []
    for b in bufs:
        fast = native.jpeg_decode(b, 3, OW, OH, scale_denom=2)
        ref = _resize_native(native.jpeg_decode(b, 3, W, H), OW, OH,
                             "cubic", 0.7)
        pairs.append((fast, ref))
    hx, hy = fit_correction(pairs, samples=40000)
    assert np.abs(hx - HX).max() < 0.08
    assert np.abs(hy - HY).max() < 0.08


def test_windows_tiny_axis():
    # axes smaller than the filter fold all taps in-range and keep
    # unit gain; apply_correction works on images narrower than 5 px
    starts, taps = correction_windows(3, "x")
    assert taps.shape == (3, 3)
    np.testing.assert_allclose(taps.sum(axis=1), 1.0, atol=1e-5)
    tiny = np.full((4, 3, 3), 77, np.uint8)
    np.testing.assert_array_equal(apply_correction(tiny), tiny)
