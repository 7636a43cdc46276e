"""Raw-domain (4:2:0) host transcode: ops/raw420.py.

The composed downsample.resize.upsample operator must stay within the
north-star parity bound (≤1 LSB avg) of the staged libjpeg-RGB cubic
path on every geometry, and fall back cleanly on non-420 layouts.
Reference behaviours composed: jdsample.c fancy upsample + the
reference resize weights (src/resize.cc:19-50) + jcsample.c h2v2
downsample.
"""
import numpy as np
import pytest

from picha_tpu.ops.raw420 import (box_downsample_matrix,
                                  chroma_windows, fancy_upsample_matrix,
                                  transcode_raw420)
from picha_tpu.ops.resize import _resize_native, parse_resize_options

native = pytest.importorskip("picha_tpu.native.lib")

FNAME, FSCALE = parse_resize_options({})


def synth(w, h, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 60 * np.sin(xx / 17) + 50 * np.cos(yy / 23)
    return np.clip(np.stack([base, base * 0.8 + 20, 255 - base], -1)
                   + rng.normal(0, 5, (h, w, 3)), 0, 255).astype(np.uint8)


def staged_reference(buf, w, h, ow, oh):
    arr = native.jpeg_decode(buf, 3, w, h)
    r = _resize_native(arr, ow, oh, FNAME, FSCALE)
    return native.jpeg_encode(np.ascontiguousarray(r), 85)


@pytest.mark.parametrize("dims", [
    (322, 242, 161, 121),       # exact 2x
    (321, 241, 161, 121),       # odd source
    (322, 242, 155, 117),       # non-integral ratio
    (160, 120, 275, 201),       # upscale
])
def test_parity_vs_staged_path(dims):
    w, h, ow, oh = dims
    buf = native.jpeg_encode(synth(w, h), 85)
    out = transcode_raw420(buf, ow, oh, FNAME, FSCALE, 85)
    assert out is not None
    got = native.jpeg_decode(out, 3, ow, oh)
    want = native.jpeg_decode(staged_reference(buf, w, h, ow, oh), 3, ow, oh)
    diff = np.abs(got.astype(int) - want.astype(int)).mean()
    assert diff <= 1.0, f"raw420 parity {diff:.3f} LSB > 1.0"


def test_operator_rows_sum_to_one():
    # every factor is affine (rows sum to 1), so the composition must be
    U = fancy_upsample_matrix(161, 81)
    assert np.allclose(U.sum(1), 1.0, atol=1e-6)
    D = box_downsample_matrix(81, 161)
    assert np.allclose(D.sum(1), 1.0, atol=1e-6)
    starts, taps = chroma_windows(155, 160, 322, FNAME, FSCALE)
    assert starts.shape[0] == 80 and np.allclose(taps.sum(1), 1.0, atol=1e-5)
    # windows stay in range
    assert (starts >= 0).all()
    assert (starts + taps.shape[1] <= -(-322 // 2)).all()


def test_grey_and_non420_fall_back():
    g = native.jpeg_encode(np.ascontiguousarray(synth(64, 64)[..., :1]), 85)
    assert transcode_raw420(g, 32, 32, FNAME, FSCALE, 85) is None


def test_pipeline_host_raw_mixed_batch():
    from picha_tpu.pipeline import JpegBatchPipeline

    rgb = native.jpeg_encode(synth(128, 96), 85)
    grey = native.jpeg_encode(np.ascontiguousarray(synth(128, 96)[..., :1]),
                              85)
    p = JpegBatchPipeline(width=64, height=48, encode_quality=85,
                          encode_backend="host", host_raw=True)
    outs = p.host_encode_batch([rgb, grey, rgb])
    assert len(outs) == 3
    for o in outs:
        st = native.jpeg_stat(o)
        assert (st[0], st[1]) == (64, 48)
    # grey image went through the fallback path and stays grey
    assert native.jpeg_stat(outs[1])[2] == 1


def _redblue_checker_jpeg(w, h):
    """Red/blue 1px vertical stripes: every 2x2 chroma sample averages
    the two saturated colours while Y stays per-pixel, so the implied
    RGB of the stored planes is far out of gamut at every pixel (the
    staged path's mid-pipeline clamp is then a LARGE nonlinearity the
    raw path doesn't apply — the one divergence mechanism that grows
    without bound; measured mass ~3.8 vs <=0.43 on everything inside
    the calibration table's safe envelope)."""
    img = np.zeros((h, w, 3), np.uint8)
    img[:, 0::2, 0] = 255
    img[:, 1::2, 2] = 255
    return native.jpeg_encode(img, 95)


def test_gamut_guard_routes_extreme_content():
    """Sources beyond the measured-safe clip-mass envelope must fall
    back to the staged path (None); friendly content stays on the raw
    path; the guard is overridable."""
    extreme = _redblue_checker_jpeg(320, 192)
    assert transcode_raw420(extreme, 160, 96, FNAME, FSCALE, 85) is None
    assert transcode_raw420(extreme, 160, 96, FNAME, FSCALE, 85,
                            gamut_guard=0.0) is not None  # disabled
    friendly = native.jpeg_encode(synth(320, 192), 85)
    assert transcode_raw420(friendly, 160, 96, FNAME, FSCALE, 85) \
        is not None


def test_clip_mass_measures_gamut():
    w, h = 64, 64
    # grey ramp: implied RGB == Y everywhere, zero chroma -> zero mass
    g = np.tile(np.linspace(20, 235, w, dtype=np.float32), (h, 1))
    grey3 = np.repeat(g[..., None], 3, -1).astype(np.uint8)
    planes = native.jpeg_decode_raw420(native.jpeg_encode(grey3, 95), w, h)
    assert native.raw420_clip_mass(*planes, w, h) < 0.02
    planes = native.jpeg_decode_raw420(_redblue_checker_jpeg(w, h), w, h)
    assert native.raw420_clip_mass(*planes, w, h) > 0.5


def test_pipeline_host_raw_guard_matches_staged():
    """A guarded-out image through the host_raw pipeline must produce
    byte-identical output to the pure staged pipeline (the fallback IS
    the staged path)."""
    from picha_tpu.pipeline import JpegBatchPipeline

    extreme = bytes(_redblue_checker_jpeg(128, 96))
    kw = dict(width=64, height=48, encode_quality=85,
              encode_backend="host")
    raw = JpegBatchPipeline(host_raw=True, **kw).host_encode_batch
    staged = JpegBatchPipeline(host_raw=False, **kw).host_encode_batch
    assert raw([extreme]) == staged([extreme])


def test_reencode_dust_floor_attribution():
    """The >1 LSB 'hostile parity' entries bench reports for host-raw
    are re-encode quantisation amplification, not quality loss: the
    SAME staged pre-encode image perturbed by sub-LSB dust and
    re-encoded measures at least as far from the un-dusted encode as
    the raw path does — i.e. host-raw sits at/below the parity floor
    ANY non-bit-identical implementation pays on such content. (The
    plane-domain attribution below pins the raw path to the pure
    linear composition at quantisation level.)"""
    w, h, ow, oh = 640, 384, 320, 192
    r = np.random.default_rng(3)
    g = r.normal(0, 1, (h // 4, w // 4, 3)).astype(np.float32)
    img = np.clip(127 + 45 * np.kron(g, np.ones((4, 4, 1), np.float32)),
                  0, 255).astype(np.uint8)
    b = native.jpeg_encode(img, 85)

    st = _resize_native(native.jpeg_decode(b, 3, w, h), ow, oh,
                        FNAME, FSCALE)
    ref = native.jpeg_decode(
        native.jpeg_encode(np.ascontiguousarray(st), 85), 3, ow, oh)
    dust = np.clip(st.astype(np.int16)
                   + r.integers(0, 2, st.shape), 0, 255).astype(np.uint8)
    floor = np.abs(native.jpeg_decode(
        native.jpeg_encode(np.ascontiguousarray(dust), 85), 3, ow, oh)
        .astype(int) - ref.astype(int)).mean()

    out = transcode_raw420(bytes(b), ow, oh, FNAME, FSCALE, 85,
                           gamut_guard=0.0)
    raw_parity = np.abs(native.jpeg_decode(out, 3, ow, oh).astype(int)
                        - ref.astype(int)).mean()
    assert raw_parity <= floor * 1.15, (raw_parity, floor)


def test_hostile_divergence_is_staged_path_clipping():
    """Attribution of the hostile-content parity gap (bench.py reports
    host-raw ~1.4 LSB vs the staged path on out-of-gamut synthetics):
    the raw-domain path must track the PURE LINEAR composition
    (float resize of Y; float down.resize.up of chroma) at
    quantisation level, while the staged reference's intermediate RGB
    clipping/rounding is what diverges from that composition. If this
    inverts, the raw path has a real bug rather than a semantics
    difference."""
    from picha_tpu.ops.raw420 import (box_downsample_matrix,
                                      fancy_upsample_matrix, resize_raw420)
    from picha_tpu.ops.resize import _resize_native, resize_weights

    W, H, OW, OH = 640, 384, 320, 192
    r = np.random.default_rng(3)
    t = r.integers(0, 2, (H // 16, W // 16, 3)).astype(np.float32) * 255
    img = np.kron(t, np.ones((16, 16, 1), np.float32))
    img += r.normal(0, 20, img.shape)
    b = native.jpeg_encode(np.clip(img, 0, 255).astype(np.uint8), 85)

    planes = native.jpeg_decode_raw420(b, W, H)
    y, cb, cr = [p.astype(np.float32) for p in planes]
    Ry = resize_weights(OH, H, "cubic", 0.7)
    Rx = resize_weights(OW, W, "cubic", 0.7)
    y_ref = np.clip(Ry @ y[:H, :W] @ Rx.T, 0, 255)
    Uv = fancy_upsample_matrix(H, H // 2)
    Uh = fancy_upsample_matrix(W, W // 2)
    Dv = box_downsample_matrix(OH // 2, OH)
    Dh = box_downsample_matrix(OW // 2, OW)

    def cref(c):
        return np.clip(
            Dv @ (Ry @ (Uv @ c[:H // 2, :W // 2] @ Uh.T) @ Rx.T) @ Dh.T,
            0, 255)

    cb_ref, cr_ref = cref(cb), cref(cr)

    yo, cbo, cro = resize_raw420(planes, W, H, OW, OH, "cubic", 0.7)
    d_raw = max(
        np.abs(yo[:OH, :OW] - y_ref).mean(),
        np.abs(cbo[:OH // 2, :OW // 2] - cb_ref).mean(),
        np.abs(cro[:OH // 2, :OW // 2] - cr_ref).mean())

    staged = _resize_native(native.jpeg_decode(b, 3, W, H), OW, OH,
                            "cubic", 0.7).astype(np.float32)
    R, G, B = staged[..., 0], staged[..., 1], staged[..., 2]
    Ys = 0.299 * R + 0.587 * G + 0.114 * B
    Cbs = -0.168735892 * R - 0.331264108 * G + 0.5 * B + 128
    Crs = 0.5 * R - 0.418687589 * G - 0.081312411 * B + 128
    d_staged = max(
        np.abs(Ys - y_ref).mean(),
        np.abs(Dv @ Cbs @ Dh.T - cb_ref).mean(),
        np.abs(Dv @ Crs @ Dh.T - cr_ref).mean())

    assert d_raw < 0.4, d_raw          # quantisation-level tracking
    assert d_staged > 2 * d_raw, (d_raw, d_staged)  # the gap is theirs


# ---- draft-raw transcode (scale_denom=2 decode + fitted Y correction) ----


def _draft_corpus(w=640, h=480):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(11)
    imgs = [
        np.stack([128 + 100 * np.sin(xx / 37) * np.cos(yy / 53),
                  128 + 80 * np.sin((xx + yy) / 29),
                  128 + 60 * np.cos(xx / 17)], -1),
        np.stack([xx / w * 255, yy / h * 255,
                  (xx + yy) / (w + h) * 255], -1),
        np.kron(rng.integers(0, 256, (h // 32, w // 32, 3)),
                np.ones((32, 32, 1))).astype(np.float32),
    ]
    return [native.jpeg_encode(
        np.ascontiguousarray(np.clip(i, 0, 255).astype(np.uint8)), 85)
        for i in imgs]


def test_draft_parity_vs_staged_path():
    from picha_tpu.ops.raw420 import transcode_raw420_draft

    w, h, ow, oh = 640, 480, 320, 240
    for buf in _draft_corpus(w, h):
        out = transcode_raw420_draft(buf, ow, oh, FNAME, FSCALE, 85,
                                     gamut_guard=0.0)
        assert out is not None
        got = native.jpeg_decode(out, 3, ow, oh)
        want = native.jpeg_decode(staged_reference(buf, w, h, ow, oh),
                                  3, ow, oh)
        diff = np.abs(got.astype(int) - want.astype(int)).mean()
        assert diff <= 1.0, f"draft parity {diff:.3f} LSB > 1.0"


def test_draft_chroma_is_exact():
    # the scaled decode's chroma planes are the exact 8x8 IDCT on the
    # half grid — so the draft transcode's encoded chroma must be
    # byte-identical to the exact raw path's (only Y may differ)
    from picha_tpu.ops.raw420 import transcode_raw420, transcode_raw420_draft

    w, h, ow, oh = 640, 480, 320, 240
    for buf in _draft_corpus(w, h):
        d = transcode_raw420_draft(buf, ow, oh, FNAME, FSCALE, 85,
                                   gamut_guard=0.0)
        r = transcode_raw420(buf, ow, oh, FNAME, FSCALE, 85,
                             gamut_guard=0.0)
        _, dcb, dcr = native.jpeg_decode_raw420(d, ow, oh)
        _, rcb, rcr = native.jpeg_decode_raw420(r, ow, oh)
        assert np.array_equal(dcb, rcb) and np.array_equal(dcr, rcr)


def test_draft_scaled_decode_geometry_odd():
    # odd dims: scaled planes are ceil(dim/2), chroma on the SAME grid
    w, h = 321, 243
    buf = native.jpeg_encode(synth(w, h), 85)
    y, cb, cr = native.jpeg_decode_raw420(buf, w, h, scale_denom=2)
    ow, oh = -(-w // 2), -(-h // 2)
    wp, hp = (ow + 15) & ~15, (oh + 15) & ~15
    assert y.shape == (hp, wp) and cb.shape == (hp, wp) == cr.shape
    # the scaled chroma equals the full decode's chroma on the shared
    # unpadded extent (both are the plain 8x8 IDCT of the chroma plane)
    yf, cbf, crf = native.jpeg_decode_raw420(buf, w, h)
    assert np.array_equal(cb[:oh, :ow], cbf[:oh, :ow])
    assert np.array_equal(cr[:oh, :ow], crf[:oh, :ow])


def test_draft_applicability_window():
    from picha_tpu.ops.raw420 import transcode_raw420_draft

    buf = native.jpeg_encode(synth(640, 480), 85)
    # beyond-half target: the draft plane can't serve it
    assert transcode_raw420_draft(buf, 400, 240, FNAME, FSCALE, 85) is None
    assert transcode_raw420_draft(buf, 320, 300, FNAME, FSCALE, 85) is None
    # sub-half targets are in scope via the composed LS operator,
    # including non-fit filters (the composition retargets them)
    assert transcode_raw420_draft(buf, 300, 240, FNAME, FSCALE, 85,
                                  gamut_guard=0.0) is not None
    assert transcode_raw420_draft(buf, 300, 225, "triangle", 1.0, 85,
                                  gamut_guard=0.0) is not None
    # ...but the identity fast path requires the fitted filter, so an
    # exact-half triangle target routes through the composition too
    assert transcode_raw420_draft(buf, 320, 240, "triangle", 1.0, 85,
                                  gamut_guard=0.0) is not None
    # grayscale source falls back like the exact raw path
    g = native.jpeg_encode(
        np.ascontiguousarray(synth(640, 480)[..., :1]), 85)
    assert transcode_raw420_draft(g, 320, 240, FNAME, FSCALE, 85) is None


@pytest.mark.parametrize("dims", [
    (640, 480, 300, 240),       # general sub-half target
    (640, 480, 160, 120),       # 4:1
    (641, 481, 321, 241),       # odd source at exact ceil-half (phase
                                # misalignment absorbed by the LS map)
    (641, 481, 200, 150),       # odd source, general target
])
def test_draft_general_target_parity(dims):
    """The composed-operator draft path must stay within the north-star
    bound AND within 0.15 LSB of the exact raw path on the same
    content (the draft approximation costs little beyond host-raw)."""
    from picha_tpu.ops.raw420 import transcode_raw420_draft

    w, h, ow, oh = dims
    buf = native.jpeg_encode(synth(w, h), 85)
    out = transcode_raw420_draft(buf, ow, oh, FNAME, FSCALE, 85,
                                 gamut_guard=0.0)
    assert out is not None
    want = native.jpeg_decode(staged_reference(buf, w, h, ow, oh), 3, ow, oh)
    got = native.jpeg_decode(out, 3, ow, oh)
    diff = np.abs(got.astype(int) - want.astype(int)).mean()
    assert diff <= 1.0, f"general draft parity {diff:.3f} LSB > 1.0"
    raw = transcode_raw420(buf, ow, oh, FNAME, FSCALE, 85, gamut_guard=0.0)
    rdiff = np.abs(native.jpeg_decode(raw, 3, ow, oh).astype(int)
                   - want.astype(int)).mean()
    assert diff <= rdiff + 0.15, (diff, rdiff)


def test_draft_general_target_chroma_is_exact():
    # chroma uses the SAME composed operator as the exact raw path at
    # every geometry, so its encoded planes stay byte-identical to
    # transcode_raw420's on general targets too
    from picha_tpu.ops.raw420 import transcode_raw420_draft

    w, h, ow, oh = 640, 480, 300, 225
    for buf in _draft_corpus(w, h):
        d = transcode_raw420_draft(buf, ow, oh, FNAME, FSCALE, 85,
                                   gamut_guard=0.0)
        r = transcode_raw420(buf, ow, oh, FNAME, FSCALE, 85,
                             gamut_guard=0.0)
        _, dcb, dcr = native.jpeg_decode_raw420(d, ow, oh)
        _, rcb, rcr = native.jpeg_decode_raw420(r, ow, oh)
        assert np.array_equal(dcb, rcb) and np.array_equal(dcr, rcr)


def test_draft_pipeline_mixed_batch_matches_op():
    from picha_tpu.ops.raw420 import transcode_raw420_draft
    from picha_tpu.pipeline import JpegBatchPipeline

    w, h, ow, oh = 640, 480, 320, 240
    bufs = _draft_corpus(w, h)
    bufs.append(native.jpeg_encode(
        np.ascontiguousarray(synth(w, h)[..., :1]), 85))  # grey straggler
    p = JpegBatchPipeline(width=ow, height=oh, encode_quality=85,
                          encode_backend="host", host_draft=True)
    outs = p.host_encode_batch(bufs)
    want = transcode_raw420_draft(bufs[0], ow, oh, FNAME, FSCALE, 85)
    assert bytes(outs[0]) == want
    assert all(len(o) > 0 for o in outs)


def test_draft_taps_match_fresh_fit():
    # the shipped DRAFT_YX/DRAFT_YY constants must track what
    # fit_correction reproduces from a small fresh fit (guards against
    # the constants drifting from the documented recipe)
    from picha_tpu.ops.fastfix import fit_correction
    from picha_tpu.ops.raw420 import DRAFT_YX, DRAFT_YY, luma_windows

    w, h, ow, oh = 640, 480, 320, 240
    pairs = []
    for buf in _draft_corpus(w, h):
        yfull, _, _ = native.jpeg_decode_raw420(buf, w, h)
        ydraft, _, _ = native.jpeg_decode_raw420(buf, w, h, scale_denom=2)
        xs, xw = luma_windows(ow, ow, w, FNAME, FSCALE)
        ys, yw = luma_windows(oh, oh, h, FNAME, FSCALE)
        strict = native.resize_u8(yfull[..., None], ow, oh,
                                  xs, xw, ys, yw)[..., 0]
        pairs.append((ydraft[:oh, :ow].astype(np.float32),
                      strict.astype(np.float32)))
    hx, hy = fit_correction(pairs, k=5, iters=4, samples=40000)
    assert np.abs(hx - DRAFT_YX).max() < 0.04, hx
    assert np.abs(hy - DRAFT_YY).max() < 0.04, hy


def test_raw_decode_one_pixel_wide_and_tall():
    """Full-size raw decode of 1xN / Nx1 4:2:0 sources: the chroma grid
    is ceil(dim/2), which for a 1-px axis EQUALS the output dim — the
    stride choice must still be the half grid (keyed on scale_denom,
    not on a width comparison), or libjpeg's row writes overrun the
    half-grid chroma buffers (regression: confirmed heap overflow)."""
    for w, h in ((1, 32), (32, 1), (1, 1), (3, 47)):
        flat = np.full((h, w, 3), 128, np.uint8)
        buf = native.jpeg_encode(flat, 95)
        y, cb, cr = native.jpeg_decode_raw420(buf, w, h)
        # valid region of a constant-grey image is constant in all
        # three planes; with the stride bug rows past the first land at
        # wrong offsets and the assert sees uninitialized memory
        ch, cw = -(-h // 2), -(-w // 2)
        assert np.abs(y[:h, :w].astype(int) - 128).max() <= 2
        assert np.abs(cb[:ch, :cw].astype(int) - 128).max() <= 2
        assert np.abs(cr[:ch, :cw].astype(int) - 128).max() <= 2
