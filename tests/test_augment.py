"""Device-side training augmentations (pipeline/augment.py): pure
functions of (batch, key) with static shapes — determinism, identity
and range invariants, plus integration with TrainingInput's jit graph
and dp sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picha_tpu.pipeline.augment import (augment, brightness, color_jitter,
                                        contrast, cutout, mixup,
                                        saturation)


def _batch(n=4, h=16, w=16):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32))


def test_deterministic_and_batch_independent():
    b = _batch()
    k = jax.random.PRNGKey(7)
    out1 = augment(b, k, brightness_s=0.3, contrast_s=0.3,
                   saturation_s=0.3, cutout_size=4)
    out2 = augment(b, k, brightness_s=0.3, contrast_s=0.3,
                   saturation_s=0.3, cutout_size=4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = augment(b, jax.random.PRNGKey(8), brightness_s=0.3,
                   contrast_s=0.3, saturation_s=0.3, cutout_size=4)
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_zero_strength_is_identity():
    b = _batch()
    k = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(
        np.asarray(color_jitter(b, k)), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(augment(b, k)), np.asarray(b))


def test_ranges_and_shapes():
    b = _batch()
    k = jax.random.PRNGKey(1)
    for fn in (lambda: brightness(b, k, 0.8), lambda: contrast(b, k, 0.8),
               lambda: saturation(b, k, 0.8),
               lambda: cutout(b, k, 6, fill=0.5)):
        out = np.asarray(fn())
        assert out.shape == b.shape
        assert out.min() >= 0.0 and out.max() <= 1.0


def test_saturation_identity_on_grey():
    # a grey image has x == luma everywhere, so saturation is a no-op
    g = jnp.broadcast_to(
        jnp.linspace(0.1, 0.9, 16 * 16).reshape(1, 16, 16, 1),
        (2, 16, 16, 3)).astype(jnp.float32)
    out = saturation(g, jax.random.PRNGKey(3), 0.9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(g), atol=1e-5)


def test_cutout_masks_a_square():
    b = jnp.ones((1, 32, 32, 3), jnp.float32)
    out = np.asarray(cutout(b, jax.random.PRNGKey(2), 8, fill=0.0))
    nz = (out[0, :, :, 0] == 0.0)
    assert nz.any()
    # the zeroed region is a contiguous axis-aligned rectangle
    ys, xs = np.where(nz)
    assert nz[ys.min():ys.max() + 1, xs.min():xs.max() + 1].all()
    assert nz.sum() <= 8 * 8  # size 8 -> at most 8x8 (less if clipped)
    assert (ys.max() - ys.min() + 1) <= 8 and (xs.max() - xs.min() + 1) <= 8


def test_mixup_convexity_and_labels():
    b = _batch()
    labels = jnp.eye(4, dtype=jnp.float32)
    mixed, ml, lam = mixup(b, labels, jax.random.PRNGKey(5), alpha=0.4)
    lam = float(lam)
    assert 0.5 <= lam <= 1.0
    np.testing.assert_allclose(
        np.asarray(mixed),
        lam * np.asarray(b) + (1 - lam) * np.roll(np.asarray(b), 1, 0),
        atol=1e-6)
    assert ml.shape == labels.shape
    _, none_labels, _ = mixup(b, None, jax.random.PRNGKey(5))
    assert none_labels is None


def test_jit_and_dp_sharding():
    b = _batch(n=8)
    k = jax.random.PRNGKey(9)
    f = jax.jit(lambda x, kk: augment(x, kk, brightness_s=0.2,
                                      cutout_size=4))
    ref = np.asarray(f(b, k))
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("dp",))
    sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp"))
    out = np.asarray(f(jax.device_put(b, sh), k))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_training_input_augment_integration():
    from picha_tpu.native import lib as native
    from picha_tpu.pipeline.training import TrainingInput

    rng = np.random.default_rng(4)
    bufs = [native.jpeg_encode(
        rng.integers(0, 256, (64, 80, 3), np.uint8).astype(np.uint8), 90)
        for _ in range(6)]
    plain = TrainingInput(bufs, batch=2, crop=48, size=32, seed=1)
    aug = TrainingInput(bufs, batch=2, crop=48, size=32, seed=1,
                        augment={"brightness_s": 0.3, "cutout_size": 8})
    a = np.asarray(next(plain))
    b = np.asarray(next(aug))
    assert a.shape == b.shape == (2, 32, 32, 3)
    assert not np.array_equal(a, b)  # augmentation changed pixels
    # determinism across resume: same state -> same augmented batch
    aug2 = TrainingInput(bufs, batch=2, crop=48, size=32, seed=1,
                         augment={"brightness_s": 0.3, "cutout_size": 8})
    np.testing.assert_array_equal(b, np.asarray(next(aug2)))
