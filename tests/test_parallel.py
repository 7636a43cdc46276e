"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8) — SURVEY.md §4's fake-device
mesh strategy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picha_tpu.ops.resize import resize_array
from picha_tpu.parallel import make_mesh, resize_sharded, shard_batch


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_factorisations():
    m = make_mesh()
    assert m.shape == {"dp": 8}
    m2 = make_mesh((("dp", 2), ("tp", 4)))
    assert m2.shape == {"dp": 2, "tp": 4}
    m3 = make_mesh((("dp", -1), ("tp", 2)))
    assert m3.shape == {"dp": 4, "tp": 2}


def test_dp_sharded_batch_pipeline_matches():
    """The batched resize graph under a dp-sharded input equals the
    unsharded result — DP is transparent to the op."""
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (8, 24, 20, 3), dtype=np.uint8)
    want = resize_array(batch, 10, 12)
    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)
    got = np.asarray(resize_array(sharded, 10, 12))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("filter_name", ["cubic", "triangle", "lanczos"])
def test_spatial_halo_resize_matches_single_device(filter_name):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 40, 3), dtype=np.uint8)
    # jnp input pins the device graph (same float ops as the sharded
    # path; the numpy fast-path may differ in accumulation order)
    want = resize_array(jnp.asarray(img), 20, 32, filter=filter_name,
                        filter_scale=1.0)
    mesh = make_mesh((("sp", 8),))
    got = np.asarray(resize_sharded(jnp.asarray(img), 20, 32, mesh,
                                    filter=filter_name, filter_scale=1.0))
    # halo math must make the sharded result identical (same float ops)
    np.testing.assert_array_equal(got, want)


def test_spatial_upscale():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 16, 4), dtype=np.uint8)
    want = resize_array(jnp.asarray(img), 32, 64)
    mesh = make_mesh((("sp", 8),))
    got = np.asarray(resize_sharded(jnp.asarray(img), 32, 64, mesh))
    np.testing.assert_array_equal(got, want)


def test_dryrun_multichip_entrypoints():
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # single-chip compile check
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 16)
    # full multichip dryrun on the virtual mesh
    mod.dryrun_multichip(8)


def test_multihost_helpers_single_process():
    from picha_tpu.parallel import multihost
    items = list(range(10))
    assert multihost.local_shard(items, 0, 1) == items
    assert multihost.local_shard(items, 0, 4) == [0, 1, 2]
    # short tails wrap so every host's shard has equal length
    assert multihost.local_shard(items, 3, 4) == [9, 0, 1]
    assert multihost.local_shard([], 0, 4) == []
    mesh = make_mesh()
    arr = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = multihost.global_batch(arr, mesh)
    assert g.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(g), arr)
    multihost.initialize()  # no-op single process


def test_dp_sharded_jpeg_batch_graph():
    """The fused decode+resize bucket graph under a dp-sharded
    coefficient batch equals the unsharded result."""
    from conftest import fixture_bytes
    from picha_tpu.pipeline import JpegBatchPipeline

    bufs = [fixture_bytes("test2.jpg")] * 8
    p = JpegBatchPipeline(width=24, height=16, fused=True)
    cos = p.entropy_decode(bufs)
    sig, args = p.stack_bucket(cos)
    want = np.asarray(p.run_bucket(sig, args))
    mesh = make_mesh()
    sharded = [shard_batch(a, mesh) for a in args]
    got = np.asarray(p.run_bucket(sig, sharded))
    np.testing.assert_array_equal(got, want)


def test_gigapixel_scale_spatial_resize():
    """A tall image sharded over 8 devices resizes without ever being
    resident on one device (the CP/SP story at scale)."""
    rng = np.random.default_rng(3)
    h, w = 4096, 256  # 1 Mpix + per-shard slabs of 512 rows
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    mesh = make_mesh((("sp", 8),))
    out = np.asarray(resize_sharded(jnp.asarray(img), 64, 1024, mesh))
    assert out.shape == (1024, 64, 3)
    want = resize_array(jnp.asarray(img), 64, 1024)
    np.testing.assert_array_equal(out, np.asarray(want))


def test_spatial_halo_guard():
    rng = np.random.default_rng(4)
    mesh = make_mesh((("sp", 8),))
    # 8 rows per shard but a 16x downscale needs a ~22-row halo: more
    # than one ppermute hop can deliver -> explicit error
    img = rng.integers(0, 256, (64, 8, 1), dtype=np.uint8)
    with pytest.raises(ValueError):
        resize_sharded(jnp.asarray(img), 8, 4, mesh)
    # the 2-rows-per-shard case is exactly reachable with the tight
    # per-shard halo (reach 2) and must now match the single resize
    from picha_tpu.ops.resize import resize_array
    img = rng.integers(0, 256, (16, 8, 1), dtype=np.uint8)
    got = np.asarray(resize_sharded(jnp.asarray(img), 8, 8, mesh))
    np.testing.assert_array_equal(got, resize_array(img, 8, 8))


@pytest.mark.parametrize("src_h,dst_h", [(100, 36), (97, 40), (64, 31),
                                         (1003, 257)])
def test_resize_sharded_non_divisible(src_h, dst_h):
    """Pad-and-crop: shard-indivisible heights match the single-device
    resize bit-exactly (VERDICT weak #6)."""
    import jax.numpy as jnp
    from picha_tpu.ops.resize import resize_array
    from picha_tpu.parallel.mesh import make_mesh
    from picha_tpu.parallel.spatial import resize_sharded
    import jax
    mesh = make_mesh((("sp", 8),), devices=jax.devices()[:8])
    rng = np.random.default_rng(src_h)
    img = rng.integers(0, 256, (src_h, 50, 3), dtype=np.uint8)
    got = np.asarray(resize_sharded(jnp.asarray(img), 30, dst_h, mesh))
    want = resize_array(img, 30, dst_h)
    np.testing.assert_array_equal(got, want)


def test_pipeline_parallel_matches_sequential():
    """GPipe pipeline over a 'pp' mesh: identical to running the stage
    stack sequentially (bit-exact), activations hop via ppermute."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from picha_tpu.parallel.mesh import make_mesh
    from picha_tpu.parallel.pipeline_stages import pipeline_apply

    S = 4
    mesh = make_mesh((("pp", S),), devices=jax.devices()[:S])
    rng = np.random.default_rng(0)
    d = 16
    w = rng.normal(0, 0.3, (S, d, d)).astype(np.float32)
    b = rng.normal(0, 0.1, (S, d)).astype(np.float32)

    def stage(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = rng.normal(0, 1, (8, d)).astype(np.float32)
    got = np.asarray(pipeline_apply(
        stage, {"w": w, "b": b}, jnp.asarray(x), mesh, n_micro=4))
    want = x
    for s in range(S):
        want = np.tanh(want @ w[s] + b[s])
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pipeline_parallel_micro_batch_1():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from picha_tpu.parallel.mesh import make_mesh
    from picha_tpu.parallel.pipeline_stages import pipeline_apply

    mesh = make_mesh((("pp", 2),), devices=jax.devices()[:2])
    w = np.eye(4, dtype=np.float32)[None].repeat(2, 0) * 2.0

    def stage(p, x):
        return x @ p["w"]

    x = np.ones((3, 4), np.float32)
    got = np.asarray(pipeline_apply(stage, {"w": w}, jnp.asarray(x),
                                    mesh, n_micro=1))
    assert np.allclose(got, x * 4.0)
