"""ViT model + train step + checkpoint tests (CPU mesh)."""
import numpy as np

import jax

from picha_tpu.models import vit
from picha_tpu.models.checkpoint import load_checkpoint, save_checkpoint


def _tiny_setup():
    cfg = vit.TINY
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes_and_finite():
    cfg, params = _tiny_setup()
    images = np.random.default_rng(0).random((4, 32, 32, 3), np.float32)
    logits = jax.jit(lambda p, x: vit.forward(p, x, cfg))(params, images)
    assert logits.shape == (4, cfg.classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_reduces_loss():
    cfg, params = _tiny_setup()
    init_opt, train_step = vit.make_train_step(cfg, learning_rate=1e-2)
    opt_state = init_opt(params)
    rng = np.random.default_rng(1)
    images = rng.random((8, 32, 32, 3), np.float32)
    labels = (np.arange(8) % cfg.classes).astype(np.int32)
    step = jax.jit(train_step)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path):
    cfg, params = _tiny_setup()
    init_opt, train_step = vit.make_train_step(cfg)
    opt_state = init_opt(params)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, opt_state,
                    input_state={"seed": 7, "epoch": 1, "pos": 4}, step=42)
    p2, o2, inp, step = load_checkpoint(path, params, opt_state)
    assert step == 42 and inp == {"seed": 7, "epoch": 1, "pos": 4}
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dryrun_multichip_n4():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(4)


def test_resnet_forward_and_train():
    from picha_tpu.models import resnet
    cfg = resnet.TINY
    params = resnet.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = rng.random((4, 32, 32, 3), np.float32)
    logits = jax.jit(lambda p, x: resnet.forward(p, x, cfg))(params, images)
    assert logits.shape == (4, cfg.classes)
    assert np.isfinite(np.asarray(logits)).all()
    init_opt, train_step = resnet.make_train_step(cfg, learning_rate=1e-3)
    opt_state = init_opt(params)
    labels = (np.arange(4) % cfg.classes).astype(np.int32)
    step = jax.jit(train_step)
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert min(losses[1:]) < losses[0]
    assert np.isfinite(losses).all()


def test_resnet_sharded_train_step():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from picha_tpu.models import resnet
    from picha_tpu.parallel import make_mesh
    cfg = resnet.TINY
    mesh = make_mesh((("dp", 4), ("tp", 2)))
    params = resnet.init_params(jax.random.PRNGKey(0), cfg)
    specs = resnet.param_specs(cfg)
    params = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, np.ndarray))
    init_opt, train_step = resnet.make_train_step(cfg)
    opt_state = init_opt(params)
    rng = np.random.default_rng(1)
    images = jax.device_put(rng.random((8, 32, 32, 3), np.float32),
                            NamedSharding(mesh, P("dp")))
    labels = jax.device_put((np.arange(8) % cfg.classes).astype(np.int32),
                            NamedSharding(mesh, P("dp")))
    params, opt_state, loss = jax.jit(train_step)(params, opt_state,
                                                  images, labels)
    assert np.isfinite(float(loss))


def test_checkpoint_none_leaves_roundtrip(tmp_path):
    # regression: None leaves (ResNet blocks without projections) must
    # survive save/load (previously saved as unpicklable object arrays)
    from picha_tpu.models import resnet
    from picha_tpu.models.checkpoint import load_checkpoint, save_checkpoint
    cfg = resnet.TINY
    params = resnet.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "r.npz")
    save_checkpoint(path, params, None,
                    input_state={"pos": np.int64(4)}, step=np.int64(7))
    p2, _, inp, step = load_checkpoint(path, params)
    assert step == 7 and inp == {"pos": 4}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # None structure preserved
    assert p2["stages"][0][0]["proj"] is None or params["stages"][0][0]["proj"] is not None


def test_vit_moe_expert_parallel_train_step():
    """Switch-MoE ViT trains under a dp×tp×ep mesh: expert weights
    shard on 'ep', loss is finite, and the step is jittable (GSPMD
    inserts all collectives)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from picha_tpu.models import vit
    from picha_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((("dp", 2), ("tp", 2), ("ep", 2)),
                     devices=jax.devices()[:8])
    cfg = vit.TINY_MOE
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    specs = vit.param_specs(cfg)
    params = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, np.ndarray))
    # the MoE block's experts really shard over ep
    w_in = params["blocks"][1]["w_in"]
    assert "ep" in str(w_in.sharding.spec)
    init_opt, step = vit.make_train_step(cfg)
    opt = init_opt(params)
    imgs = jax.device_put(
        np.random.default_rng(0).random((8, 32, 32, 3), np.float32),
        NamedSharding(mesh, P("dp")))
    labels = jax.device_put(np.arange(8, dtype=np.int32) % cfg.classes,
                            NamedSharding(mesh, P("dp")))
    jstep = jax.jit(step)
    params, opt, loss = jstep(params, opt, imgs, labels)
    params, opt, loss = jstep(params, opt, imgs, labels)
    assert np.isfinite(float(loss))


def test_vit_moe_forward_matches_capacity_semantics():
    """Dropped tokens (over-capacity) pass through the residual: with
    capacity_factor large enough no token drops and the MoE output is
    used for every token; the forward is deterministic."""
    import jax
    import numpy as np

    from picha_tpu.models import vit

    cfg = vit.TINY_MOE
    params = vit.init_params(jax.random.PRNGKey(1), cfg)
    x = np.random.default_rng(1).random((2, 32, 32, 3), np.float32)
    a = np.asarray(vit.forward(params, x, cfg))
    b = np.asarray(vit.forward(params, x, cfg))
    assert np.array_equal(a, b) and a.shape == (2, cfg.classes)


def test_checkpoint_roundtrip_moe(tmp_path):
    """MoE params have heterogeneous per-block structures (router /
    stacked expert weights on MoE blocks, plain mlp on the rest) — the
    flattened-npz checkpoint must round-trip them exactly along with
    the optimizer state."""
    import jax
    import numpy as np

    from picha_tpu.models import vit
    from picha_tpu.models.checkpoint import (load_checkpoint,
                                             save_checkpoint)

    cfg = vit.TINY_MOE
    params = vit.init_params(jax.random.PRNGKey(3), cfg)
    init_opt, step = vit.make_train_step(cfg)
    opt = init_opt(params)
    path = str(tmp_path / "moe.npz")
    save_checkpoint(path, params, opt_state=opt,
                    input_state={"seed": 1, "epoch": 0, "pos": 8})
    p2, o2, ist, _step = load_checkpoint(path, params,
                                         opt_state_template=opt)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(o2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert ist == {"seed": 1, "epoch": 0, "pos": 8}
