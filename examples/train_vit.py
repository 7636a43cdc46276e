"""Example: the full training-input configuration (BASELINE config 5) —
batched JPEG decode + random crop + resize + normalize feeding a ViT
train step, with checkpoint/resume.

    python examples/train_vit.py tests/fixtures/test2.jpg
"""
import sys

import numpy as np

import jax

from picha_tpu.models import vit
from picha_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from picha_tpu.pipeline import TrainingInput


def main(jpeg_path, steps=5, ckpt="vit_ckpt.npz"):
    files = [open(jpeg_path, "rb").read()] * 64

    cfg = vit.TINY
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    init_opt, train_step = vit.make_train_step(cfg, learning_rate=1e-3)
    opt_state = init_opt(params)
    step_fn = jax.jit(train_step)

    ti = TrainingInput(files, batch=8, crop=48, size=cfg.image_size, seed=0)
    rng = np.random.default_rng(0)
    for step in range(steps):
        images = next(ti)
        labels = rng.integers(0, cfg.classes, images.shape[0]).astype(np.int32)
        params, opt_state, loss = step_fn(params, opt_state, images, labels)
        print(f"step {step}: loss {float(loss):.4f}")

    save_checkpoint(ckpt, params, opt_state, input_state=ti.state(),
                    step=steps)
    print(f"saved {ckpt}")

    # resume: identical stream continues from the saved iterator state
    params2, opt2, inp_state, start = load_checkpoint(ckpt, params, opt_state)
    ti2 = TrainingInput(files, batch=8, crop=48, size=cfg.image_size,
                        state=inp_state)
    images = next(ti2)
    print(f"resumed at step {start}; next batch {images.shape}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/test2.jpg")
