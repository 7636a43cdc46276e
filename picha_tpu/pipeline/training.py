"""Training-input pipeline (BASELINE.json config 5): batched JPEG decode
+ random crop + resize + normalize feeding a model step.

Deterministic, seedable and resumable (SURVEY.md §5.4): the iterator's
state is (epoch, position, seed) — save `state()`, rebuild with
`TrainingInput(..., state=saved)` and the stream continues identically.

Stage split:
  host pool:   entropy decode -> coefficient tensors (per signature)
  TPU graph:   dequant+IDCT+upsample+YCbCr -> random-crop -> resize ->
               normalize (one jit per signature bucket)
Random crops are applied on-device with dynamic slices driven by a
counter-derived key, so the pixel pipeline stays a pure function of
(bytes, step).
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import numpy as np

from ..native import lib as native
from ..ops import jpeg_tpu
from ..ops.resize import resize_f32
from .jpeg_batch import bucket_by_signature, pad_group, signature


@functools.lru_cache(maxsize=128)
def _jit_crop_resize_normalize(sig, crop: int, out: int, filter_name: str,
                               fscale: float, gap4_ks=None,
                               augment_cfg=None):
    import jax
    import jax.numpy as jnp

    from .jpeg_batch import unpack_gap4_wire

    width, height = sig[0], sig[1]
    if crop > min(width, height):
        raise ValueError("crop larger than image")
    base = _decode_graph(sig)

    def fn(coef_args, key):
        if gap4_ks is not None:
            coefs, qtabs = unpack_gap4_wire(coef_args[0], gap4_ks, sig[3])
            coef_args = coefs + qtabs
        rgb = base(*coef_args)  # (N,H,W,C) int32
        n = rgb.shape[0]
        kx, ky, kf = jax.random.split(key, 3)
        xs = jax.random.randint(kx, (n,), 0, width - crop + 1)
        ys = jax.random.randint(ky, (n,), 0, height - crop + 1)
        flip = jax.random.bernoulli(kf, 0.5, (n,))

        def crop_one(img, x, y, fl):
            c = jax.lax.dynamic_slice(img, (y, x, 0), (crop, crop, 3))
            return jax.lax.cond(fl, lambda t: t[:, ::-1], lambda t: t, c)

        cropped = jax.vmap(crop_one)(rgb, xs, ys, flip)
        f = cropped.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        f = jnp.clip(resize_f32(f, out, out, filter_name, fscale), 0.0, 1.0)
        if augment_cfg:
            from .augment import augment as _augment

            f = _augment(f, jax.random.fold_in(key, 0x5eed),
                         **dict(augment_cfg))
        return f

    return jax.jit(fn)


@functools.lru_cache(maxsize=128)
def _decode_graph(sig):
    """coefficients -> (N,H,W,3) int32 RGB decode stage (traceable);
    shares the one staged-decode implementation (jpeg_tpu)."""
    width, height, color_space, comp_sig = sig
    stage = jpeg_tpu.build_decode_stage(comp_sig, color_space, width,
                                        height, force_rgb=True)

    def decode_stage(*args):
        n = len(comp_sig)
        return stage(args[:n], args[n:])

    return decode_stage


class TrainingInput:
    """Deterministic resumable iterator over JPEG bytes.

    >>> ti = TrainingInput(files, batch=256, crop=192, size=224, seed=0)
    >>> batch = next(ti)            # (256, 224, 224, 3) float32 [0,1]
    >>> saved = ti.state()
    >>> ti2 = TrainingInput(files, batch=256, crop=192, size=224,
    ...                     state=saved)   # continues identically
    """

    def __init__(self, items: Sequence[bytes], batch: int, crop: int,
                 size: int, seed: int = 0, filter: str = "cubic",
                 filter_scale: float = 1.0, state: Optional[dict] = None,
                 num_threads: int = 8, augment: Optional[dict] = None):
        from concurrent.futures import ThreadPoolExecutor

        self.items = list(items)
        self.batch = batch
        self.crop = crop
        self.size = size
        self.filter = filter
        self.fscale = filter_scale
        # device-side augmentations (pipeline/augment.py), applied
        # inside the jit graph after resize — e.g. {"brightness_s": .2,
        # "contrast_s": .2, "saturation_s": .2, "cutout_size": 32}.
        # Hashable tuple form keys the jit cache.
        self.augment = tuple(sorted((augment or {}).items())) or None
        self._pool = ThreadPoolExecutor(max_workers=num_threads,
                                        thread_name_prefix="picha-train")
        if state is not None:
            self.seed = state["seed"]
            self.epoch = state["epoch"]
            self.pos = state["pos"]
        else:
            self.seed = seed
            self.epoch = 0
            self.pos = 0
        self._perm = self._epoch_perm()

    def state(self) -> dict:
        return {"seed": self.seed, "epoch": self.epoch, "pos": self.pos}

    def _epoch_perm(self):
        rng = np.random.default_rng((self.seed, self.epoch))
        return rng.permutation(len(self.items))

    def __iter__(self):
        return self

    def __next__(self):
        import jax

        if self.pos + self.batch > len(self.items):
            self.epoch += 1
            self.pos = 0
            self._perm = self._epoch_perm()
        idx = self._perm[self.pos : self.pos + self.batch]
        # fold epoch and pos separately: injective for any dataset size
        step_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self.seed), self.epoch),
            self.pos)
        self.pos += self.batch

        bufs = [self.items[i] for i in idx]
        if (os.cpu_count() or 1) <= 1:  # pool threads convoy on 1 core
            cos = [native.JpegCoefficients(b) for b in bufs]
        else:
            cos = list(self._pool.map(native.JpegCoefficients, bufs))
        groups = bucket_by_signature(cos)
        if len(groups) == 1:
            return self._run_group(groups[0][2], step_key)
        # heterogeneous batch: per-signature sub-batches padded to a
        # size multiple (bounded XLA shape zoo), reassembled in the
        # permutation's order — deterministic across resume because
        # grouping depends only on (dataset, seed, epoch, pos)
        import jax
        import jax.numpy as jnp

        parts, order = [], []
        for gi, (sig, idxs, group) in enumerate(groups):
            padded, n = pad_group(group)
            out = self._run_group(padded, jax.random.fold_in(step_key, gi))
            parts.append(out[:n])
            order.extend(idxs)
        inv = np.argsort(np.asarray(order))
        return jnp.concatenate(parts, axis=0)[inv]

    def _run_group(self, cos, key):
        # gap4 nibble wire: ~4x fewer upload bytes than dense int16
        # coefficients, bit-exact — transfers steal host CPU on narrow
        # links, so wire bytes are host cost (docs/PERFORMANCE.md)
        from .jpeg_batch import stack_gap4_wire

        sig, ks, wire = stack_gap4_wire(cos)
        fn = _jit_crop_resize_normalize(sig, self.crop, self.size,
                                        self.filter, self.fscale,
                                        gap4_ks=ks,
                                        augment_cfg=self.augment)
        return fn((wire,), key)
