"""Spatially-sharded resize with halo exchange — the CP/SP analog.

The reference's "large image with bounded memory" story was a
row-streaming ring buffer (resize.cc:52-64,83-132) plus O(1) subView
crops. On TPU the equivalent is sharding the image's H axis across the
mesh and exchanging a filter-support halo of rows between neighbours
over ICI (SURVEY.md §5.7): each device resizes its output-row slab
using only its local rows plus the halo, so gigapixel inputs never
need to be resident on one chip.

Implementation: shard_map over the 'sp' axis. The horizontal pass is
embarrassingly local; the vertical pass needs input rows within
``fsupport`` of the slab boundary, fetched with two ppermute shifts
(up + down). Boundary wrap-around rows carry zero weight in the
per-device vertical weight block (built from the zero-padded global
contribution matrix), so the ring permutation needs no edge casing.
"""
from __future__ import annotations

import functools

import numpy as np

from ..ops.resize import parse_resize_options


def _required_halo(src_h: int, dst_h: int, filter_name: str, fscale: float,
                   n: int, local_in: int, local_out: int) -> int:
    """Exact halo: how far any shard's output windows reach outside its
    input slab. Non-divisible sizes pad the tail, which skews output
    slabs against input slabs — the extreme rows of each shard bound
    the reach (windows are monotone in the row index)."""
    from ..ops.resize import _iter_contribs

    halo = 0
    for k in range(n):
        r0 = k * local_out
        if r0 >= dst_h:
            break
        r1 = min((k + 1) * local_out, dst_h) - 1
        for r in {r0, r1}:
            for _, left, w in _iter_contribs(dst_h, src_h, filter_name,
                                             fscale, r, 1):
                halo = max(halo, k * local_in - left,
                           (left + w.size - 1) - ((k + 1) * local_in - 1))
    return max(halo, 0)


@functools.lru_cache(maxsize=8)
def _build(src_h: int, src_w: int, channels: int, dst_h: int, dst_w: int,
           filter_name: str, fscale: float, n_shards: int, axis: str,
           mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..ops.resize import _apply_axis, resize_weight_rows

    # non-divisible sizes pad the tail and crop after (weights embed in
    # a zero-extended grid, so the numerics stay those of the true
    # src_h -> dst_h mapping)
    src_pad_h = -(-src_h // n_shards) * n_shards
    dst_pad_h = -(-dst_h // n_shards) * n_shards
    local_in = src_pad_h // n_shards
    local_out = dst_pad_h // n_shards
    halo = _required_halo(src_h, dst_h, filter_name, fscale, n_shards,
                          local_in, local_out)
    if halo > local_in:
        # a single ppermute hop reaches only the adjacent shard; wider
        # reach (filter support + pad-induced slab skew) would silently
        # drop taps
        raise ValueError(
            f"vertical window reach ({halo} rows) exceeds the per-shard row "
            f"count ({local_in}); use fewer shards, a narrower filter, or "
            f"shard-divisible sizes")

    # per-shard vertical blocks, built windowed (never the dense
    # (dst_h, src_h) matrix — gigapixel-safe); column j of block k maps
    # to global row k*local_in - halo + j. resize_weight_rows raises if
    # any tap falls outside the halo window (coverage assertion).
    # Output rows >= dst_h are padding: zero weight rows, cropped after.
    def block(k):
        b = np.zeros((local_out, local_in + 2 * halo), dtype=np.float32)
        real = min(local_out, max(0, dst_h - k * local_out))
        if real > 0:
            b[:real] = resize_weight_rows(
                dst_h, src_h, filter_name, fscale,
                row_start=k * local_out, row_count=real,
                col_start=k * local_in - halo,
                col_count=local_in + 2 * halo)
        return b

    blocks = np.stack([block(k) for k in range(n_shards)])

    def local_fn(img, wv_block):
        # img: (local_in, W, C) float32; wv_block: (1, local_out, ...)
        if halo == 0:
            # every window fits inside the slab (e.g. box filter at
            # shard-aligned scales) — and img[-0:] would be the WHOLE
            # slab, not an empty slice
            ext = img
        else:
            up_perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            dn_perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
            prev_tail = jax.lax.ppermute(img[-halo:], axis, up_perm)
            next_head = jax.lax.ppermute(img[:halo], axis, dn_perm)
            ext = jnp.concatenate([prev_tail, img, next_head], axis=0)
        # horizontal pass: dense or banded per source width (ops.resize)
        tmp = _apply_axis(ext, dst_w, src_w, filter_name, fscale, axis=-2)
        out = jnp.einsum("oh,hwc->owc", wv_block[0], tmp,
                         preferred_element_type=jnp.float32)
        return out

    smapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None, None))

    def fn(img_u8):
        f = img_u8.astype(jnp.float32) / jnp.float32(255.0)
        out = smapped(f, jnp.asarray(blocks))
        return jnp.floor(jnp.clip(out * 255.0 + 0.5, 0, 255)).astype(jnp.uint8)

    sharding = NamedSharding(mesh, P(axis, None, None))
    jitted = jax.jit(fn, in_shardings=sharding, out_shardings=sharding)

    def wrapper(img_u8):
        # pad-and-crop happens outside the pjit boundary: pjit rejects a
        # P(axis) sharding on a non-divisible dimension
        if src_pad_h != src_h:
            img_u8 = jnp.pad(
                img_u8, ((0, src_pad_h - src_h), (0, 0), (0, 0)))
        out = jitted(img_u8)
        if dst_pad_h != dst_h:
            out = out[:dst_h]
        return out

    return wrapper


def resize_sharded(img, dst_w: int, dst_h: int, mesh, axis: str = "sp",
                   filter: str | None = None, filter_scale: float | None = None):
    """Resize an (H, W, C) uint8 image sharded over rows on `mesh[axis]`.

    Returns a (dst_h, dst_w, C) uint8 array sharded the same way. Same
    numerics as ops.resize (reference resize.cc semantics)."""
    opts = {}
    if filter is not None:
        opts["filter"] = filter
    if filter_scale is not None:
        opts["filterScale"] = filter_scale
    name, fscale = parse_resize_options(opts)
    n = mesh.shape[axis]
    h, w, c = img.shape
    fn = _build(h, w, c, dst_h, dst_w, name, fscale, n, axis, mesh)
    return fn(img)
