"""Checkpoint / resume for training runs (SURVEY.md §5.4).

The reference had no persistent state beyond encoded bytes; the
training-pipeline consumer does: model params, optimizer state and the
input-iterator position. Kept dependency-light: a flattened-npz format
(deterministic, atomic rename) rather than a framework checkpointer;
the pytree structure is rebuilt from the same treedef on load.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional

import numpy as np


def _flatten(tree, prefix="", out=None):
    if out is None:
        out = {}
    if tree is None:
        # None leaves (e.g. a ResNet block without a projection) carry
        # no data; the template restores them on load
        return out
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix=""):
    if template is None:
        return None
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/")
                for k, v in template.items()}
    if isinstance(template, tuple):
        return tuple(_unflatten_into(v, flat, f"{prefix}{i}/")
                     for i, v in enumerate(template))
    if isinstance(template, list):
        return [_unflatten_into(v, flat, f"{prefix}{i}/")
                for i, v in enumerate(template)]
    return flat[prefix.rstrip("/")]


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    raise TypeError(f"not JSON serialisable: {type(o)!r}")


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    input_state: Optional[dict] = None, step: int = 0) -> None:
    """Atomic write of {params, opt_state, input_state, step} to `path`."""
    import jax

    payload = _flatten({"params": jax.device_get(params)})
    if opt_state is not None:
        leaves, treedef = jax.tree.flatten(jax.device_get(opt_state))
        for i, leaf in enumerate(leaves):
            payload[f"opt/{i}"] = np.asarray(leaf)
    meta = json.loads(json.dumps(
        {"step": step, "input_state": input_state or {}},
        default=_json_default))
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta, default=_json_default),
                     **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Any = None):
    """Returns (params, opt_state, input_state, step); opt_state is None
    when no template is supplied."""
    import jax

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    params = _unflatten_into(params_template, flat, "params/")
    opt_state = None
    if opt_state_template is not None:
        leaves, treedef = jax.tree.flatten(opt_state_template)
        got = [flat[f"opt/{i}"] for i in range(len(leaves))]
        opt_state = jax.tree.unflatten(treedef, got)
    return params, opt_state, meta["input_state"], meta["step"]
