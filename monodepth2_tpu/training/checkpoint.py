"""Checkpoint / resume.

The reference BSON-dumps only the model every 500 iters and cannot resume
training (optimizer state is never saved — src/Monodepth.jl:191-193,
SURVEY.md §5). Here the FULL TrainState (step, params, BN stats, optimizer
state, RNG key) round-trips through a flat .npz, so a crash loses at most
`save_every` steps.

Format: leaves of the state pytree in tree order (leaf_00000 ...) plus a JSON
sidecar with step/metadata. Loading requires a template state with the same
tree structure (the normal JAX pattern); shapes/dtypes are validated.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state, metadata: Optional[dict] = None) -> None:
    """Write `<path>.npz` + `<path>.json`."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    meta = dict(metadata or {})
    meta.setdefault("n_leaves", len(leaves))
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str, template_state):
    """Restore a state with `template_state`'s structure from `<path>.npz`."""
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    with np.load(path + ".npz") as data:
        keys = sorted(data.files)
        if len(keys) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(keys)} leaves, template needs {len(leaves)}"
            )
        loaded = []
        for key, tmpl in zip(keys, leaves):
            arr = data[key]
            if tuple(arr.shape) != tuple(np.shape(tmpl)):
                raise ValueError(
                    f"{key}: checkpoint shape {arr.shape} != template {np.shape(tmpl)}"
                )
            loaded.append(jax.numpy.asarray(arr, dtype=np.asarray(tmpl).dtype))
    return jax.tree_util.tree_unflatten(treedef, loaded)


def latest_checkpoint(save_dir: str, prefix: str = "ckpt") -> Optional[str]:
    """Find the highest-step `<prefix>-<step>` in save_dir, or None."""
    if not os.path.isdir(save_dir):
        return None
    pat = re.compile(rf"^{re.escape(prefix)}-(\d+)\.npz$")
    best, best_step = None, -1
    for f in os.listdir(save_dir):
        m = pat.match(f)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(save_dir, f[: -len(".npz")])
    return best
