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

import hashlib
import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def treedef_fingerprint(state) -> str:
    """Stable hash of the state's pytree STRUCTURE (treedef string), which
    leaf-count/shape checks alone cannot see: two states with the same number
    of same-shaped leaves but different structure (e.g. a different optax
    chain, or swapped same-shape dict keys) would otherwise load silently in
    the wrong order."""
    s = str(jax.tree_util.tree_structure(state))
    return hashlib.sha256(s.encode()).hexdigest()[:16]


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
    meta.setdefault("treedef_sha", treedef_fingerprint(state))
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str, template_state):
    """Restore a state with `template_state`'s structure from `<path>.npz`.

    Refuses to load when the sidecar's treedef fingerprint differs from the
    template's (structure mismatch — wrong config/optimizer for this
    checkpoint). Checkpoints written before fingerprinting load with the
    legacy leaf-count/shape validation only."""
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    sidecar = path + ".json"
    if os.environ.get("MDTPU_CKPT_SKIP_TREEDEF"):
        sidecar = ""  # explicit escape hatch for toolchain-upgrade repr
        # drift (see the ValueError below); leaf-count/shape checks remain
    if sidecar and os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        want = meta.get("treedef_sha")
        have = treedef_fingerprint(template_state)
        if want is not None and want != have:
            raise ValueError(
                f"checkpoint {path} was saved with a different state "
                f"structure (treedef {want} != template {have}) — the "
                "config/optimizer this run builds does not match the one "
                "that wrote the checkpoint. NOTE: the fingerprint hashes "
                "the treedef's string form, which embeds optax class reprs, "
                "so a jax/optax UPGRADE can also trip this even when leaves "
                "are compatible — set MDTPU_CKPT_SKIP_TREEDEF=1 to fall "
                "back to leaf-count/shape validation in that case. If the "
                "structure GENUINELY changed (e.g. lr_warmup_steps/"
                "lr_decay_steps added to a run that started without them, "
                "which adds an optax schedule count leaf), migrate the "
                "checkpoint first: tools/migrate_checkpoint.py"
            )
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
