"""Mesh construction + canonical shardings.

1-D "data" mesh over all chips by default; the axis name is a parameter so a
future 2-D (data, model) mesh composes without touching call sites. XLA lowers
the gradient reduction over this axis to an ICI all-reduce on real hardware
(scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(axis_names) != 1:
        raise NotImplementedError("only 1-D meshes are built here for now")
    return Mesh(np.asarray(devices), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
