"""Device-mesh helpers.

The framework's scale axis is the RAG itself (BASELINE.json north star):
edges are partitioned across devices ("edge" axis), regions are partitioned
for reduction outputs ("region" blocks of the same axis).  A 1-D mesh is the
natural fit for 2D/3D EM stacks; multi-host slices extend the same axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


EDGE_AXIS = "edge"


def make_mesh(n_devices=None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EDGE_AXIS,))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(EDGE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr, multiple, axis=0, fill=0):
    """Pad along axis so shape[axis] % multiple == 0; returns (padded, n_valid)."""
    arr = np.asarray(arr)
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(arr, pad_width, constant_values=fill), n
