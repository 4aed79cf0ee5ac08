"""Device mesh construction and sharding helpers.

The reference is a single C++ process with no parallel backend (its OpenMP
pragmas are commented out, ``fm_learn_vb.h:394,426``).  Here every learner
runs SPMD over a 1-D ``(data,)`` mesh: training rows and their e/q/t residual
caches are row-sharded, model/variational parameters are replicated, and
per-column / scalar sufficient statistics are combined with ``psum`` over the
data axis inside ``shard_map``.  A single-device mesh is the degenerate case,
so one code path serves 1 chip to a pod slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FEATURE_AXIS = "feature"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh2d(n_data: Optional[int] = None, n_feature: int = 1,
                devices=None) -> Mesh:
    """2-D ``(data, feature)`` mesh for feature-sharded (tensor-parallel)
    training: rows shard over ``data``, parameter tables over ``feature``.
    With ``n_data=None`` all devices are used (``n_data = len/n_feature``)."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_feature
    devices = devices[: n_data * n_feature]
    arr = np.asarray(devices).reshape(n_data, n_feature)
    return Mesh(arr, (DATA_AXIS, FEATURE_AXIS))


def data_spec(mesh: Mesh, *, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, arr) -> jax.Array:
    """Place a [N, ...] array row-sharded over the data axis."""
    return jax.device_put(arr, data_spec(mesh))


def put_replicated(mesh: Mesh, arr) -> jax.Array:
    return jax.device_put(arr, replicated(mesh))


def psum_data(x):
    """psum over the data axis (call inside shard_map)."""
    return jax.lax.psum(x, DATA_AXIS)
