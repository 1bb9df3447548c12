"""Mesh construction and sharding helpers.

Flow models are small (all-replicated parameters) while the work scales in
the batch/sample dimension, so the canonical mesh is 1-D over the ``data``
axis: samples shard across chips, parameters replicate, and loss/grad
reductions ride ICI as psums.  ``make_mesh`` also accepts 2-D shapes for
future model-parallel layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Defaults to a 1-D ``data`` mesh over all devices.  ``shape`` must
    multiply to the device count when given.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError("shape required for multi-axis meshes")
        shape = (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data",
                  dim: int = 0) -> NamedSharding:
    """Shard one (batch/sample) axis — ``dim``, default the leading one —
    over the ``axis`` mesh axis, replicate the rest. 0-dim leaves (per-batch
    scalar metadata) replicate. ``dim=1`` is the microbatched layout
    ``(accum_steps, micro, ...)`` used by gradient accumulation."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    spec = [None] * ndim
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
