"""Tensor/FSDP-style parameter sharding over a mesh axis.

Flows have no attention; the tensor-parallel surface is the conditioner
networks' dense layers (MLP/ResidualNet/MADE hidden dims, ConvNet2d
channels). The XLA-native recipe: assign every eligible weight a
``NamedSharding`` that splits its output dimension over the ``model`` axis
and let the SPMD partitioner propagate activations and insert the
all-gathers/reduce-scatters (Megatron-style column/row splits fall out of
propagation). The same helper with ``axis="data"`` gives FSDP-style
(ZeRO-3) parameter sharding.

Used by ``__graft_entry__.dryrun_multichip`` over a (data x model) mesh and
by ``make_forward_kld_step(param_shardings=...)``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_shardings(params, mesh: Mesh, axis: str = "model",
                    min_size: int = 2):
    """A pytree of ``NamedSharding`` matching ``params``.

    Every array with a dimension divisible by the ``axis`` size (preferring
    the leading/output dimension of 2D+ weights) is split on that
    dimension; everything else replicates. Correctness never depends on the
    choice — the SPMD partitioner inserts whatever collectives the
    shardings imply.
    """
    size = mesh.shape[axis]

    def spec(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0 or size == 1:
            return P()
        shape = leaf.shape
        # first dim that divides evenly and is big enough to be worth it
        # (axis 0 = the output dim of (out, in) / OIHW weights)
        for d in range(leaf.ndim):
            if shape[d] % size == 0 and shape[d] // size >= min_size:
                parts = [None] * leaf.ndim
                parts[d] = axis
                return P(*parts)
        return P()

    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, spec(leaf)), params)


def shard_params(params, mesh: Mesh, axis: str = "model", min_size: int = 2):
    """Device-put ``params`` with :func:`param_shardings`."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh, axis,
                                                min_size))
