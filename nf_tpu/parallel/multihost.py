"""Multi-host (multi-process) runtime: distributed init, hybrid ICI x DCN
meshes, and per-process data loading.

The reference is single-process eager PyTorch with no distributed backend of
any kind (SURVEY §2.6: no ``torch.distributed``/NCCL/MPI anywhere). This
module is the TPU-native replacement at the *host* level, complementing the
in-program sharding in :mod:`nf_tpu.parallel.train`:

* :func:`initialize_distributed` — bring up the JAX distributed runtime
  (coordinator + heartbeats). On TPU pods the coordinator/topology is
  auto-detected from the environment; on CPU it enables the gloo collective
  backend so the SAME multi-process programs run as host-only tests.
* :func:`make_hybrid_mesh` — a device mesh whose *outer* axes span hosts
  (DCN — slow, scarce bandwidth) and *inner* axes span the chips inside a
  slice (ICI — fast). Keep data-parallel axes on DCN and model/sample axes
  on ICI so collective-heavy traffic rides ICI (scaling-book recipe).
* :func:`per_process_batches` / :func:`host_local_to_global` — the
  per-process data path: every process computes the *same* global batch
  schedule from the shared seed, materialises only its own slice, and
  assembles the global sharded array with
  ``jax.make_array_from_process_local_data``. Semantics are independent of
  the process count: N processes feeding 1/N of each batch train the exact
  same model as one process feeding all of it (tested in
  ``tests/test_multihost.py`` by bitwise loss comparison).

Single-process (including single-chip TPU and the virtual CPU test mesh)
needs none of this: everything here degrades to a no-op/identity then.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import data_sharding


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           platform: Optional[str] = None,
                           **kwargs) -> tuple[int, int]:
    """Start the JAX distributed runtime and return
    ``(process_index, process_count)``.

    On TPU pods call with no arguments — coordinator and topology are
    detected from the TPU environment. For CPU-based multi-process tests
    (and GPU-style manual clusters) pass the coordinator/num/id triple.

    ``platform="cpu"`` forces the CPU backend *via jax.config* (env vars
    cannot override a latched platform, see CLAUDE.md) and selects the gloo
    cross-process collectives implementation so ``psum`` & friends work
    host-to-host without TPU hardware.

    Idempotent: calling again after initialization is a no-op returning the
    current coordinates.
    """
    if jax.distributed.is_initialized():  # already up
        return jax.process_index(), jax.process_count()
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return jax.process_index(), jax.process_count()


def make_hybrid_mesh(axis_names: Sequence[str],
                     ici_shape: Sequence[int],
                     dcn_shape: Optional[Sequence[int]] = None,
                     devices=None) -> Mesh:
    """Mesh over a multi-host topology: per-axis ``ici_shape`` chips inside
    each slice/host group x ``dcn_shape`` groups across the data-center
    network.

    ``len(axis_names) == len(ici_shape) == len(dcn_shape)``; axis ``i``
    spans ``ici_shape[i] * dcn_shape[i]`` devices. Axes that should
    communicate often (tensor/sample parallel) get ``dcn_shape[i] == 1`` so
    their collectives stay on ICI; the data-parallel axis typically carries
    the DCN factor (its gradient all-reduce is one small, latency-tolerant
    transfer per step).

    Example, 2 hosts x 8 chips, data-parallel across hosts and
    sample-parallel inside each:

        mesh = make_hybrid_mesh(("data", "sample"), ici_shape=(1, 8),
                                dcn_shape=(2, 1))

    With ``dcn_shape`` of all ones (or None) this degrades to an ordinary
    single-slice mesh and works in single-process environments too.
    """
    if dcn_shape is None:
        dcn_shape = (1,) * len(ici_shape)
    if len(axis_names) != len(ici_shape) or len(ici_shape) != len(dcn_shape):
        raise ValueError(
            f"axis_names/ici_shape/dcn_shape lengths differ: "
            f"{len(axis_names)}/{len(ici_shape)}/{len(dcn_shape)}")
    from jax.experimental import mesh_utils

    if all(d == 1 for d in dcn_shape):
        dev = mesh_utils.create_device_mesh(tuple(ici_shape),
                                            devices=devices)
    else:
        devs = list(devices) if devices is not None else jax.devices()
        # multi-slice TPUs group DCN granules by slice_index; CPU/GPU test
        # clusters (where every device reports slice 0/None) group by
        # process — pick whichever grouping yields prod(dcn_shape) granules
        n_slices = len({getattr(d, "slice_index", None) for d in devs})
        by_process = n_slices != int(np.prod(dcn_shape))
        dev = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), tuple(dcn_shape), devices=devices,
            process_is_granule=by_process)
    return Mesh(dev, tuple(axis_names))


def process_slice(global_batch: int,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """This process's contiguous slice of a global batch dimension."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc != 0:
        raise ValueError(
            f"global batch {global_batch} must divide over {pc} processes")
    local = global_batch // pc
    return slice(pi * local, (pi + 1) * local)


def host_local_to_global(mesh: Mesh, local_batch, axis: str = "data",
                         dim: int = 0):
    """Assemble per-process local batch slices into global jax.Arrays
    sharded on dim ``dim`` (default the leading one) over ``axis``.

    Each process passes only its own rows (in process order); the result is
    a global array whose ``dim`` extent is ``local rows x process_count``,
    addressable by the jitted SPMD program. ``dim=1`` is the microbatched
    gradient-accumulation layout ``(accum_steps, micro, ...)`` where the
    micro dim is the sharded one (see ``parallel.train.reshape_for_accum``).
    Single-process: equivalent to a sharded ``device_put``.
    """
    def put(x):
        x = np.asarray(x)
        global_shape = list(x.shape)
        global_shape[dim] *= jax.process_count()
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim, axis=axis, dim=dim), x,
            tuple(global_shape))

    return jax.tree_util.tree_map(put, local_batch)


def per_process_batches(arrays, global_batch: int, mesh: Mesh,
                        num_iters: Optional[int] = None, seed: int = 0,
                        axis: str = "data") -> Iterator:
    """Multi-host batch stream with process-count-independent semantics.

    Every process draws the SAME global index schedule from ``seed``
    (``np.random.default_rng`` — host-side, no device RNG), gathers only its
    ``process_slice`` of each batch from its local ``arrays``, and yields
    globally-sharded device arrays. The training step never sees process
    boundaries; running with 1 process or N produces identical batches.

    ``arrays``: tuple of equal-length numpy arrays replicated on every host
    (the common case for flow-model datasets; for datasets too large per
    host, pass a per-process shard plus an index offset at load time).
    """
    if not isinstance(arrays, (tuple, list)):
        arrays = (arrays,)
    n = len(arrays[0])
    rng = np.random.default_rng(seed)
    sl = process_slice(global_batch)
    it = 0
    while num_iters is None or it < num_iters:
        idx = rng.integers(0, n, size=global_batch)[sl]
        batch = tuple(a[idx] for a in arrays)
        yield host_local_to_global(
            mesh, batch if len(batch) > 1 else batch[0], axis=axis)
        it += 1
