"""Parallelism: device meshes, sharded training steps, collective losses.

The reference has **no distributed backend at all** (SURVEY §2.6 — no
torch.distributed/NCCL/MPI anywhere); this package is the new first-class
TPU-native equivalent: ``jax.sharding.Mesh`` over ICI, batch/sample-dimension
sharding with ``NamedSharding``, and psum-reduced losses/gradients via
``shard_map`` where explicit collectives are clearer than the SPMD
partitioner's defaults.
"""

from .mesh import data_sharding, make_mesh, replicated
from .multihost import (
    host_local_to_global,
    initialize_distributed,
    make_hybrid_mesh,
    per_process_batches,
    process_slice,
)
from .sampling import log_normalizer, make_sharded_sampler
from .tp import param_shardings, shard_params
from .train import (
    TrainState,
    ema_model,
    init_train_state,
    make_forward_kld_step,
    make_reverse_kld_step,
    model_of_state,
    reshape_for_accum,
    shard_batch,
)
