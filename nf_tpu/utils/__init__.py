"""Utilities: module system, masks, nn helpers, eval metrics."""

from .masks import (
    create_alternating_binary_mask,
    create_mid_split_binary_mask,
    create_random_binary_mask,
)
from .module import (
    Module,
    buffer_field,
    combine,
    is_array,
    is_inexact_array,
    partition,
    partition_arrays,
    static_field,
    stop_gradient_params,
    tree_size,
)
from .config import TrainConfig
from .debug import checked, debug_nans
from .logging import MetricLogger, effective_sample_size, mcmc_acceptance_rate
from .optim import lipschitz_scales, update_lipschitz
from .profiling import (Named, enable_compilation_cache,
                        throughput, trace)
from .serialization import CheckpointManager, load, save
from .eval import bits_per_dim, bits_per_dim_dataset
from .nn import (
    ClampExp,
    ConstScaleLayer,
    PeriodicFeaturesCat,
    PeriodicFeaturesElementwise,
    sum_except_batch,
    tile,
)
from .preprocessing import Jitter, Logit, Logit as LogitPreprocessing, Scale
# net-side ActNorm layer (reference exports it as ``utils.ActNorm``,
# ``normflows/utils/nn.py:27``); the flow-layer ActNorm lives in ``flows``.
from ..nets.cnn import _NetActNorm as ActNorm  # noqa: F401

# reference-spelling aliases (normflows ``utils.bitsPerDim`` etc.)
bitsPerDim = bits_per_dim
bitsPerDimDataset = bits_per_dim_dataset
