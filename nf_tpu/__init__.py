"""nf_tpu — a TPU-native normalizing-flow framework.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capability surface
of ``normflows`` v1.7.3: composable invertible flow layers, base/target
distributions, forward/reverse-KL training, multiscale image flows, neural
spline flows, residual flows, and stochastic normalizing flows — all as pure
pytree programs that jit-compile and shard over TPU meshes.
"""

from . import (
    compat,
    compat_export,
    data,
    distributions,
    flows,
    nets,
    ops,
    sampling,
    serving,
    transforms,
    utils,
)
from .core import (
    ClassCondFlow,
    ConditionalNormalizingFlow,
    MultiscaleFlow,
    NormalizingFlow,
    NormalizingFlowVAE,
)

__version__ = "0.1.0"
