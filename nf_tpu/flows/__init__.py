"""Flow layers (capability parity with reference ``normflows/flows/__init__.py``)."""

from .base import Composite, Flow, Reverse, Scanned, zero_log_det_like_z
from .affine import (
    AffineConstFlow,
    AffineCoupling,
    AffineCouplingBlock,
    CCAffineConst,
    MaskedAffineFlow,
)
from .autoregressive import Autoregressive, MaskedAffineAutoregressive
from .glow import GlowBlock
from .mixing import (
    Invertible1x1Conv,
    InvertibleAffine,
    LULinear,
    LULinearPermute,
    Permute,
    _Permutation,
    _RandomPermutation,
)
from .neural_spline import (
    AutoregressiveRationalQuadraticSpline,
    CircularAutoregressiveRationalQuadraticSpline,
    CircularCoupledRationalQuadraticSpline,
    CoupledRationalQuadraticSpline,
    PiecewiseRationalQuadraticCDF,
    PiecewiseRationalQuadraticCoupling,
)
from .neural_spline.coupling import Coupling
from .neural_spline.autoregressive import (
    MaskedPiecewiseRationalQuadraticAutoregressive,
)
from .normalization import ActNorm, BatchNorm
from .periodic import PeriodicShift, PeriodicWrap
from .planar import Planar
from .radial import Radial
from .residual import set_exact_logdet, Residual, iResBlock
from .reshape import Merge, Split, Squeeze
from .stochastic import HamiltonianMonteCarlo, MetropolisHastings
