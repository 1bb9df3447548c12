"""Flow layers (capability parity with reference ``normflows/flows/__init__.py``)."""

from .base import Composite, Flow, Reverse, Scanned, zero_log_det_like_z
from .affine import (
    AffineConstFlow,
    AffineCoupling,
    AffineCouplingBlock,
    CCAffineConst,
    MaskedAffineFlow,
)
from .mixing import (
    Invertible1x1Conv,
    InvertibleAffine,
    LULinear,
    LULinearPermute,
    Permute,
    _Permutation,
    _RandomPermutation,
)
from .normalization import ActNorm, BatchNorm
from .planar import Planar
from .radial import Radial
from .reshape import Merge, Split, Squeeze
from .periodic import PeriodicShift, PeriodicWrap
