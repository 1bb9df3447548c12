"""Distributions (capability parity with reference
``normflows/distributions/__init__.py``)."""

from .base import (
    AffineGaussian,
    BaseDistribution,
    ClassCondDiagGaussian,
    ConditionalDiagGaussian,
    DiagGaussian,
    GaussianMixture,
    GaussianPCA,
    GlowBase,
    Uniform,
    UniformGaussian,
)
from .decoder import BaseDecoder, NNBernoulliDecoder, NNDiagGaussianDecoder
from .encoder import (
    BaseEncoder,
    ConstDiagGaussian,
    Dirac,
    NNDiagGaussian,
)
from .encoder import Uniform as UniformEncoder
from .linear_interpolation import LinearInterpolation
from .mh_proposal import DiagGaussianProposal, MHProposal
from .prior import (
    ImagePrior,
    PriorDistribution,
    Sinusoidal,
    Sinusoidal_gap,
    Sinusoidal_split,
    Smiley,
    TwoModes,
)
from .target import (
    CircularGaussianMixture,
    RingMixture,
    Target,
    TwoIndependent,
    TwoMoons,
    rejection_sample,
)
from .target import ConditionalDiagGaussian as ConditionalDiagGaussianTarget
