"""Conditioner networks (capability parity with reference ``normflows/nets/``)."""

from .cnn import Conv2d, ConvNet2d
from .made import (
    MADE,
    MaskedFeedforwardBlock,
    MaskedLinear,
    MaskedResidualBlock,
)
from .mlp import MLP, Linear, clamp_exp
from .precision import MixedPrecision
from .lipschitz import (
    InducedNormConv2d,
    InducedNormLinear,
    LipschitzCNN,
    LipschitzMLP,
    Swish,
    asym_squash,
    normalize_u,
    normalize_v,
    projmax,
    vector_norm,
)
from .resnet import (
    ConvResidualBlock,
    ConvResidualNet,
    ResidualBlock,
    ResidualNet,
)
