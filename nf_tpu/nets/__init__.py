"""Conditioner networks (capability parity with reference ``normflows/nets/``)."""

from .mlp import MLP, Linear, clamp_exp
