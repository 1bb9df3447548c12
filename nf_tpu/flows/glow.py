"""GlowBlock (reference ``normflows/flows/affine/glow.py:11-84``):
affine coupling with a ConvNet2d conditioner (kernels 3,1,3), invertible 1x1
convolution (dropped for single-channel data), and ActNorm."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nets.cnn import ConvNet2d
from .affine import AffineCouplingBlock
from .base import Composite
from .mixing import Invertible1x1Conv
from .normalization import ActNorm


class GlowBlock(Composite):
    """One Glow block; channel arithmetic for the split modes follows
    reference ``glow.py:49-64``."""

    @classmethod
    def create(cls, key, channels, hidden_channels, scale=True,
               scale_map="sigmoid", split_mode="channel", leaky=0.0,
               init_zeros=True, use_lu=True, net_actnorm=False,
               mixed_precision=False, dtype=jnp.float32):
        k_net, k_conv = jax.random.split(key)
        flows = []
        kernel_size = (3, 1, 3)
        num_param = 2 if scale else 1
        if split_mode == "channel":
            channels_ = ((channels + 1) // 2,) + 2 * (hidden_channels,)
            channels_ += (num_param * (channels // 2),)
        elif split_mode == "channel_inv":
            channels_ = (channels // 2,) + 2 * (hidden_channels,)
            channels_ += (num_param * ((channels + 1) // 2),)
        elif "checkerboard" in split_mode:
            channels_ = (channels,) + 2 * (hidden_channels,)
            channels_ += (num_param * channels,)
        else:
            raise NotImplementedError(f"Mode {split_mode} is not implemented.")
        param_map = ConvNet2d.create(k_net, channels_, kernel_size, leaky,
                                     init_zeros, actnorm=net_actnorm,
                                     dtype=dtype)
        if mixed_precision:
            from ..nets.precision import MixedPrecision
            param_map = MixedPrecision(net=param_map)
        flows.append(AffineCouplingBlock.create(param_map, scale, scale_map,
                                                split_mode))
        if channels > 1:
            flows.append(Invertible1x1Conv.create(k_conv, channels,
                                                  use_lu=use_lu, dtype=dtype))
        flows.append(ActNorm.create((channels, 1, 1), dtype=dtype))
        return cls(flows=tuple(flows))
