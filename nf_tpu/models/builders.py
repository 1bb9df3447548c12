"""Canonical model builders matching the reference example recipes.

Each builder returns a ready ``NormalizingFlow`` (or ``MultiscaleFlow``)
mirroring the corresponding reference notebook configuration (cited per
function), so benchmark and accuracy comparisons run the same recipe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import core
from .. import distributions as dist
from .. import flows as nff
from ..nets import MLP
from ..transforms import Logit
from ..utils.masks import create_alternating_binary_mask


def build_realnvp(key, dim=2, K=64, hidden=None, target=None,
                  trainable_base=False, scan=False, mixed_precision=False,
                  dtype=jnp.float32):
    """Real NVP stack: MaskedAffineFlow + ActNorm pairs
    (reference ``examples/real_nvp.ipynb`` cell 2: K=64, MLP [2,64,64,2],
    zero-init last layer).

    ``scan=True`` stacks the K/2 structurally identical
    (even-mask coupling, ActNorm, odd-mask coupling, ActNorm) units into one
    ``lax.scan`` (``flows.Scanned``): a single traced layer body instead of
    a K-deep unrolled graph — much faster XLA compiles for large K."""
    hidden = hidden or [dim * 32, dim * 32]
    keys = jax.random.split(key, 2 * K)
    layers = [dim] + list(hidden) + [dim]
    flows = []
    for i in range(K):
        b = create_alternating_binary_mask(dim, even=(i % 2 == 0),
                                           dtype=dtype)
        s = MLP.create(keys[2 * i], layers, init_zeros=True, dtype=dtype)
        t = MLP.create(keys[2 * i + 1], layers, init_zeros=True, dtype=dtype)
        if mixed_precision:
            from ..nets import MixedPrecision
            s, t = MixedPrecision(net=s), MixedPrecision(net=t)
        flows.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
        flows.append(nff.ActNorm.create(dim, dtype=dtype))
    if scan:
        if K % 2 != 0:
            raise ValueError("scan=True needs an even K")
        units = [nff.Composite(flows=tuple(flows[4 * i:4 * i + 4]))
                 for i in range(K // 2)]
        flows = [nff.Scanned.create(units)]
    q0 = dist.DiagGaussian.create(dim, trainable=trainable_base, dtype=dtype)
    return core.NormalizingFlow.create(q0, flows,
                                       p=target or dist.TwoModes())


def build_planar_stack(key, dim=2, K=16, target=None):
    """Planar flow stack for reverse-KL VI (reference ``planar.ipynb``)."""
    keys = jax.random.split(key, K)
    flows = [nff.Planar.create(keys[i], (dim,)) for i in range(K)]
    q0 = dist.DiagGaussian.create(dim, trainable=True)
    return core.NormalizingFlow.create(q0, flows, p=target)


def build_radial_stack(key, dim=2, K=16, target=None):
    """Radial flow stack (forward-only density refinement)."""
    keys = jax.random.split(key, K)
    flows = [nff.Radial.create(keys[i], (dim,)) for i in range(K)]
    q0 = dist.DiagGaussian.create(dim, trainable=True)
    return core.NormalizingFlow.create(q0, flows, p=target)


def build_nsf(key, dim=2, K=8, hidden=128, num_bins=8, num_blocks=2,
              tail_bound=3.0, permutation=True, target=None,
              mixed_precision=False):
    """Coupled RQ-spline NSF with LULinearPermute mixing
    (reference NSF recipes, e.g. ``comparison.ipynb``)."""
    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        flows.append(nff.CoupledRationalQuadraticSpline.create(
            keys[2 * i], num_input_channels=dim, num_blocks=num_blocks,
            num_hidden_channels=hidden, num_bins=num_bins,
            tail_bound=tail_bound, reverse_mask=(i % 2 == 1),
            mixed_precision=mixed_precision))
        if permutation:
            flows.append(nff.LULinearPermute.create(keys[2 * i + 1], dim))
    q0 = dist.DiagGaussian.create(dim, trainable=False)
    return core.NormalizingFlow.create(q0, flows, p=target)


def build_circular_nsf(key, dim=2, ind_circ=(0,), K=12, hidden=512,
                       num_bins=10, tail_bound=None, target=None,
                       scale=None, mixed_precision=False):
    """Circular autoregressive NSF on a cylinder — the reference paper
    example (``examples/paper_example_nsf.ipynb`` cell 8: K=12, 512 hidden,
    10 bins, UniformGaussian base, PeriodicWrap)."""
    ind_circ = list(ind_circ)
    if tail_bound is None:
        tb = np.full(dim, 3.0)
        tb[ind_circ] = np.pi
        tail_bound = jnp.asarray(tb, jnp.float32)
    if scale is None:
        sc = np.ones(dim)
        sc[ind_circ] = 2 * np.pi
        scale = jnp.asarray(sc, jnp.float32)
    keys = jax.random.split(key, K)
    flows = []
    for i in range(K):
        flows.append(nff.CircularAutoregressiveRationalQuadraticSpline.create(
            keys[i], num_input_channels=dim, num_blocks=1,
            num_hidden_channels=hidden, ind_circ=ind_circ, num_bins=num_bins,
            tail_bound=tail_bound, permute_mask=True,
            mixed_precision=mixed_precision))
    flows.append(nff.PeriodicWrap.create(ind_circ, bound=np.pi))
    q0 = dist.UniformGaussian.create(dim, ind=ind_circ, scale=scale)
    return core.NormalizingFlow.create(q0, flows, p=target)


def build_conditional_nsf(key, dim=2, context_size=4, K=4, hidden=64,
                          num_bins=8, num_blocks=2, target=None,
                          mixed_precision=False):
    """Conditional coupled-RQS NSF q(x|c): context threads into every
    conditioner and the model container
    (reference ``examples/conditional_flow.ipynb``)."""
    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        flows.append(nff.CoupledRationalQuadraticSpline.create(
            keys[2 * i], num_input_channels=dim, num_blocks=num_blocks,
            num_hidden_channels=hidden, num_context_channels=context_size,
            num_bins=num_bins, reverse_mask=(i % 2 == 1),
            mixed_precision=mixed_precision))
        flows.append(nff.LULinearPermute.create(keys[2 * i + 1], dim))
    q0 = dist.DiagGaussian.create(dim, trainable=False)
    return core.ConditionalNormalizingFlow.create(q0, flows, p=target)


def build_maf(key, dim=2, K=8, hidden=64, num_blocks=2, target=None,
              mixed_precision=False):
    """Masked autoregressive flow stack with permutations."""
    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        flows.append(nff.MaskedAffineAutoregressive.create(
            keys[2 * i], features=dim, hidden_features=hidden,
            num_blocks=num_blocks, mixed_precision=mixed_precision))
        flows.append(nff.Permute.create(keys[2 * i + 1], dim))
    q0 = dist.DiagGaussian.create(dim, trainable=False)
    return core.NormalizingFlow.create(q0, flows, p=target)


def build_residual(key, dim=2, K=16, hidden=128, n_hidden_layers=3,
                   lipschitz_const=0.9, reduce_memory=False, target=None,
                   actnorm=True):
    """Residual flow: iResBlocks over Lipschitz MLPs with ActNorm
    (reference ``examples/residual.ipynb`` cell 1: K=16, 128x3 net, L=0.9).
    Call ``nf_tpu.utils.optim.update_lipschitz`` after each training step."""
    from ..nets import LipschitzMLP

    keys = jax.random.split(key, K)
    flows = []
    for i in range(K):
        net = LipschitzMLP.create(
            keys[i], [dim] + [hidden] * n_hidden_layers + [dim],
            lipschitz_const=lipschitz_const)
        flows.append(nff.Residual.create(net, reduce_memory=reduce_memory))
        if actnorm:
            flows.append(nff.ActNorm.create(dim))
    q0 = dist.DiagGaussian.create(dim, trainable=False)
    return core.NormalizingFlow.create(q0, flows, p=target)


def build_image_nsf(key, input_shape=(3, 32, 32), L=2, K=4,
                    hidden_channels=64, num_bins=8, tail_bound=3.0,
                    num_classes=10, class_cond=False, num_blocks=2,
                    logit_alpha=0.05, mixed_precision=False,
                    dtype=jnp.float32):
    """Multi-scale neural-spline flow on images: per level, K x
    [ActNorm, LU 1x1-conv, RQS channel coupling with a ConvResidualNet
    conditioner] + Squeeze. The reference ships the pieces (4D spline
    coupling ``neural_spline/coupling.py:56-61``, ConvResidualNet
    ``nets/resnet.py:107``) but no assembled image-NSF; on TPU the
    elementwise spline rides the fused Pallas kernel (N = B*C*H*W/2
    elements per coupling)."""
    from ..nets import ConvResidualNet

    C, H, W = input_shape
    keys = jax.random.split(key, 2 * L * K)
    q0, flows, merges = [], [], []
    ki = 0
    for i in range(L):
        ch = C * 2 ** (L + 1 - i)
        flows_ = []
        for j in range(K):
            mask = np.asarray(create_alternating_binary_mask(
                ch, even=(j % 2 == 0))) * 2.0 - 1.0  # {-1, 1} channel mask
            def net_fn(k, in_ch, out_ch, _h=hidden_channels):
                net = ConvResidualNet.create(
                    k, in_ch, out_ch, _h, num_blocks=num_blocks,
                    dtype=dtype)
                if mixed_precision:
                    from ..nets import MixedPrecision
                    net = MixedPrecision(net=net)
                return net
            flows_.append(nff.ActNorm.create((ch, 1, 1), dtype=dtype))
            flows_.append(nff.Invertible1x1Conv.create(keys[ki], ch,
                                                       use_lu=True,
                                                       dtype=dtype))
            flows_.append(nff.PiecewiseRationalQuadraticCoupling.create(
                keys[ki + 1], mask, net_fn, num_bins=num_bins,
                tails="linear", tail_bound=tail_bound, dtype=dtype))
            ki += 2
        flows_.append(nff.Squeeze())
        flows.append(flows_)
        if i > 0:
            merges.append(nff.Merge())
            latent_shape = (C * 2 ** (L - i), H // 2 ** (L - i),
                            W // 2 ** (L - i))
        else:
            latent_shape = (C * 2 ** (L + 1), H // 2 ** L, W // 2 ** L)
        if class_cond:
            q0.append(dist.ClassCondDiagGaussian.create(latent_shape,
                                                        num_classes))
        else:
            q0.append(dist.GlowBase.create(latent_shape))
    return core.MultiscaleFlow.create(q0, flows, merges,
                                      transform=Logit(alpha=logit_alpha),
                                      class_cond=class_cond)


def build_glow_multiscale(key, input_shape=(3, 32, 32), L=3, K=16,
                          hidden_channels=256, num_classes=10,
                          class_cond=True, split_mode="channel",
                          scale=True, use_lu=True, logit_alpha=0.05,
                          scan=False, remat=False, mixed_precision=False,
                          dtype=jnp.float32):
    """Multi-scale Glow (reference ``examples/glow.ipynb`` cell 2: L=3,
    K=16, hidden 256, class-conditional base, Logit transform).

    ``scan=True`` packs each level's K structurally identical GlowBlocks
    into one ``lax.scan`` (single traced block body — much faster compiles
    at L=3 x K=16); ``remat=True`` additionally recomputes block
    activations in the backward pass (HBM for FLOPs)."""
    C, H, W = input_shape
    keys = jax.random.split(key, L * K)
    q0, flows, merges = [], [], []
    ki = 0
    for i in range(L):
        ch = C * 2 ** (L + 1 - i)
        blocks = [nff.GlowBlock.create(keys[ki + j], ch, hidden_channels,
                                       scale=scale, split_mode=split_mode,
                                       use_lu=use_lu,
                                       mixed_precision=mixed_precision,
                                       dtype=dtype)
                  for j in range(K)]
        flows_ = ([nff.Scanned.create(blocks, remat=remat)] if scan
                  else blocks)
        ki += K
        flows_.append(nff.Squeeze())
        flows.append(flows_)
        if i > 0:
            merges.append(nff.Merge())
            latent_shape = (C * 2 ** (L - i), H // 2 ** (L - i),
                            W // 2 ** (L - i))
        else:
            latent_shape = (C * 2 ** (L + 1), H // 2 ** L, W // 2 ** L)
        if class_cond:
            q0.append(dist.ClassCondDiagGaussian.create(latent_shape,
                                                        num_classes))
        else:
            q0.append(dist.GlowBase.create(latent_shape))
    return core.MultiscaleFlow.create(q0, flows, merges,
                                      transform=Logit(alpha=logit_alpha),
                                      class_cond=class_cond)
