"""Behavioral parity against the reference PyTorch implementation:
instantiate the reference layer, copy its weights into ours, and compare
forward/inverse outputs and log-dets on identical inputs.

Skipped when the reference checkout is absent.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.flows as nff
from nf_tpu.nets import MLP

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def nf_ref():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import normflows as nf
    return nf


def _t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def _copy_mlp(torch_mlp, jax_mlp):
    """Copy torch nn.Sequential-of-Linear weights into our MLP pytree."""
    import torch

    torch_linears = [m for m in torch_mlp.net
                     if isinstance(m, torch.nn.Linear)]
    assert len(torch_linears) == len(jax_mlp.linears)
    new = tuple(
        l.replace(weight=_t2j(tl.weight),
                  bias=None if tl.bias is None else _t2j(tl.bias))
        for l, tl in zip(jax_mlp.linears, torch_linears))
    return jax_mlp.replace(linears=new)


def test_masked_affine_flow_parity(nf_ref):
    import torch

    torch.manual_seed(0)
    b_np = np.asarray([1.0, 0.0, 1.0], np.float32)
    s_t = nf_ref.nets.MLP([3, 16, 3])
    t_t = nf_ref.nets.MLP([3, 16, 3])
    ref = nf_ref.flows.MaskedAffineFlow(torch.tensor(b_np), t_t, s_t)

    key = jax.random.PRNGKey(0)
    s_j = _copy_mlp(s_t, MLP.create(key, [3, 16, 3]))
    t_j = _copy_mlp(t_t, MLP.create(key, [3, 16, 3]))
    ours = nff.MaskedAffineFlow.create(jnp.asarray(b_np), t=t_j, s=s_j)

    x_np = np.random.RandomState(1).randn(7, 3).astype(np.float32)
    zr, ldr = ref.forward(torch.tensor(x_np))
    zj, ldj = ours.forward(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-5)
    xr, lir = ref.inverse(torch.tensor(x_np))
    xj, lij = ours.inverse(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(xj), xr.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lij), lir.detach().numpy(),
                               atol=1e-5)


def test_actnorm_parity_including_data_dep_init(nf_ref):
    import torch

    ref = nf_ref.flows.ActNorm((3,))
    ours = nff.ActNorm.create(3)

    x_np = np.random.RandomState(2).randn(64, 3).astype(np.float32) * 2 + 1
    # reference initializes on the first forward call
    zr, ldr = ref.forward(torch.tensor(x_np))
    ours, zj, ldj = ours.init_data_forward(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-4)
    # post-init both directions agree on new data
    y_np = np.random.RandomState(3).randn(16, 3).astype(np.float32)
    zr, ldr = ref.forward(torch.tensor(y_np))
    zj, ldj = ours.forward(jnp.asarray(y_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-5)


def test_invertible_1x1_conv_lu_parity(nf_ref):
    import torch

    torch.manual_seed(0)
    ref = nf_ref.flows.Invertible1x1Conv(4, use_lu=True)
    ours = nff.Invertible1x1Conv.create(jax.random.PRNGKey(0), 4,
                                        use_lu=True)
    ours = ours.replace(P=_t2j(ref.P), L=_t2j(ref.L), U=_t2j(ref.U),
                        sign_S=_t2j(ref.sign_S), log_S=_t2j(ref.log_S))

    x_np = np.random.RandomState(4).randn(2, 4, 5, 5).astype(np.float32)
    zr, ldr = ref.forward(torch.tensor(x_np))
    zj, ldj = ours.forward(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj),
                               np.broadcast_to(ldr.detach().numpy(), (2,)),
                               atol=1e-4)
    zr, ldr = ref.inverse(torch.tensor(x_np))
    zj, ldj = ours.inverse(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj),
                               np.broadcast_to(ldr.detach().numpy(), (2,)),
                               atol=1e-4)


def _copy_masked_linear(tl, jl):
    np.testing.assert_array_equal(np.asarray(jl.mask),
                                  tl.mask.detach().numpy())
    return jl.replace(weight=_t2j(tl.weight), bias=_t2j(tl.bias))


def test_maf_made_parity(nf_ref):
    """Copy a full reference MADE into ours and compare the MAF layer."""
    import torch

    torch.manual_seed(0)
    ref = nf_ref.flows.MaskedAffineAutoregressive(
        features=4, hidden_features=16, num_blocks=2)
    ours = nff.MaskedAffineAutoregressive.create(
        jax.random.PRNGKey(0), features=4, hidden_features=16, num_blocks=2)

    rnet, jnet = ref.autoregressive_net, ours.autoregressive_net
    initial = _copy_masked_linear(rnet.initial_layer, jnet.initial_layer)
    blocks = []
    for rb, jb in zip(rnet.blocks, jnet.blocks):
        linears = tuple(_copy_masked_linear(rl, jl) for rl, jl in
                        zip(rb.linear_layers, jb.linears))
        blocks.append(jb.replace(linears=linears))
    head = jnet.bin_major_head  # (features, 2): our head is bin-major
    from nf_tpu.compat import _head_to_bin_major
    np.testing.assert_array_equal(
        np.asarray(_head_to_bin_major(
            _t2j(rnet.final_layer.mask), head)),
        np.asarray(jnet.final_layer.mask))
    final = jnet.final_layer.replace(
        weight=_head_to_bin_major(_t2j(rnet.final_layer.weight), head),
        bias=_head_to_bin_major(_t2j(rnet.final_layer.bias), head))
    jnet = jnet.replace(initial_layer=initial, blocks=tuple(blocks),
                        final_layer=final)
    ours = ours.replace(autoregressive_net=jnet)

    x_np = np.random.RandomState(5).randn(6, 4).astype(np.float32)
    zr, ldr = ref.forward(torch.tensor(x_np))
    zj, ldj = ours.forward(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-5)
    # D-pass sequential inverse
    zr, ldr = ref.inverse(torch.tensor(x_np))
    zj, ldj = ours.inverse(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-4)


def test_diag_gaussian_log_prob_parity(nf_ref):
    import torch

    from nf_tpu.distributions import DiagGaussian

    ref = nf_ref.distributions.DiagGaussian(3, trainable=False)
    ours = DiagGaussian.create(3, trainable=False)
    x_np = np.random.RandomState(6).randn(10, 3).astype(np.float32)
    lr = ref.log_prob(torch.tensor(x_np))
    lj = ours.log_prob(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(lj), lr.detach().numpy(),
                               atol=1e-5)


def test_planar_parity(nf_ref):
    import torch

    torch.manual_seed(0)
    ref = nf_ref.flows.Planar((3,), act="tanh")
    ours = nff.Planar.create(jax.random.PRNGKey(0), (3,), act="tanh")
    ours = ours.replace(u=_t2j(ref.u), w=_t2j(ref.w), b=_t2j(ref.b))
    x_np = np.random.RandomState(7).randn(5, 3).astype(np.float32)
    zr, ldr = ref.forward(torch.tensor(x_np))
    zj, ldj = ours.forward(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-5)


def _copy_convnet(torch_net, jax_net):
    import torch

    tconvs = [m for m in torch_net.net if isinstance(m, torch.nn.Conv2d)]
    assert len(tconvs) == len(jax_net.convs)
    convs = tuple(
        c.replace(weight=_t2j(tc.weight),
                  bias=None if tc.bias is None else _t2j(tc.bias))
        for c, tc in zip(jax_net.convs, tconvs))
    return jax_net.replace(convs=convs)


def test_glow_block_parity(nf_ref):
    """Full GlowBlock (coupling w/ ConvNet2d + LU 1x1 conv + ActNorm):
    copy every weight, run the reference's first-batch init on both sides,
    compare fwd/inv + log-dets."""
    import torch

    torch.manual_seed(0)
    C, H = 4, 6
    ref = nf_ref.flows.GlowBlock(C, 16, scale=True, split_mode="channel",
                                 use_lu=True)
    ours = nff.GlowBlock.create(jax.random.PRNGKey(0), C, 16, scale=True,
                                split_mode="channel", use_lu=True)

    # ref.flows = [AffineCouplingBlock, Invertible1x1Conv, ActNorm]
    rcb, rconv = ref.flows[0], ref.flows[1]
    jcb, jconv, jact = ours.flows
    param_map = _copy_convnet(rcb.flows[1].param_map, jcb.coupling.param_map)
    jcb = jcb.replace(coupling=jcb.coupling.replace(param_map=param_map))
    jconv = jconv.replace(P=_t2j(rconv.P), L=_t2j(rconv.L),
                          U=_t2j(rconv.U), sign_S=_t2j(rconv.sign_S),
                          log_S=_t2j(rconv.log_S))
    ours = ours.replace(flows=(jcb, jconv, jact))

    x_np = np.random.RandomState(8).randn(3, C, H, H).astype(np.float32)
    zr, ldr = ref.forward(torch.tensor(x_np))        # inits ref ActNorm
    ours, zj, ldj = ours.init_data_forward(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-3)
    y_np = np.random.RandomState(9).randn(3, C, H, H).astype(np.float32)
    for direction in ("forward", "inverse"):
        zr, ldr = getattr(ref, direction)(torch.tensor(y_np))
        zj, ldj = getattr(ours, direction)(jnp.asarray(y_np))
        np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                                   atol=1e-4, err_msg=direction)
        np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                                   atol=1e-3, err_msg=direction)


def _copy_residual_net(torch_net, jax_net):
    initial = jax_net.initial_layer.replace(
        weight=_t2j(torch_net.initial_layer.weight),
        bias=_t2j(torch_net.initial_layer.bias))
    blocks = []
    for rb, jb in zip(torch_net.blocks, jax_net.blocks):
        linears = tuple(
            jl.replace(weight=_t2j(rl.weight), bias=_t2j(rl.bias))
            for rl, jl in zip(rb.linear_layers, jb.linears))
        blocks.append(jb.replace(linears=linears))
    final_w = _t2j(torch_net.final_layer.weight)
    final_b = _t2j(torch_net.final_layer.bias)
    if getattr(jax_net, "bin_major_head", None) is not None:
        # our head emits bin-major rows; the reference layout is
        # feature-major — same weights up to a fixed row permutation
        from nf_tpu.compat import _head_to_bin_major
        final_w = _head_to_bin_major(final_w, jax_net.bin_major_head)
        final_b = _head_to_bin_major(final_b, jax_net.bin_major_head)
    final = jax_net.final_layer.replace(weight=final_w, bias=final_b)
    return jax_net.replace(initial_layer=initial, blocks=tuple(blocks),
                           final_layer=final)


def test_coupled_rqs_wrapper_parity(nf_ref):
    """CoupledRationalQuadraticSpline: copy the ResidualNet conditioner and
    compare the full spline coupling both directions (exercises mask
    construction, param reshaping, and the spline kernel semantics)."""
    import torch

    torch.manual_seed(0)
    D, K = 4, 5
    ref = nf_ref.flows.CoupledRationalQuadraticSpline(
        num_input_channels=D, num_blocks=2, num_hidden_channels=16,
        num_bins=K, tails="linear", tail_bound=3.0)
    ours = nff.CoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), num_input_channels=D, num_blocks=2,
        num_hidden_channels=16, num_bins=K, tail_bound=3.0)

    rnet = ref.prqct.transform_net
    jnet = ours.prqct.transform_net
    ours = ours.replace(prqct=ours.prqct.replace(
        transform_net=_copy_residual_net(rnet, jnet)))

    x_np = np.random.RandomState(10).randn(6, D).astype(np.float32) * 2
    for direction in ("forward", "inverse"):
        zr, ldr = getattr(ref, direction)(torch.tensor(x_np))
        zj, ldj = getattr(ours, direction)(jnp.asarray(x_np))
        np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                                   atol=1e-4, err_msg=direction)
        np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                                   atol=1e-4, err_msg=direction)


def test_gaussian_mixture_log_prob_parity(nf_ref):
    import torch

    from nf_tpu.distributions import GaussianMixture

    loc = np.asarray([[-1.0, 0.5], [1.0, -0.5]], np.float32)
    scale = np.asarray([[0.5, 1.0], [1.5, 0.7]], np.float32)
    w = np.asarray([0.3, 0.7], np.float32)
    ref = nf_ref.distributions.GaussianMixture(
        2, 2, loc=loc, scale=scale, weights=w)
    ours = GaussianMixture.create(2, 2, loc=loc, scale=scale, weights=w)
    x_np = np.random.RandomState(11).randn(20, 2).astype(np.float32)
    lr = ref.log_prob(torch.tensor(x_np).double())
    lj = ours.log_prob(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(lj), lr.detach().numpy(),
                               atol=1e-5)


def test_two_modes_target_parity(nf_ref):
    import torch

    from nf_tpu.distributions import TwoModes

    ref = nf_ref.distributions.TwoModes(2.0, 0.2)
    ours = TwoModes(loc=2.0, scale=0.2)
    x_np = np.random.RandomState(12).randn(40, 2).astype(np.float32) * 2
    lr = ref.log_prob(torch.tensor(x_np))
    lj = ours.log_prob(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(lj), lr.detach().numpy(),
                               atol=1e-4)


def test_two_moons_target_parity(nf_ref):
    import torch

    from nf_tpu.distributions import TwoMoons

    ref = nf_ref.distributions.TwoMoons()
    ours = TwoMoons()
    x_np = np.random.RandomState(13).randn(40, 2).astype(np.float32) * 2
    lr = ref.log_prob(torch.tensor(x_np))
    lj = ours.log_prob(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(lj), lr.detach().numpy(),
                               atol=1e-4)


def test_logit_transform_parity(nf_ref):
    import torch

    from nf_tpu.transforms import Logit

    ref = nf_ref.transforms.Logit(alpha=0.05)
    ours = Logit(alpha=0.05)
    x_np = np.random.RandomState(14).rand(10, 3).astype(np.float32)
    zr, ldr = ref.inverse(torch.tensor(x_np))
    zj, ldj = ours.inverse(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(zj), zr.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), ldr.detach().numpy(),
                               atol=1e-4)
    yr, lir = ref.forward(zr)
    yj, lij = ours.forward(zj)
    np.testing.assert_allclose(np.asarray(yj), yr.detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lij), lir.detach().numpy(),
                               atol=1e-4)


def test_glow_base_parity(nf_ref):
    import torch

    from nf_tpu.distributions import GlowBase

    ref = nf_ref.distributions.GlowBase((3, 4, 4))
    ours = GlowBase.create((3, 4, 4))
    x_np = np.random.RandomState(15).randn(5, 3, 4, 4).astype(np.float32)
    lr = ref.log_prob(torch.tensor(x_np))
    lj = ours.log_prob(jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(lj), lr.detach().numpy(),
                               atol=1e-3)


class TestInducedNormGeneric:
    """Generic (p, q) induced-norm helpers and power iteration vs the
    reference (``normflows/nets/lipschitz.py:642-714`` helpers;
    ``132-295`` InducedNormLinear)."""

    def test_normalize_helpers_parity(self, nf_ref):
        import torch

        from normflows.nets.lipschitz import (
            normalize_u as t_normalize_u,
            normalize_v as t_normalize_v,
            projmax_ as t_projmax,
        )

        from nf_tpu.nets import normalize_u, normalize_v, projmax

        rng = np.random.default_rng(3)
        x = rng.normal(size=37).astype(np.float32)
        for domain in (1.0, 1.5, 2.0, 3.0):
            ours = np.asarray(normalize_v(jnp.asarray(x), domain))
            ref = t_normalize_v(torch.from_numpy(x.copy()), domain).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-5,
                                       err_msg=f"normalize_v p={domain}")
        for codomain in (1.0, 1.5, 2.0, 3.0, float("inf")):
            ours = np.asarray(normalize_u(jnp.asarray(x), codomain))
            ref = t_normalize_u(torch.from_numpy(x.copy()),
                                codomain).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-5,
                                       err_msg=f"normalize_u q={codomain}")
        ours = np.asarray(projmax(jnp.asarray(x)))
        ref = t_projmax(torch.from_numpy(x.copy())).numpy()
        np.testing.assert_allclose(ours, ref, atol=0)

    def test_asym_squash_parity(self, nf_ref):
        import torch

        from normflows.nets.lipschitz import asym_squash as t_asym_squash

        from nf_tpu.nets import asym_squash

        x = np.linspace(-4, 4, 23).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(asym_squash(jnp.asarray(x))),
            t_asym_squash(torch.from_numpy(x)).numpy(), atol=1e-6)

    @pytest.mark.parametrize("domain,codomain", [(1.5, 3.0), (2.0, 2.0),
                                                 (1.0, float("inf"))])
    def test_induced_norm_linear_sigma_parity(self, nf_ref, domain,
                                              codomain):
        """Weight-copied power iteration: same W and same starting u/v must
        give the same sigma estimate and effective weight after n steps."""
        import torch

        from normflows.nets.lipschitz import InducedNormLinear as TRef

        from nf_tpu.nets import InducedNormLinear

        torch.manual_seed(0)
        tl = TRef(9, 7, coeff=0.9, domain=domain, codomain=codomain,
                  n_iterations=5)
        key = jax.random.PRNGKey(0)
        ours = InducedNormLinear.create(key, 9, 7, coeff=0.9,
                                        domain=domain, codomain=codomain,
                                        n_iterations=5)
        # copy weight/bias AND the reference's converged u/v buffers
        ours = ours.replace(weight=_t2j(tl.weight), bias=_t2j(tl.bias),
                            u=_t2j(tl.u), v=_t2j(tl.v))
        # run the same number of fresh iterations on both sides
        tl.compute_weight(update=True, n_iterations=8)
        ours = ours.update_power_iteration(8)
        sigma_ref = float(torch.dot(
            tl.u, torch.mv(tl.weight.detach(), tl.v)))
        np.testing.assert_allclose(float(ours.scale), sigma_ref, atol=2e-4)
        w_eff_ref = tl.compute_weight(update=False).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours._effective_weight()),
                                   w_eff_ref, atol=2e-4)

        x = np.random.default_rng(0).normal(size=(5, 9)).astype(np.float32)
        y_ref = tl(torch.from_numpy(x)).detach().numpy()
        y_ours = np.asarray(ours(jnp.asarray(x)))
        np.testing.assert_allclose(y_ours, y_ref, atol=2e-4)
