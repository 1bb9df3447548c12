"""Checkpoint migration (nf_tpu.compat): load a reference torch
``state_dict`` into the matching nf_tpu model and verify identical
densities/outputs on the same inputs — the user-facing switch-over path.

Skipped when the reference checkout is absent.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.compat import import_state_dict
from nf_tpu.nets import MLP

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference checkout not available")

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def nf_ref():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import normflows as nf
    return nf


def _randomize(torch_model, seed=0):
    """Give every parameter a non-trivial value (builders zero-init) and
    mark data-dependent init as done, as in a trained checkpoint."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in torch_model.parameters():
            p.copy_(0.3 * torch.randn(p.shape, generator=g))
        for name, b in torch_model.named_buffers():
            if name.endswith("data_dep_init_done"):
                b.fill_(1.0)
    return torch_model


def _sd(torch_model):
    return {k: v.numpy() for k, v in torch_model.state_dict().items()}


def _build_ref_realnvp(nf_ref, K=4, hidden=16):
    import torch

    flows = []
    for i in range(K):
        b = torch.tensor([(j + i) % 2 for j in range(2)], dtype=torch.float32)
        s = nf_ref.nets.MLP([2, hidden, 2], init_zeros=True)
        t = nf_ref.nets.MLP([2, hidden, 2], init_zeros=True)
        flows.append(nf_ref.flows.MaskedAffineFlow(b, t=t, s=s))
        flows.append(nf_ref.flows.ActNorm(2))
    q0 = nf_ref.distributions.DiagGaussian(2)
    return nf_ref.NormalizingFlow(q0, flows)


def _build_our_realnvp(K=4, hidden=16, scan=False):
    keys = jax.random.split(KEY, 2 * K)
    units = []
    for i in range(K):
        b = jnp.array([(j + i) % 2 for j in range(2)], jnp.float32)
        s = MLP.create(keys[2 * i], [2, hidden, 2], init_zeros=True)
        t = MLP.create(keys[2 * i + 1], [2, hidden, 2], init_zeros=True)
        units.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
        units.append(nff.ActNorm.create(2))
    if scan:
        # mirror build_realnvp's scan grouping: 2 coupling+ActNorm pairs
        # per structurally identical Composite unit
        units = [nff.Composite(flows=tuple(units[4 * i:4 * i + 4]))
                 for i in range(K // 2)]
        units = [nff.Scanned.create(units)]
    return nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2), units)


@pytest.mark.parametrize("scan", [False, True])
def test_realnvp_state_dict_roundtrip(nf_ref, scan):
    """Unrolled reference checkpoint loads into both the layer-list and the
    Scanned (lax.scan-stacked) variants with identical densities."""
    import torch

    ref = _randomize(_build_ref_realnvp(nf_ref))
    model = import_state_dict(_build_our_realnvp(scan=scan), _sd(ref))

    x = np.random.default_rng(1).normal(size=(64, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_nsf_state_dict_roundtrip(nf_ref):
    import torch

    flows_r, flows_j, keys = [], [], jax.random.split(KEY, 4)
    for i in range(2):
        flows_r.append(nf_ref.flows.CoupledRationalQuadraticSpline(
            2, 1, 16, num_bins=4))
        flows_r.append(nf_ref.flows.LULinearPermute(2))
        flows_j.append(nff.CoupledRationalQuadraticSpline.create(
            keys[2 * i], 2, 1, 16, num_bins=4))
        flows_j.append(nff.LULinearPermute.create(keys[2 * i + 1], 2))
    ref = _randomize(nf_ref.NormalizingFlow(
        nf_ref.distributions.DiagGaussian(2), flows_r))
    ours = nf_tpu.NormalizingFlow.create(dist.DiagGaussian.create(2),
                                         flows_j)
    # the random permutation is a buffer, not a parameter: it transfers
    # from the checkpoint rather than being regenerated
    model = import_state_dict(ours, _sd(ref))

    x = np.random.default_rng(2).normal(size=(32, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_maf_state_dict_roundtrip(nf_ref):
    import torch

    ref = _randomize(nf_ref.NormalizingFlow(
        nf_ref.distributions.DiagGaussian(2),
        [nf_ref.flows.MaskedAffineAutoregressive(2, 16, num_blocks=2)]))
    ours = nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2),
        [nff.MaskedAffineAutoregressive.create(KEY, 2, 16, num_blocks=2)])
    model = import_state_dict(ours, _sd(ref))

    x = np.random.default_rng(3).normal(size=(32, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_glow_block_state_dict_roundtrip(nf_ref):
    import torch

    ref = _randomize(nf_ref.flows.GlowBlock(8, 16, split_mode="channel"))
    ours = nff.GlowBlock.create(KEY, 8, 16, split_mode="channel")
    block = import_state_dict(ours, _sd(ref))

    x = np.random.default_rng(4).normal(size=(2, 8, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want, want_ld = ref.forward(torch.from_numpy(x))
    got, got_ld = block.forward(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_ld), want_ld.numpy(),
                               atol=2e-4)


@pytest.mark.parametrize("scan", [False, True])
def test_glow_multiscale_state_dict_roundtrip(nf_ref, scan):
    """The flagship migration: a reference multi-scale class-conditional
    Glow checkpoint (ref examples/glow.ipynb cell 2 recipe, small dims)
    loads into build_glow_multiscale — including the scan=True variant
    whose per-level GlowBlocks live in one lax.scan stack."""
    import torch

    import nf_tpu.models as models

    L, K, hidden, shape, n_cls = 2, 2, 16, (3, 8, 8), 4
    q0, flows, merges = [], [], []
    for i in range(L):
        ch = shape[0] * 2 ** (L + 1 - i)
        flows_ = [nf_ref.flows.GlowBlock(ch, hidden, split_mode="channel",
                                         scale=True)
                  for _ in range(K)]
        flows_ += [nf_ref.flows.Squeeze()]
        flows.append(flows_)
        if i > 0:
            merges.append(nf_ref.flows.Merge())
            latent = (shape[0] * 2 ** (L - i), shape[1] // 2 ** (L - i),
                      shape[2] // 2 ** (L - i))
        else:
            latent = (shape[0] * 2 ** (L + 1), shape[1] // 2 ** L,
                      shape[2] // 2 ** L)
        q0.append(nf_ref.distributions.ClassCondDiagGaussian(latent, n_cls))
    ref = _randomize(nf_ref.MultiscaleFlow(
        q0, flows, merges, transform=nf_ref.transforms.Logit(0.05)))

    ours = models.build_glow_multiscale(
        KEY, input_shape=shape, L=L, K=K, hidden_channels=hidden,
        num_classes=n_cls, class_cond=True, logit_alpha=0.05, scan=scan)
    model = import_state_dict(ours, _sd(ref))

    rng = np.random.default_rng(5)
    x = rng.uniform(0.1, 0.9, size=(2,) + shape).astype(np.float32)
    y = np.array([1, 3])
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


def test_residual_state_dict_roundtrip(nf_ref):
    """Residual flow: the Lipschitz net (incl. converged power-iteration
    u/v buffers) and the roulette parameters transfer; the residual map
    g(x) then matches pointwise (log-det is a stochastic estimator, so the
    deterministic map is the right parity surface)."""
    import torch

    from nf_tpu.nets import LipschitzMLP

    lip_r = nf_ref.nets.LipschitzMLP([2, 16, 16, 2], init_zeros=True,
                                     lipschitz_const=0.9)
    ref = _randomize(nf_ref.flows.Residual(lip_r, reduce_memory=False))
    with torch.no_grad():  # restore spectral-norm buffers to a valid state
        for _ in range(8):
            nf_ref.utils.update_lipschitz(ref, 8)

    lip_j = LipschitzMLP.create(KEY, [2, 16, 16, 2], lipschitz_const=0.9)
    ours = nff.Residual.create(lip_j)
    flow = import_state_dict(ours, _sd(ref))

    x = np.random.default_rng(6).normal(size=(8, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.iresblock.nnet(torch.from_numpy(x)).numpy()
    got = np.asarray(flow.iresblock.nnet(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(
        float(flow.iresblock.geom_p_logit),
        float(ref.iresblock.geom_p.detach()), rtol=1e-6)


def test_hmc_state_dict_roundtrip(nf_ref):
    import torch

    ref = nf_ref.flows.HamiltonianMonteCarlo(
        nf_ref.distributions.DiagGaussian(2), 4,
        torch.log(torch.tensor([0.1, 0.2])), torch.zeros(2))
    _randomize(ref)
    ours = nff.HamiltonianMonteCarlo.create(
        dist.DiagGaussian.create(2), 4,
        log_step_size=jnp.zeros(2), log_mass=jnp.zeros(2))
    flow = import_state_dict(ours, _sd(ref))
    np.testing.assert_allclose(np.asarray(flow.log_step_size),
                               ref.log_step_size.detach().numpy())
    np.testing.assert_allclose(np.asarray(flow.log_mass),
                               ref.log_mass.detach().numpy())
    np.testing.assert_allclose(np.asarray(flow.target.loc),
                               ref.target.loc.detach().numpy())


def test_missing_key_raises(nf_ref):
    ref = _randomize(_build_ref_realnvp(nf_ref, K=1))
    sd = _sd(ref)
    sd.pop("flows.0.t.net.0.weight")
    # surfaces as KeyError (missing leaf) or ValueError (layer-count scan)
    with pytest.raises((KeyError, ValueError)):
        import_state_dict(_build_our_realnvp(K=1), sd)


def test_unused_key_strict(nf_ref):
    ref = _randomize(_build_ref_realnvp(nf_ref, K=1))
    sd = _sd(ref)
    sd["orphan.s"] = np.zeros((1, 2), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        import_state_dict(_build_our_realnvp(K=1), sd)
    import_state_dict(_build_our_realnvp(K=1), sd, strict=False)


def test_architecture_mismatch_raises(nf_ref):
    ref = _randomize(_build_ref_realnvp(nf_ref, K=4))
    with pytest.raises(ValueError, match="architectures differ"):
        import_state_dict(_build_our_realnvp(K=1), _sd(ref))


def test_npz_bridge_roundtrip(nf_ref, tmp_path):
    """save_state_dict_npz / load_state_dict_npz carry a checkpoint to a
    torch-free host without loss."""
    from nf_tpu.compat import load_state_dict_npz, save_state_dict_npz

    ref = _randomize(_build_ref_realnvp(nf_ref, K=2))
    path = tmp_path / "ckpt.npz"
    save_state_dict_npz(ref.state_dict(), path)
    sd = load_state_dict_npz(path)
    model = import_state_dict(_build_our_realnvp(K=2), sd)

    import torch

    x = np.random.default_rng(7).normal(size=(16, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(model.log_prob(jnp.asarray(x))),
                               want, atol=2e-4)


def test_vae_encoder_decoder_roundtrip(nf_ref):
    """VAE pieces: NNDiagGaussian encoder and NNBernoulliDecoder with
    reference-MLP conditioners transfer through the net-holder path."""
    import torch

    from nf_tpu.distributions import NNBernoulliDecoder, NNDiagGaussian

    enc_net_r = nf_ref.nets.MLP([4, 16, 6])
    dec_net_r = nf_ref.nets.MLP([3, 16, 4])
    enc_r = _randomize(nf_ref.distributions.NNDiagGaussian(enc_net_r))
    dec_r = _randomize(nf_ref.distributions.NNBernoulliDecoder(dec_net_r),
                       seed=1)

    enc_j = NNDiagGaussian(net=MLP.create(KEY, [4, 16, 6]))
    dec_j = NNBernoulliDecoder(net=MLP.create(KEY, [3, 16, 4]))
    enc = import_state_dict(enc_j, _sd(enc_r))
    dec = import_state_dict(dec_j, _sd(dec_r))

    x = np.random.default_rng(8).normal(size=(2, 4)).astype(np.float32)
    z = np.random.default_rng(9).normal(size=(2, 1, 3)).astype(np.float32)
    xb = (x > 0).astype(np.float32)
    with torch.no_grad():
        z_r, logq_r = enc_r(torch.from_numpy(x), num_samples=1)
        logp_r = dec_r.log_prob(torch.from_numpy(xb),
                                torch.from_numpy(z))
    _, logq_j = enc.forward(jax.random.PRNGKey(0), jnp.asarray(x),
                            num_samples=1)
    logp_j = dec.log_prob(jnp.asarray(xb), jnp.asarray(z))
    # encoder draws differ (different RNG), so compare the deterministic
    # decoder likelihood and the encoder's moment net outputs
    np.testing.assert_allclose(np.asarray(logp_j), logp_r.numpy(),
                               atol=1e-4)
    with torch.no_grad():
        moments_r = enc_net_r(torch.from_numpy(x)).numpy()
    moments_j = np.asarray(enc.net(jnp.asarray(x)))
    np.testing.assert_allclose(moments_j, moments_r, atol=1e-5)


def test_permute_radial_strict_import(nf_ref):
    """Regression: shuffle-mode Permute's persistent inv_perm buffer and
    Radial's dim buffer must be consumed so strict import succeeds."""
    import torch

    ref = nf_ref.NormalizingFlow(
        nf_ref.distributions.DiagGaussian(2),
        [nf_ref.flows.Permute(2, mode="shuffle"),
         nf_ref.flows.Radial((2,))])
    _randomize(ref)
    ours = nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2),
        [nff.Permute.create(KEY, 2, mode="shuffle"),
         nff.Radial.create(jax.random.PRNGKey(1), 2)])
    model = import_state_dict(ours, _sd(ref))  # strict must not raise

    x = np.random.default_rng(10).normal(size=(8, 2)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref.flows[0].forward(torch.from_numpy(x))
    got, _ = model.flows[0].forward(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_coupling_feature_order_mismatch_raises(nf_ref):
    """Regression: same feature SET in a different ORDER is a silently
    wrong import — the check must compare order, not membership."""
    ref = _randomize(nf_ref.flows.CoupledRationalQuadraticSpline(
        2, 1, 16, num_bins=4))
    sd = _sd(ref)
    for name in ("identity_features", "transform_features"):
        key = f"prqct.{name}"
        sd[key] = sd[key][::-1].copy()
    swapped_total = sd["prqct.identity_features"].size + \
        sd["prqct.transform_features"].size
    assert swapped_total == 2
    ours = nff.CoupledRationalQuadraticSpline.create(KEY, 2, 1, 16,
                                                     num_bins=4)
    # single-feature halves can't be order-swapped; emulate by pointing
    # identity at the transform index instead
    sd["prqct.identity_features"], sd["prqct.transform_features"] = (
        sd["prqct.transform_features"], sd["prqct.identity_features"])
    with pytest.raises(ValueError, match="mismatch"):
        import_state_dict(ours, sd)


def test_conv_residual_net_roundtrip(nf_ref):
    """ConvResidualNet (image-NSF conditioner) transfers conv pairs."""
    import torch

    from nf_tpu.nets import ConvResidualNet

    ref = _randomize(nf_ref.nets.ConvResidualNet(3, 4, 8, num_blocks=1))
    ours = ConvResidualNet.create(KEY, 3, 4, 8, num_blocks=1)
    net = import_state_dict(ours, _sd(ref))
    x = np.random.default_rng(11).normal(size=(2, 3, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(net(jnp.asarray(x))), want,
                               atol=1e-5)


def test_remaining_base_distributions_roundtrip(nf_ref):
    """GaussianMixture / GaussianPCA / UniformGaussian / AffineGaussian
    bases transfer with identical densities."""
    import torch

    g = torch.Generator().manual_seed(0)

    def rand(m):
        with torch.no_grad():
            for p in m.parameters():
                p.copy_(0.3 * torch.randn(p.shape, generator=g))
        return m

    x2 = np.random.default_rng(12).normal(size=(16, 2)).astype(np.float32)
    x3 = np.random.default_rng(13).normal(size=(16, 3)).astype(np.float32)
    x4 = np.random.default_rng(14).normal(size=(16, 4)).astype(np.float32)

    cases = [
        (rand(nf_ref.distributions.GaussianMixture(3, 2)),
         dist.GaussianMixture.create(3, 2, key=KEY), x2),
        (nf_ref.distributions.UniformGaussian(3, ind=[0]),
         dist.UniformGaussian.create(3, ind=[0]), x3),
        (rand(nf_ref.distributions.AffineGaussian((4,), affine_shape=(4,))),
         dist.AffineGaussian.create((4,), affine_shape=(4,)), x4),
    ]
    for ref, ours, x in cases:
        model = import_state_dict(ours, _sd(ref))
        with torch.no_grad():
            want = ref.log_prob(torch.from_numpy(x)).numpy()
        got = np.asarray(model.log_prob(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    # GaussianPCA: the reference's log_prob has a known density bug
    # (docstring at nf_tpu/distributions/base.py:472), so compare params
    ref = rand(nf_ref.distributions.GaussianPCA(4, latent_dim=2))
    ours = import_state_dict(
        dist.GaussianPCA.create(jax.random.PRNGKey(1), 4, latent_dim=2),
        _sd(ref))
    np.testing.assert_array_equal(np.asarray(ours.W),
                                  ref.W.detach().numpy())
