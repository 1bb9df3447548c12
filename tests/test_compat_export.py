"""Reverse migration (nf_tpu.compat_export): an nf_tpu model's weights
load into the reference torch model with strict=True and produce identical
densities — train here, deploy in torch-side tooling.

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
import nf_tpu.models as models
from nf_tpu.compat import import_state_dict
from nf_tpu.compat_export import export_state_dict
from nf_tpu.nets import MLP

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference checkout not available")

KEY = jax.random.PRNGKey(4)


@pytest.fixture(scope="module")
def nf_ref():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import normflows as nf
    return nf


def _load_into(ref_model, sd):
    import torch

    ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
         sd.items()}, strict=True)
    return ref_model


def _perturb(model, scale=0.15):
    """Non-trivial weights everywhere (builders zero-init some layers)."""
    from nf_tpu.utils.module import combine, partition

    params, static = partition(model)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(KEY, len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    return combine(jax.tree_util.tree_unflatten(treedef, leaves), static)


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
        units = [nff.Scanned.create(
            [nff.Composite(flows=tuple(units[4 * i:4 * i + 4]))
             for i in range(K // 2)])]
    return nf_tpu.NormalizingFlow.create(dist.DiagGaussian.create(2), units)


def _build_ref_realnvp(nf_ref, K=4, hidden=16):
    import torch

    flows = []
    for i in range(K):
        b = torch.tensor([(j + i) % 2 for j in range(2)],
                         dtype=torch.float32)
        flows.append(nf_ref.flows.MaskedAffineFlow(
            b, t=nf_ref.nets.MLP([2, hidden, 2], init_zeros=True),
            s=nf_ref.nets.MLP([2, hidden, 2], init_zeros=True)))
        flows.append(nf_ref.flows.ActNorm(2))
    return nf_ref.NormalizingFlow(nf_ref.distributions.DiagGaussian(2),
                                  flows)


@pytest.mark.parametrize("scan", [False, True])
def test_export_realnvp_to_reference(nf_ref, scan):
    import torch

    model = _perturb(_build_our_realnvp(scan=scan))
    ref = _load_into(_build_ref_realnvp(nf_ref), export_state_dict(model))

    x = np.random.default_rng(0).normal(size=(32, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(want, got, atol=2e-4)


def test_export_nsf_to_reference(nf_ref):
    import torch

    keys = jax.random.split(KEY, 4)
    flows_j = []
    flows_r = []
    for i in range(2):
        flows_j.append(nff.CoupledRationalQuadraticSpline.create(
            keys[2 * i], 2, 1, 16, num_bins=4))
        flows_j.append(nff.LULinearPermute.create(keys[2 * i + 1], 2))
        flows_r.append(nf_ref.flows.CoupledRationalQuadraticSpline(
            2, 1, 16, num_bins=4))
        flows_r.append(nf_ref.flows.LULinearPermute(2))
    model = _perturb(nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2), flows_j))
    ref = _load_into(nf_ref.NormalizingFlow(
        nf_ref.distributions.DiagGaussian(2), flows_r),
        export_state_dict(model))

    x = np.random.default_rng(1).normal(size=(32, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(want, got, atol=5e-4)


def test_export_maf_to_reference(nf_ref):
    import torch

    model = _perturb(nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2),
        [nff.MaskedAffineAutoregressive.create(KEY, 2, 16, num_blocks=2)]))
    ref = _load_into(nf_ref.NormalizingFlow(
        nf_ref.distributions.DiagGaussian(2),
        [nf_ref.flows.MaskedAffineAutoregressive(2, 16, num_blocks=2)]),
        export_state_dict(model))

    x = np.random.default_rng(2).normal(size=(32, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(want, got, atol=2e-4)


def test_export_glow_multiscale_to_reference(nf_ref):
    import torch

    L, K, hidden, shape, n_cls = 2, 2, 16, (3, 8, 8), 4
    model = _perturb(models.build_glow_multiscale(
        KEY, input_shape=shape, L=L, K=K, hidden_channels=hidden,
        num_classes=n_cls, class_cond=True, logit_alpha=0.05, scan=True),
        scale=0.05)

    q0, flows, merges = [], [], []
    for i in range(L):
        ch = shape[0] * 2 ** (L + 1 - i)
        flows.append([nf_ref.flows.GlowBlock(ch, hidden,
                                             split_mode="channel")
                      for _ in range(K)] + [nf_ref.flows.Squeeze()])
        if i > 0:
            merges.append(nf_ref.flows.Merge())
            latent = (shape[0] * 2 ** (L - i), shape[1] // 2 ** (L - i),
                      shape[2] // 2 ** (L - i))
        else:
            latent = (shape[0] * 2 ** (L + 1), shape[1] // 2 ** L,
                      shape[2] // 2 ** L)
        q0.append(nf_ref.distributions.ClassCondDiagGaussian(latent, n_cls))
    ref = _load_into(nf_ref.MultiscaleFlow(
        q0, flows, merges, transform=nf_ref.transforms.Logit(0.05)),
        export_state_dict(model))

    rng = np.random.default_rng(3)
    x = rng.uniform(0.1, 0.9, size=(2,) + shape).astype(np.float32)
    y = np.array([0, 2])
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x),
                            torch.from_numpy(y)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(want, got, rtol=1e-4, atol=2e-3)


def test_export_mlp_with_dropout_to_reference(nf_ref):
    """The reference inserts nn.Dropout BEFORE the final Linear
    (ref nets/mlp.py:34-36), shifting it to an odd Sequential index — the
    exporter must mirror that or strict load fails."""
    import torch

    model = _perturb(nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2),
        [nff.MaskedAffineFlow.create(
            jnp.array([1.0, 0.0]),
            t=MLP.create(KEY, [2, 16, 16, 2], dropout=0.1),
            s=MLP.create(jax.random.fold_in(KEY, 1), [2, 16, 16, 2],
                         dropout=0.1))]))
    ref = _load_into(
        nf_ref.NormalizingFlow(
            nf_ref.distributions.DiagGaussian(2),
            [nf_ref.flows.MaskedAffineFlow(
                torch.tensor([1.0, 0.0]),
                t=nf_ref.nets.MLP([2, 16, 16, 2], dropout=0.1),
                s=nf_ref.nets.MLP([2, 16, 16, 2], dropout=0.1))]),
        export_state_dict(model))
    ref.eval()  # dropout off; our log_prob is keyless -> dropout off too

    x = np.random.default_rng(3).normal(size=(16, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    got = np.asarray(model.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(want, got, atol=2e-4)


def test_export_import_identity(nf_ref):
    """export -> import is the identity on the parameters."""
    model = _perturb(_build_our_realnvp())
    back = import_state_dict(_build_our_realnvp(), export_state_dict(model))
    for a, b in zip(jax.tree_util.tree_leaves(model),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
