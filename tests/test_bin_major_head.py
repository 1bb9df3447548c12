"""Bin-major conditioner heads: the 2D NSF fast feed (docs/kernels.md).

The head's final matmul emits ``(mult*D, batch)`` with rows param-major, a
zero-copy view of the fused spline kernel's ``(K, N)`` layout. A bin-major
model equals the feature-major one up to a fixed row permutation of the head
weight/bias (reference layout: ``coupling.py:150-160``), so every test here
builds both variants with identical parameters-modulo-permutation and
asserts equal outputs, log-dets, and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.flows as nff
from nf_tpu.compat import _head_to_bin_major


def _randomize_heads(bin_major_mod, generic_mod, path, seed=0):
    """Give both variants the same random head (feature-major draw,
    permuted into the bin-major layout for the bin-major model)."""
    rng = np.random.RandomState(seed)

    def get(mod):
        net = mod
        for name in path:
            net = getattr(net, name)
        return net

    gnet = get(generic_mod)
    w = rng.randn(*gnet.final_layer.weight.shape).astype(np.float32) * 0.3
    b = rng.randn(*gnet.final_layer.bias.shape).astype(np.float32) * 0.3

    def put(mod, weight, bias):
        outer, inner = path  # e.g. ("prqct", "transform_net")
        net = get(mod)
        net = net.replace(
            final_layer=net.final_layer.replace(weight=jnp.asarray(weight),
                                                bias=jnp.asarray(bias)))
        return mod.replace(**{outer: getattr(mod, outer).replace(
            **{inner: net})})

    head = get(bin_major_mod).bin_major_head
    assert head is not None, "expected a bin-major head"
    return (put(bin_major_mod, _head_to_bin_major(w, head),
                _head_to_bin_major(b, head)),
            put(generic_mod, w, b))


def _check_equal(mod_a, mod_b, x, atol=1e-5):
    for direction in ("forward", "inverse"):
        za, lda = getattr(mod_a, direction)(x)
        zb, ldb = getattr(mod_b, direction)(x)
        np.testing.assert_allclose(np.asarray(za), np.asarray(zb),
                                   atol=atol, err_msg=direction)
        np.testing.assert_allclose(np.asarray(lda), np.asarray(ldb),
                                   atol=atol, err_msg=direction)

    # gradients through the full transform + log-det
    def loss(m, v):
        z, ld = m.forward(v)
        return jnp.sum(z ** 2) + jnp.sum(ld)

    ga = jax.grad(lambda v: loss(mod_a, v))(x)
    gb = jax.grad(lambda v: loss(mod_b, v))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=atol)


def test_coupled_rqs_linear_bin_major_equals_generic():
    kwargs = dict(num_input_channels=4, num_blocks=2,
                  num_hidden_channels=16, num_bins=5, tail_bound=3.0)
    a = nff.CoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=True, **kwargs)
    b = nff.CoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=False, **kwargs)
    assert a.prqct.transform_net.bin_major_head is not None
    assert b.prqct.transform_net.bin_major_head is None
    a, b = _randomize_heads(a, b, ("prqct", "transform_net"))
    x = jnp.asarray(np.random.RandomState(1).randn(8, 4).astype(np.float32)
                    * 2)
    _check_equal(a, b, x)


def test_circular_coupled_homogeneous_bin_major():
    # dim-2 all-circular: each coupling's transform half is homogeneous
    # 'circular' through the per-feature-tails 3K+1 parameter count — the
    # K+1 derivative-plane slice path
    kwargs = dict(num_input_channels=2, num_blocks=2,
                  num_hidden_channels=16, ind_circ=[0, 1], num_bins=4,
                  tail_bound=np.pi)
    a = nff.CircularCoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=True, **kwargs)
    b = nff.CircularCoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=False, **kwargs)
    assert a.prqct.transform_net.bin_major_head is not None
    a, b = _randomize_heads(a, b, ("prqct", "transform_net"))
    x = jnp.asarray(np.random.RandomState(2).randn(8, 2).astype(np.float32))
    _check_equal(a, b, x)


def test_ar_rqs_bin_major_equals_generic():
    kwargs = dict(num_input_channels=4, num_blocks=2,
                  num_hidden_channels=16, num_bins=4, tail_bound=3.0)
    a = nff.AutoregressiveRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=True, **kwargs)
    b = nff.AutoregressiveRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=False, **kwargs)
    head = a.mprqat.autoregressive_net.bin_major_head
    assert head is not None

    # masked final layers: the bin-major mask is the row-permuted
    # feature-major mask by construction
    ga = a.mprqat.autoregressive_net
    gb = b.mprqat.autoregressive_net
    np.testing.assert_array_equal(
        np.asarray(_head_to_bin_major(gb.final_layer.mask, head)),
        np.asarray(ga.final_layer.mask))

    a, b = _copy_made_head(a, b, seed=3)
    x = jnp.asarray(np.random.RandomState(4).randn(6, 4).astype(np.float32)
                    * 2)
    # forward AND the D-pass scan inverse
    _check_equal(a, b, x, atol=1e-4)


def _copy_made_head(a, b, seed):
    """Same random MADE head on both variants (permuted for the bin-major
    one); returns the updated (a, b)."""
    head = a.mprqat.autoregressive_net.bin_major_head
    assert head is not None
    ga = a.mprqat.autoregressive_net
    gb = b.mprqat.autoregressive_net
    rng = np.random.RandomState(seed)
    w = rng.randn(*gb.final_layer.weight.shape).astype(np.float32) * 0.3
    bias = rng.randn(*gb.final_layer.bias.shape).astype(np.float32) * 0.3
    a = a.replace(mprqat=a.mprqat.replace(
        autoregressive_net=ga.replace(final_layer=ga.final_layer.replace(
            weight=jnp.asarray(_head_to_bin_major(w, head)),
            bias=jnp.asarray(_head_to_bin_major(bias, head))))))
    b = b.replace(mprqat=b.mprqat.replace(
        autoregressive_net=gb.replace(final_layer=gb.final_layer.replace(
            weight=jnp.asarray(w), bias=jnp.asarray(bias)))))
    return a, b


def test_circular_ar_mixed_tails_bin_major_equals_generic():
    """The cylinder flagship config (mixed circular/linear tails) rides the
    bin-major fast feed via per-feature derivative padding in the k-major
    entry."""
    kwargs = dict(num_input_channels=2, num_blocks=2,
                  num_hidden_channels=16, ind_circ=[0], num_bins=4,
                  tail_bound=jnp.asarray([np.pi, 3.0]), permute_mask=False)
    a = nff.CircularAutoregressiveRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=True, **kwargs)
    b = nff.CircularAutoregressiveRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=False, **kwargs)
    assert a.mprqat.autoregressive_net.bin_major_head is not None
    a, b = _copy_made_head(a, b, seed=6)
    x = jnp.asarray(
        np.random.RandomState(7).randn(6, 2).astype(np.float32))
    _check_equal(a, b, x, atol=1e-4)


def test_mixed_circular_coupling_bin_major_equals_generic():
    """Mixed tails inside one coupling's transform half (D=3, one circular
    feature): the 2D bin-major branch with K+1 derivative planes."""
    kwargs = dict(num_input_channels=3, num_blocks=2,
                  num_hidden_channels=16, ind_circ=[0], num_bins=4,
                  tail_bound=np.pi, reverse_mask=True)
    a = nff.CircularCoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=True, **kwargs)
    b = nff.CircularCoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(0), bin_major_head=False, **kwargs)
    assert a.prqct.transform_net.bin_major_head is not None
    assert isinstance(a.prqct.tails, tuple) and len(set(a.prqct.tails)) > 1
    a, b = _randomize_heads(a, b, ("prqct", "transform_net"), seed=8)
    x = jnp.asarray(
        np.random.RandomState(9).randn(8, 3).astype(np.float32))
    _check_equal(a, b, x)


def test_maf_bin_major_equals_generic():
    """MaskedAffineAutoregressive: scale/shift as contiguous (D, B) planes
    vs the feature-major stride-2 layout — same function up to the head row
    permutation."""
    kwargs = dict(features=4, hidden_features=16, num_blocks=2)
    a = nff.MaskedAffineAutoregressive.create(
        jax.random.PRNGKey(0), bin_major_head=True, **kwargs)
    b = nff.MaskedAffineAutoregressive.create(
        jax.random.PRNGKey(0), bin_major_head=False, **kwargs)
    head = a.autoregressive_net.bin_major_head
    assert head == (4, 2)
    ga, gb = a.autoregressive_net, b.autoregressive_net
    rng = np.random.RandomState(11)
    w = rng.randn(*gb.final_layer.weight.shape).astype(np.float32) * 0.3
    bias = rng.randn(*gb.final_layer.bias.shape).astype(np.float32) * 0.3
    a = a.replace(autoregressive_net=ga.replace(
        final_layer=ga.final_layer.replace(
            weight=jnp.asarray(_head_to_bin_major(w, head)),
            bias=jnp.asarray(_head_to_bin_major(bias, head)))))
    b = b.replace(autoregressive_net=gb.replace(
        final_layer=gb.final_layer.replace(
            weight=jnp.asarray(w), bias=jnp.asarray(bias))))
    x = jnp.asarray(np.random.RandomState(12).randn(6, 4)
                    .astype(np.float32))
    _check_equal(a, b, x, atol=1e-5)


def test_bin_major_roundtrip_invariants():
    a = nff.CoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(7), num_input_channels=4, num_blocks=2,
        num_hidden_channels=16, num_bins=5, tail_bound=3.0,
        init_identity=False)
    x = jnp.asarray(np.random.RandomState(5).randn(16, 4)
                    .astype(np.float32) * 2)
    z, ld_f = a.forward(x)
    x2, ld_i = a.inverse(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i),
                               np.zeros(x.shape[0]), atol=1e-4)
