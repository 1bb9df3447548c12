"""Regression tests for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nf_tpu.flows as nff
import nf_tpu.models as models
from nf_tpu.utils.config import TrainConfig

KEY = jax.random.PRNGKey(0)


def test_train_config_numeric_flags_parse():
    """seed/weight_decay/beta_anneal_iters must be value flags, not
    store_true booleans (0 == False pitfall)."""
    cfg = TrainConfig.from_args([
        "--seed", "42", "--weight_decay", "0.001",
        "--beta_anneal_iters", "500", "--lr", "0.01"])
    assert cfg.seed == 42
    assert cfg.weight_decay == 0.001
    assert cfg.beta_anneal_iters == 500
    assert cfg.lr == 0.01
    assert cfg.bf16 is False
    cfg2 = TrainConfig.from_args(["--bf16"])
    assert cfg2.bf16 is True


def test_train_binary_residual_reverse_kld_runs():
    """Residual + reverse KLD now trains (implicit-diff fixed-point VJP);
    the former gate (SystemExit) is gone."""
    from nf_tpu import train

    state = train.main(["--model", "residual", "--iters", "2",
                        "--num_layers", "1", "--hidden", "16",
                        "--num_samples", "64"])
    assert int(state.step) == 2
    assert state.buffers is not None  # update_lipschitz ran in-step


def test_glow_block_odd_channels():
    """torch.chunk split semantics: odd channel counts must work."""
    gb = nff.GlowBlock.create(KEY, 3, 16, split_mode="channel")
    x = jax.random.normal(KEY, (2, 3, 4, 4))
    z, ld = gb.forward(x)
    x2, ld2 = gb.inverse(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-5)


def test_iresblock_refuses_keyless_stochastic_estimator():
    model = models.build_residual(KEY, dim=2, K=1, hidden=8,
                                  n_hidden_layers=2)
    x = jax.random.normal(KEY, (4, 2))
    with pytest.raises(ValueError, match="RNG key"):
        model.log_prob(x)
    # exact mode stays keyless-friendly
    exact = nff.set_exact_logdet(model)
    assert np.isfinite(np.asarray(exact.log_prob(x))).all()


def test_update_lipschitz_descends_into_scanned():
    from nf_tpu.nets import LipschitzMLP
    from nf_tpu.nets.lipschitz import InducedNormLinear
    from nf_tpu.utils.optim import (
        lipschitz_scales,
        map_modules,
        update_lipschitz,
    )

    blocks = []
    keys = jax.random.split(KEY, 4)
    for i in range(4):
        net = LipschitzMLP.create(keys[i], [2, 8, 2], lipschitz_const=0.9)
        blocks.append(nff.Residual.create(net, reduce_memory=False))
    scanned = nff.Scanned.create(blocks)
    # u/v are at their fixed point right after create; simulate a gradient
    # step so the power iteration has something to chase
    scanned = map_modules(
        scanned, InducedNormLinear,
        lambda l: l.replace(
            weight=l.weight + 0.3 * jax.random.normal(KEY, l.weight.shape)))
    updated = update_lipschitz(scanned, 5)
    s0 = lipschitz_scales(scanned)
    s1 = lipschitz_scales(updated)
    assert len(s1) == len(s0) == 8
    assert any(float(jnp.max(jnp.abs(a - b))) > 0
               for a, b in zip(s0, s1))


def test_nsf_dropout_fires_with_key():
    f = nff.CoupledRationalQuadraticSpline.create(
        KEY, num_input_channels=4, num_blocks=2, num_hidden_channels=16,
        num_bins=5, dropout_probability=0.5)
    # zero-init final layer hides dropout at init; perturb it
    net = f.prqct.transform_net
    fl = net.final_layer.replace(
        weight=0.1 * jax.random.normal(KEY, net.final_layer.weight.shape))
    f = f.replace(prqct=f.prqct.replace(
        transform_net=net.replace(final_layer=fl)))
    x = jax.random.normal(KEY, (8, 4))
    y1, _ = f.forward(x, key=jax.random.PRNGKey(1))
    y2, _ = f.forward(x, key=jax.random.PRNGKey(2))
    assert float(jnp.max(jnp.abs(y1 - y2))) > 0
    y3, _ = f.forward(x)
    y4, _ = f.forward(x)
    assert bool((y3 == y4).all())


def test_forward_kld_step_with_key_and_post_update():
    import optax

    from nf_tpu.parallel import init_train_state, make_forward_kld_step
    from nf_tpu.utils.optim import update_lipschitz

    model = models.build_residual(KEY, dim=2, K=1, hidden=8,
                                  n_hidden_layers=2)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt, carry_buffers=True)
    step = make_forward_kld_step(
        static, opt, with_key=True,
        post_update=lambda m: update_lipschitz(m, 2))
    x = jax.random.normal(KEY, (16, 2))
    u_before = [np.asarray(l) for l in
                jax.tree_util.tree_leaves(state.buffers)]
    state, loss = step(state, x, jax.random.PRNGKey(1))
    state, loss = step(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert int(state.step) == 2
    # the power-iteration buffer updates must PERSIST across steps
    u_after = [np.asarray(l) for l in
               jax.tree_util.tree_leaves(state.buffers)]
    assert any(np.max(np.abs(a - b)) > 0
               for a, b in zip(u_before, u_after))
    # post_update without carry_buffers must refuse (silent no-op trap)
    s2, st2 = init_train_state(model, opt)
    step2 = make_forward_kld_step(st2, opt, with_key=True,
                                  post_update=lambda m: m)
    with pytest.raises(ValueError, match="carry_buffers"):
        step2(s2, x, jax.random.PRNGKey(1))


def test_4d_coupling_per_channel_tail_bound():
    """Per-feature tail bounds on image couplings align to the channel
    axis (previously crashed/misaligned against the width axis)."""
    from nf_tpu.nets import ConvResidualNet

    C, Hs = 4, 6  # C != W would crash under the old broadcast
    mask = np.asarray([1.0, -1.0, 1.0, -1.0])
    tb = np.asarray([2.0, 3.0, 2.5, 3.5])  # per full input channel

    def net_fn(k, in_ch, out_ch):
        return ConvResidualNet.create(k, in_ch, out_ch, 8, num_blocks=1)

    f = nff.PiecewiseRationalQuadraticCoupling.create(
        KEY, mask, net_fn, num_bins=4, tails="linear", tail_bound=tb)
    x = jax.random.normal(KEY, (3, C, Hs, Hs))
    z, ld = f.forward(x)
    x2, ld2 = f.inverse(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-3)


def test_reverse_kld_step_preserves_buffers():
    """Buffers thread through the sample-parallel VI step unchanged (and
    ActNorm buffer state is actually used in the model)."""
    import optax

    from nf_tpu.parallel import init_train_state, make_reverse_kld_step
    from nf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("data",))
    model = models.build_realnvp(KEY, dim=2, K=2, hidden=[8, 8])
    model = model.init_from_samples(KEY, 64)
    opt = optax.adam(1e-3)
    state, config = init_train_state(model, opt, carry_buffers=True)
    step = make_reverse_kld_step(config, opt, mesh, num_samples=64)
    b0 = [np.asarray(l) for l in jax.tree_util.tree_leaves(state.buffers)]
    state, loss = step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    b1 = [np.asarray(l) for l in jax.tree_util.tree_leaves(state.buffers)]
    for a, b in zip(b0, b1):
        np.testing.assert_array_equal(a, b)


def test_partition_rejects_opaque_array_containers():
    import collections

    from nf_tpu.utils.module import partition, partition_arrays

    NT = collections.namedtuple("NT", ["a", "b"])
    nt = NT(a=jnp.ones((2,)), b=jnp.zeros((3,)))
    # namedtuples are handled (reconstructed field-wise)
    p, s = partition([nt, 1.0])
    assert isinstance(p[0], NT) and p[0].a is not None
    a, c = partition_arrays((nt,))
    assert isinstance(a[0], NT)

    class Weird:
        pass

    w = Weird()
    jax.tree_util.register_pytree_node(
        Weird, lambda x: ((jnp.ones(2),), None),
        lambda aux, ch: Weird())
    with pytest.raises(TypeError, match="non-Module pytree"):
        partition({"w": w})


def test_shard_batch_scalar_leaf():
    from nf_tpu.parallel import shard_batch
    from nf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("data",))
    out = shard_batch(mesh, {"x": jnp.ones((16, 2)),
                             "w": jnp.float32(0.5)})
    assert out["w"].shape == ()


def test_gaussian_pca_samples_match_density_cov():
    """Samples carry the sigma observation noise the density claims."""
    from nf_tpu.distributions import GaussianPCA

    d = GaussianPCA.create(KEY, dim=3, latent_dim=1, sigma=0.5)
    z, log_p = d.forward(jax.random.PRNGKey(1), 20000)
    emp = np.cov(np.asarray(z).T)
    sig = np.asarray(d.W.T @ d.W + np.exp(2 * float(d.log_sigma)) * np.eye(3))
    np.testing.assert_allclose(emp, sig, atol=0.1)
    # and the returned log_p equals log_prob(z)
    np.testing.assert_allclose(np.asarray(d.log_prob(z)), np.asarray(log_p),
                               atol=1e-3)


def test_decoder_normalizer_uses_data_dim():
    from nf_tpu.distributions import NNDiagGaussianDecoder
    from nf_tpu.nets import MLP

    d_x, d_z = 6, 2
    net = MLP.create(KEY, [d_z, 8, 2 * d_x])
    dec = NNDiagGaussianDecoder(net=net)
    z = jax.random.normal(KEY, (4, d_z))
    mean, std = dec.forward(z)
    lp = dec.log_prob(mean, z)  # x == mean -> quad term zero
    expected = (-0.5 * d_x * np.log(2 * np.pi)
                - np.sum(np.log(np.asarray(std) ** 2), axis=1) / 2)
    np.testing.assert_allclose(np.asarray(lp), expected, atol=1e-4)


def test_conditional_alpha_div_threads_context():
    from nf_tpu.distributions import ConditionalDiagGaussianTarget

    model = models.build_conditional_nsf(
        KEY, dim=2, context_size=4, K=1, hidden=8,
        target=ConditionalDiagGaussianTarget())
    ctx = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (16, 1))
    loss = model.reverse_alpha_div(KEY, num_samples=16, alpha=0.5,
                                   context=ctx)
    assert np.isfinite(float(loss))


def test_multiscale_log_prob_accepts_key_and_shared_y_sampling():
    key = jax.random.PRNGKey(2)
    m = models.build_glow_multiscale(key, input_shape=(3, 8, 8), L=2, K=1,
                                     hidden_channels=8, class_cond=True,
                                     num_classes=4)
    x = jax.random.uniform(key, (4, 3, 8, 8), minval=0.05, maxval=0.95)
    m = m.init_from_data(x, jnp.zeros((4,), jnp.int32))
    lp = m.log_prob(x, jnp.zeros((4,), jnp.int32), key=key)
    assert np.isfinite(np.asarray(lp)).all()
    # y=None draws ONE shared label across levels; log_q finite
    s, log_q = m.sample(key, 6)
    assert s.shape == (6, 3, 8, 8)
    assert np.isfinite(np.asarray(log_q)).all()


def test_affine_const_flags_freeze_parameters():
    from nf_tpu.utils.module import partition

    f = nff.AffineConstFlow.create((3,), scale=False)
    assert f.s is None and f.t is not None
    x = jax.random.normal(KEY, (4, 3))
    z, ld = f.forward(x)
    np.testing.assert_array_equal(np.asarray(ld), 0.0)  # no scaling
    params, _ = partition(f)
    leaves = [l for l in jax.tree_util.tree_leaves(params)]
    assert len(leaves) == 1  # only t is trainable


def test_cc_affine_const_context_contract():
    f = nff.CCAffineConst.create((4,), num_classes=3)
    f = f.replace(s_cc=0.1 * jax.random.normal(KEY, (3, 4)))
    x = jax.random.normal(KEY, (5, 4))
    y = jnp.asarray([0, 1, 2, 0, 1])
    # label threads via context -> usable inside Composite
    comp = nff.Composite(flows=(f,))
    z, ld = comp.forward(x, context=y)
    x2, ld2 = comp.inverse(z, context=y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_iresblock_truncation_cap_grows():
    from nf_tpu.flows.residual import iResBlock
    from nf_tpu.nets import LipschitzMLP

    net = LipschitzMLP.create(KEY, [2, 8, 2], lipschitz_const=0.9)
    blk = iResBlock.create(net, n_power_series=40)
    assert blk.n_power_series_max >= 40


def test_load_casts_to_template_dtype(tmp_path):
    m = models.build_realnvp(KEY, dim=2, K=1, hidden=[4, 4],
                             dtype=jnp.bfloat16)
    p = str(tmp_path / "m.npz")
    m.save(p)
    tpl = models.build_realnvp(KEY, dim=2, K=1, hidden=[4, 4])
    m2 = tpl.load(p)
    dts = {l.dtype for l in jax.tree_util.tree_leaves(m2)
           if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)}
    assert dts == {jnp.dtype(jnp.float32)}


def test_metric_logger_csv_tolerates_new_keys(tmp_path):
    from nf_tpu.utils import MetricLogger

    lg = MetricLogger(str(tmp_path / "m.jsonl"), also_csv=True)
    lg.log(0, loss=1.0)
    lg.log(1, loss=0.9, ess=0.5)  # new key must not crash
    lg.close()
    lines = open(str(tmp_path / "m.csv")).read().strip().split("\n")
    assert len(lines) == 3 and lines[0].startswith("step")
