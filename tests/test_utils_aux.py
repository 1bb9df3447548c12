"""Tests for auxiliary subsystems: serialization/checkpointing, profiling
wrappers, metrics, config, misc nn utils."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.models import build_realnvp
from nf_tpu.parallel import TrainState, init_train_state
from nf_tpu.utils import (
    MetricLogger,
    Named,
    TrainConfig,
    effective_sample_size,
    load,
    partition,
    save,
    sum_except_batch,
    throughput,
    tile,
)
from nf_tpu.utils.serialization import CheckpointManager

KEY = jax.random.PRNGKey(77)


def test_save_load_roundtrip(tmp_path):
    model = build_realnvp(KEY, dim=2, K=2, hidden=[8])
    path = os.path.join(tmp_path, "model.npz")
    save(path, model)
    template = build_realnvp(jax.random.PRNGKey(1), dim=2, K=2, hidden=[8])
    loaded = load(path, template)
    x = jax.random.normal(KEY, (4, 2))
    np.testing.assert_allclose(np.asarray(model.log_prob(x)),
                               np.asarray(loaded.log_prob(x)), atol=1e-6)


def test_checkpoint_manager_roundtrip(tmp_path):
    model = build_realnvp(KEY, dim=2, K=2, hidden=[8])
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    mgr = CheckpointManager(os.path.join(tmp_path, "ckpt"))
    mgr.save(5, state)
    restored, step = mgr.restore(state)
    assert step == 5
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_async_save(tmp_path):
    model = build_realnvp(KEY, dim=2, K=2, hidden=[8])
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    mgr = CheckpointManager(os.path.join(tmp_path, "ckpt"))
    mgr.save(1, state, wait=False)  # async write overlapping "training"
    state2 = state.replace(step=state.step + 1)
    mgr.save(2, state2, wait=False)
    mgr.wait_until_finished()
    restored, step = mgr.restore(state)
    assert step == 2
    assert int(restored.step) == 1


def test_named_flow_wrapper():
    inner = nff.ActNorm.create(2)
    flow = Named.create(inner, "actnorm0")
    x = jax.random.normal(KEY, (4, 2))
    z, ld = jax.jit(flow.forward)(x)
    assert z.shape == x.shape
    # data-dep init threads through the wrapper
    flow2, z2, _ = flow.init_data_inverse(x)
    assert flow2.flow.initialized


def test_effective_sample_size():
    lw = jnp.zeros(100)  # uniform weights -> ESS == N
    np.testing.assert_allclose(float(effective_sample_size(lw)), 100.0,
                               rtol=1e-5)
    lw = jnp.asarray([0.0] + [-jnp.inf] * 99)  # one surviving weight
    np.testing.assert_allclose(float(effective_sample_size(lw)), 1.0,
                               rtol=1e-5)


def test_metric_logger(tmp_path):
    path = os.path.join(tmp_path, "metrics.jsonl")
    logger = MetricLogger(path, also_csv=True)
    logger.log(0, loss=1.5)
    logger.log(10, loss=jnp.asarray(0.5))
    logger.close()
    import json

    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5
    assert lines[1]["step"] == 10
    assert os.path.exists(os.path.join(tmp_path, "metrics.csv"))


def test_train_config_parsing():
    cfg = TrainConfig.from_args(["--model", "nsf", "--lr", "0.01",
                                 "--iters", "10"])
    assert cfg.model == "nsf" and cfg.lr == 0.01 and cfg.iters == 10
    assert "nsf" in cfg.to_json()


def test_throughput_helper():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((128,))
    sps = throughput(f, x, iters=5, items_per_call=128)
    assert sps > 0


def test_tile_and_sum_except_batch():
    np.testing.assert_array_equal(np.asarray(tile(jnp.asarray([1, 2]), 2)),
                                  [1, 1, 2, 2])
    x = jnp.ones((3, 4, 5))
    np.testing.assert_array_equal(np.asarray(sum_except_batch(x)),
                                  20 * np.ones(3))


def test_checked_catches_nan():
    import jax
    import jax.numpy as jnp

    from nf_tpu.utils import checked

    def bad(x):
        return jnp.log(x).sum()

    f = jax.jit(checked(bad))
    out, err = f(jnp.asarray([1.0, 2.0]))
    err.throw()  # clean input: no error
    out, err = f(jnp.asarray([-1.0, 2.0]))
    try:
        err.throw()
        raise AssertionError("expected checkify error")
    except Exception as e:
        assert "nan" in str(e).lower()


def test_debug_nans_context():
    import jax

    from nf_tpu.utils import debug_nans

    assert not jax.config.jax_debug_nans
    with debug_nans():
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans
