"""Training binary: ``python -m nf_tpu.train --model nsf --target two_moons``.

Ties the aux subsystems together (SURVEY §5): dataclass/flag config,
mesh-sharded training steps, orbax checkpoint/resume, JSONL metric logging.
The reference has no equivalent (its only CLI is the VAE example's
argparse, reference ``examples/vae.py:17-81``).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import optax

from . import models
from .distributions import (
    CircularGaussianMixture,
    RingMixture,
    TwoModes,
    TwoMoons,
)
from .parallel import (
    init_train_state,
    make_forward_kld_step,
    make_mesh,
    make_reverse_kld_step,
    shard_batch,
)
from .utils import CheckpointManager, MetricLogger
from .utils.config import TrainConfig

TARGETS = {
    "two_modes": TwoModes,
    "two_moons": TwoMoons,
    "circular_gmm": CircularGaussianMixture,
    "rings": RingMixture,
}


def build_model(cfg: TrainConfig, key):
    target = TARGETS[cfg.target]()
    mp = cfg.bf16  # bf16 conditioner compute, f32 params + flow math
    if mp and cfg.model == "residual":
        raise SystemExit(
            "--bf16 does not cover --model residual: spectral-norm power "
            "iteration needs f32 to certify the Lipschitz bound")
    if cfg.model == "realnvp":
        return models.build_realnvp(key, dim=cfg.dim, K=cfg.num_layers,
                                    hidden=[cfg.hidden, cfg.hidden],
                                    target=target, mixed_precision=mp)
    if cfg.model == "nsf":
        return models.build_nsf(key, dim=cfg.dim, K=cfg.num_layers,
                                hidden=cfg.hidden, num_bins=cfg.num_bins,
                                target=target, mixed_precision=mp)
    if cfg.model == "circular_nsf":
        return models.build_circular_nsf(key, dim=cfg.dim,
                                         K=cfg.num_layers,
                                         hidden=cfg.hidden,
                                         num_bins=cfg.num_bins,
                                         target=target, mixed_precision=mp)
    if cfg.model == "maf":
        return models.build_maf(key, dim=cfg.dim, K=cfg.num_layers,
                                hidden=cfg.hidden, target=target,
                                mixed_precision=mp)
    if cfg.model == "residual":
        return models.build_residual(key, dim=cfg.dim, K=cfg.num_layers,
                                     hidden=cfg.hidden, target=target)
    raise ValueError(f"unknown model {cfg.model!r}")


def main(argv=None):
    from .utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig.from_args(argv)
    print(cfg.to_json())
    key = jax.random.PRNGKey(cfg.seed)
    mesh = make_mesh(("data",))
    print(f"mesh: {mesh.shape} on {jax.default_backend()}")

    key, sub = jax.random.split(key)
    model = build_model(cfg, sub)
    key, sub = jax.random.split(key)
    if cfg.loss == "reverse_kld":
        model = model.init_from_samples(sub, min(cfg.num_samples, 1024))
    else:
        # ActNorm data-dependent init from a target batch (density direction)
        k1, k2 = jax.random.split(sub)
        x0 = model.p.sample(k1, min(cfg.batch_size, 1024))
        model = model.init_from_data(x0, key=k2)

    opt = (optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
           if cfg.weight_decay else optax.adam(cfg.lr))
    carry_buffers = cfg.model == "residual"
    state, static = init_train_state(model, opt,
                                     carry_buffers=carry_buffers)

    ckpt = CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir \
        else None
    start_step = 0
    if ckpt is not None:
        restored, step = ckpt.restore(state)
        if restored is not None:
            state, start_step = restored, int(step)
            print(f"resumed from step {start_step}")

    logger = MetricLogger(cfg.log_path) if cfg.log_path else None

    is_residual = cfg.model == "residual"
    post = None
    if is_residual:
        from .utils.optim import update_lipschitz

        post = lambda m: update_lipschitz(m, 50)

    if cfg.loss == "reverse_kld":
        anneal = cfg.beta_anneal_iters
        beta = ((lambda s: jnp.minimum(1.0, 0.01 + s / anneal)) if anneal
                else (lambda s: 1.0))
        step_fn = make_reverse_kld_step(static, opt, mesh,
                                        num_samples=cfg.num_samples,
                                        beta_schedule=beta,
                                        post_update=post)

        def run_step(state, key):
            return step_fn(state, key)
    else:
        from .parallel.train import model_of_state

        target = model_of_state(state, static).p
        mle_step = make_forward_kld_step(static, opt, mesh=mesh,
                                         with_key=is_residual,
                                         post_update=post)

        def run_step(state, key):
            k1, k2 = jax.random.split(key)
            x = shard_batch(mesh, target.sample(k1, cfg.batch_size))
            if is_residual:
                return mle_step(state, x, k2)
            return mle_step(state, x)

    # resume continues the RNG stream instead of replaying it from seed
    key = jax.random.fold_in(key, start_step)

    t0 = time.time()
    loss = None
    for it in range(start_step, cfg.iters):
        key, sub = jax.random.split(key)
        state, loss = run_step(state, sub)
        if it % cfg.log_every == 0 or it == cfg.iters - 1:
            loss_f = float(loss)
            rate = (it - start_step + 1) / (time.time() - t0)
            print(f"step {it:7d}  loss {loss_f:+.4f}  {rate:.1f} it/s",
                  flush=True)
            if logger is not None:
                logger.log(it, loss=loss_f, it_per_s=rate)
        if ckpt is not None and (it + 1) % cfg.checkpoint_every == 0:
            ckpt.save(it + 1, state, wait=False)  # overlap write with steps
    if ckpt is not None:
        ckpt.save(cfg.iters, state)
        ckpt.wait_until_finished()
    if logger is not None:
        logger.close()
    print(f"done: {cfg.iters - start_step} steps in {time.time() - t0:.1f}s")
    return state


if __name__ == "__main__":
    main()
