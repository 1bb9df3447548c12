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


def train_image(cfg: TrainConfig):
    """Image-stack path of the train binary: Glow / image-NSF on npz or
    procedural data, with dequantization, bits/dim eval, orbax checkpoints
    and JSONL logging (reference recipe: ``examples/glow.ipynb`` cells 3-6;
    the reference itself has no trainer binary)."""
    import numpy as np

    from .data import load_npz_images, procedural_image_classes
    from .utils.eval import bits_per_dim
    from .utils.preprocessing import Jitter, Scale

    key = jax.random.PRNGKey(cfg.seed)
    mesh = make_mesh(("data",))
    is_main = jax.process_index() == 0
    multiproc = jax.process_count() > 1
    if is_main:
        print(f"mesh: {mesh.shape} on {jax.default_backend()} "
              f"({jax.process_count()} process(es))")

    if cfg.data:
        # Raw uint8 -> /255 here; Scale(255/256) + Jitter are applied
        # uniformly in host_batch/eval below. (load_npz_images' default
        # to_unit_interval already bakes the /256 Scale in — using it here
        # would double-apply it.)
        loaded = load_npz_images(cfg.data, to_unit_interval=False)
        x_all, y_all = loaded if isinstance(loaded, tuple) \
            else (loaded, np.zeros(len(loaded), np.int32))
        x_all = np.asarray(x_all)
        if x_all.dtype == np.uint8:
            x_all = x_all.astype(np.float32) / 255.0
    else:
        x_u8, y_all = procedural_image_classes(cfg.seed, 2048,
                                               size=cfg.image_size)
        x_all = x_u8.astype(np.float32) / 255.0
    n, input_shape = len(x_all), x_all.shape[1:]
    # seeded shuffle before the split: npz files are often class-sorted,
    # which would make the held-out tail a single class
    perm = np.random.default_rng(cfg.seed + 3).permutation(n)
    x_all, y_all = x_all[perm], np.asarray(y_all)[perm]
    n_train = max(int(n * 0.9), 1)
    x_train, y_train = x_all[:n_train], y_all[:n_train]
    x_test, y_test = x_all[n_train:], y_all[n_train:]
    if is_main:
        print(f"data: {n_train} train / {len(x_test)} test, "
              f"shape {input_shape}")

    scale, jitter = Scale(), Jitter()
    rng = np.random.default_rng(cfg.seed + 1)

    def host_batch():
        idx = rng.integers(0, n_train, size=cfg.batch_size)
        x = scale(jnp.asarray(x_train[idx]))
        x = jitter(x, jax.random.PRNGKey(int(rng.integers(1 << 31))))
        return x, jnp.asarray(y_train[idx])

    key, sub = jax.random.split(key)
    if cfg.model == "glow":
        model = models.build_glow_multiscale(
            sub, input_shape=input_shape, L=cfg.levels, K=cfg.num_layers,
            hidden_channels=cfg.hidden, class_cond=cfg.class_cond,
            scan=cfg.scan, mixed_precision=cfg.bf16)
    else:
        model = models.build_image_nsf(
            sub, input_shape=input_shape, L=cfg.levels, K=cfg.num_layers,
            hidden_channels=cfg.hidden, num_bins=cfg.num_bins,
            class_cond=cfg.class_cond, mixed_precision=cfg.bf16)

    x0, y0 = host_batch()
    model = model.init_from_data(x0, y0 if cfg.class_cond else None)

    opt = (optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
           if cfg.weight_decay else optax.adam(cfg.lr))
    use_ema = cfg.ema_decay > 0
    state, static = init_train_state(model, opt, with_ema=use_ema)

    ckpt = CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir \
        else None
    start_step = 0
    if ckpt is not None:
        restored, step = ckpt.restore(state)
        if restored is not None:
            state, start_step = restored, int(step)
            if is_main:
                print(f"resumed from step {start_step}")
    # Re-key the host data/jitter stream on the resume step so a resumed
    # run draws FRESH batches instead of replaying the sequence already
    # trained on (the 2D path does the same via fold_in(key, start_step)).
    rng = np.random.default_rng([cfg.seed + 1, start_step])
    logger = MetricLogger(cfg.log_path) if cfg.log_path else None

    step_fn = make_forward_kld_step(
        static, opt, mesh=mesh, accum_steps=cfg.accum_steps,
        ema_decay=cfg.ema_decay if use_ema else None,
        skip_nonfinite=cfg.skip_nonfinite)

    from .parallel.train import ema_model, model_of_state

    def eval_bpd(state, use_ema_params=False):
        if not len(x_test):
            return float("nan")
        m = (ema_model(state, static) if use_ema_params
             else model_of_state(state, static))
        xt = scale(jnp.asarray(x_test))
        xt = jitter(xt, jax.random.PRNGKey(cfg.seed + 2))
        b = bits_per_dim(m, xt, jnp.asarray(y_test) if cfg.class_cond
                         else None)
        return float(jnp.nanmean(b))

    t0 = time.time()
    for it in range(start_step, cfg.iters):
        batch = host_batch()
        batch = batch if cfg.class_cond else batch[0]
        # host_batch draws the SAME seeded global batch on every process;
        # _shard_host_batch slices + assembles it (and microbatches it when
        # accum_steps > 1, in any process count)
        batch = _shard_host_batch(mesh, batch, cfg, multiproc)
        state, loss = step_fn(state, batch)
        if it % cfg.log_every == 0 or it == cfg.iters - 1:
            loss_f = float(loss)
            rate = (it - start_step + 1) / (time.time() - t0)
            bpd = eval_bpd(state)
            ema_txt = ""
            extra = {}
            if use_ema:
                bpd_ema = eval_bpd(state, use_ema_params=True)
                ema_txt = f"  ema bits/dim {bpd_ema:.4f}"
                extra["bits_per_dim_ema"] = bpd_ema
            if is_main:
                print(f"step {it:7d}  loss {loss_f:+.1f}  "
                      f"bits/dim {bpd:.4f}{ema_txt}  {rate:.1f} it/s",
                      flush=True)
                if logger is not None:
                    logger.log(it, loss=loss_f, bits_per_dim=bpd,
                               it_per_s=rate, **extra)
        # orbax saves are COLLECTIVE in multiprocess runs (global arrays are
        # not fully addressable from one process): every process must call.
        if ckpt is not None and (it + 1) % cfg.checkpoint_every == 0:
            ckpt.save(it + 1, state, wait=False)
    if ckpt is not None:
        ckpt.save(cfg.iters, state)
        ckpt.wait_until_finished()
    if logger is not None and is_main:
        logger.close()
    if is_main:
        print(f"done: {cfg.iters - start_step} steps in "
              f"{time.time() - t0:.1f}s")
    return state


def _init_distributed(cfg: TrainConfig):
    """Join the jax.distributed cluster (multi-host / multi-process runs;
    coordinator and rank auto-detected from the environment — see
    parallel/multihost.py). Returns True on the printing process."""
    if cfg.distributed:
        from .parallel.multihost import initialize_distributed

        initialize_distributed()
    return jax.process_index() == 0


def _shard_host_batch(mesh, batch, cfg, multiproc: bool):
    """Place a host-drawn GLOBAL batch on the mesh, honoring both
    ``--accum_steps`` (microbatch reshape, micro dim sharded) and
    ``--distributed`` (each process materialises only its slice of the
    sharded dim and assembles the global array).

    Every process must have drawn the SAME global batch (same seeded host
    RNG), so slicing by process index reassembles into a bit-identical
    global array — the per-process data path of ``parallel/multihost.py``.
    """
    import numpy as np

    from .parallel.train import reshape_for_accum

    accum = cfg.accum_steps > 1
    if accum:
        batch = reshape_for_accum(batch, cfg.accum_steps)
    if not multiproc:
        return shard_batch(mesh, batch, accum=accum)
    from .parallel.multihost import host_local_to_global, process_slice

    dim = 1 if accum else 0
    sl = process_slice(cfg.batch_size // (cfg.accum_steps if accum else 1))
    take = (lambda a: np.asarray(a)[:, sl]) if accum \
        else (lambda a: np.asarray(a)[sl])
    return host_local_to_global(mesh, jax.tree_util.tree_map(take, batch),
                                dim=dim)


def main(argv=None):
    from .utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig.from_args(argv)
    is_main = _init_distributed(cfg)
    if is_main:
        print(cfg.to_json())
    if cfg.model in ("glow", "image_nsf"):
        return train_image(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    mesh = make_mesh(("data",))
    if is_main:
        print(f"mesh: {mesh.shape} on {jax.default_backend()} "
              f"({jax.process_count()} process(es))")

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
    use_ema = cfg.ema_decay > 0
    state, static = init_train_state(model, opt,
                                     carry_buffers=carry_buffers,
                                     with_ema=use_ema)

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
        step_fn = make_reverse_kld_step(
            static, opt, mesh, num_samples=cfg.num_samples,
            beta_schedule=beta, post_update=post,
            accum_steps=cfg.accum_steps,
            ema_decay=cfg.ema_decay if use_ema else None,
            skip_nonfinite=cfg.skip_nonfinite)

        def run_step(state, key):
            return step_fn(state, key)
    else:
        from .parallel.train import model_of_state

        target = model_of_state(state, static).p
        mle_step = make_forward_kld_step(
            static, opt, mesh=mesh, with_key=is_residual,
            post_update=post, accum_steps=cfg.accum_steps,
            ema_decay=cfg.ema_decay if use_ema else None,
            skip_nonfinite=cfg.skip_nonfinite)

        multiproc = jax.process_count() > 1

        def run_step(state, key):
            k1, k2 = jax.random.split(key)
            # every process draws the SAME global batch (same key), so the
            # per-process slice assembles into a consistent global array
            x = target.sample(k1, cfg.batch_size)
            x = _shard_host_batch(mesh, x, cfg, multiproc)
            if is_residual:
                return mle_step(state, x, k2)
            return mle_step(state, x)

    # resume continues the RNG stream instead of replaying it from seed
    key = jax.random.fold_in(key, start_step)

    is_main = jax.process_index() == 0
    t0 = time.time()
    loss = None
    for it in range(start_step, cfg.iters):
        key, sub = jax.random.split(key)
        state, loss = run_step(state, sub)
        if it % cfg.log_every == 0 or it == cfg.iters - 1:
            loss_f = float(loss)  # replicated: addressable on every process
            rate = (it - start_step + 1) / (time.time() - t0)
            if is_main:
                print(f"step {it:7d}  loss {loss_f:+.4f}  {rate:.1f} it/s",
                      flush=True)
                if logger is not None:
                    logger.log(it, loss=loss_f, it_per_s=rate)
        # collective in multiprocess runs — every process calls save
        if ckpt is not None and (it + 1) % cfg.checkpoint_every == 0:
            ckpt.save(it + 1, state, wait=False)  # overlap write with steps
    if ckpt is not None:
        ckpt.save(cfg.iters, state)
        ckpt.wait_until_finished()
    if logger is not None and is_main:
        logger.close()
    if is_main:
        print(f"done: {cfg.iters - start_step} steps in "
              f"{time.time() - t0:.1f}s")
    return state


if __name__ == "__main__":
    main()
