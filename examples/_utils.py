"""Shared helpers for the example scripts.

Every example is a small CLI: fast defaults for smoke runs, ``--iters`` etc.
for the full reference recipes. Figures/samples are written to
``examples/out/``. (The reference ships these as notebooks,
``/root/reference/examples/*.ipynb``; here they are runnable scripts.)
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nf_tpu.utils.module import combine, partition

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def out_path(name):
    os.makedirs(OUT_DIR, exist_ok=True)
    return os.path.join(OUT_DIR, name)


def base_parser(description, iters, lr=1e-3, num_samples=512):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--iters", type=int, default=iters)
    p.add_argument("--lr", type=float, default=lr)
    p.add_argument("--num-samples", type=int, default=num_samples)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--plot", action="store_true", help="save pngs to out/")
    p.add_argument("--log-every", type=int, default=0,
                   help="0 = auto (10 prints per run)")
    return p


def log_every(args):
    return args.log_every or max(1, args.iters // 10)


def train(model, loss_of_model, args, weight_decay=0.0,
          post_update=None, lr_schedule=None):
    """Generic jitted training loop.

    ``loss_of_model(model, key, it) -> scalar``. ``post_update(model)`` runs
    inside the step after the optimizer update (e.g. Lipschitz power
    iteration); its buffer updates are threaded through the step so they
    persist. Returns (model, loss_history).
    """
    from nf_tpu.parallel.train import apply_post_update
    from nf_tpu.utils.module import partition_arrays

    params, static = partition(model)
    # buffers ride through the step explicitly — in-step updates to them
    # (power iteration u/v) must not be dropped with the static closure
    buffers, config = partition_arrays(static)
    lr = lr_schedule if lr_schedule is not None else args.lr
    opt = (optax.adamw(lr, weight_decay=weight_decay)
           if weight_decay else optax.adam(lr))
    opt_state = opt.init(params)

    def model_of(params, buffers):
        return combine(combine(params, buffers), config)

    @jax.jit
    def step(params, buffers, opt_state, key, it):
        def loss_fn(p):
            return loss_of_model(model_of(p, buffers), key, it)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if post_update is not None:
            params, buffers = apply_post_update(params, buffers, config,
                                                post_update)
        return params, buffers, opt_state, loss

    # distinct stream from the caller's model-init keys (same seed)
    key = jax.random.fold_in(jax.random.PRNGKey(args.seed), 0x7EA1)
    every = log_every(args)
    hist = []
    t0 = time.time()
    for it in range(args.iters):
        key, sub = jax.random.split(key)
        params, buffers, opt_state, loss = step(
            params, buffers, opt_state, sub, jnp.asarray(it, jnp.float32))
        if it % every == 0 or it == args.iters - 1:
            loss = float(loss)
            hist.append((it, loss))
            print(f"iter {it:6d}  loss {loss:+.4f}", flush=True)
    print(f"{args.iters} iters in {time.time() - t0:.1f}s "
          f"on {jax.default_backend()}")
    return model_of(params, buffers), hist


def plot_density(log_prob_fn, path, extent=(-3, 3, -3, 3), grid=200,
                 title=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = np.linspace(extent[0], extent[1], grid)
    ys = np.linspace(extent[2], extent[3], grid)
    xx, yy = np.meshgrid(xs, ys)
    zz = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], 1), jnp.float32)
    lp = np.asarray(jax.jit(log_prob_fn)(zz)).reshape(grid, grid)
    prob = np.exp(lp)
    prob[~np.isfinite(prob)] = 0.0
    plt.figure(figsize=(6, 6))
    plt.pcolormesh(xx, yy, prob, shading="auto")
    plt.gca().set_aspect("equal", "box")
    if title:
        plt.title(title)
    plt.savefig(path, dpi=120, bbox_inches="tight")
    plt.close()
    print("wrote", path)


def plot_hist2d(samples, path, extent=(-3, 3, -3, 3), bins=64, title=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = np.asarray(samples)
    plt.figure(figsize=(6, 6))
    plt.hist2d(s[:, 0], s[:, 1], bins=bins,
               range=[[extent[0], extent[1]], [extent[2], extent[3]]])
    plt.gca().set_aspect("equal", "box")
    if title:
        plt.title(title)
    plt.savefig(path, dpi=120, bbox_inches="tight")
    plt.close()
    print("wrote", path)
