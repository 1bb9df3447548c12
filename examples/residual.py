"""Residual flow (iResBlocks with Lipschitz-constrained MLPs) fitting the
two-moons dataset by forward KLD, with spectral-norm power iteration after
every step (reference ``examples/residual.ipynb``: K=16 blocks, 128x3
Lipschitz MLP, L=0.9, ``update_lipschitz`` per step)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models
from nf_tpu.utils.optim import update_lipschitz

from _utils import base_parser, out_path, plot_density, train


def make_moons(key, n, noise=0.1):
    """Two interleaving half circles (sklearn.datasets.make_moons
    semantics, locally implemented — no sklearn dependency)."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = jax.random.uniform(k1, (n,)) * np.pi
    upper = jax.random.bernoulli(k2, 0.5, (n,))
    x = jnp.where(upper, jnp.cos(t), 1.0 - jnp.cos(t))
    y = jnp.where(upper, jnp.sin(t), 0.5 - jnp.sin(t))
    pts = jnp.stack([x - 0.5, y - 0.25], axis=1)
    return pts * 2.0 + noise * jax.random.normal(k3, (n, 2))


def main():
    p = base_parser(__doc__, iters=500, lr=3e-3, num_samples=512)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--hidden", type=int, default=64)
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)
    model = models.build_residual(key, K=args.K, hidden=args.hidden)
    key, sub = jax.random.split(key)
    model = model.init_from_data(make_moons(sub, 512))

    def loss(model, key, it):
        k1, k2 = jax.random.split(key)
        x = make_moons(k1, args.num_samples)
        return model.forward_kld(x, key=k2)

    model, _ = train(model, loss, args,
                     post_update=lambda m: update_lipschitz(m, 5))
    model = update_lipschitz(model, 50)

    key, sub = jax.random.split(key)
    x = make_moons(sub, 2048)
    print("final forward KLD:", float(model.forward_kld(x, key=key)))
    if args.plot:
        plot_density(lambda z: model.log_prob(z, key=jax.random.PRNGKey(1)),
                     out_path("residual_model.png"),
                     title="Residual flow fit of two moons")


if __name__ == "__main__":
    main()
