"""Residual flow (iResBlocks with Lipschitz-constrained MLPs) fitting the
two-moons dataset by forward KLD, with spectral-norm power iteration after
every step (reference ``examples/residual.ipynb``: K=16 blocks, [2,128,128,2]
Lipschitz MLP, L=0.9, Adam 3e-4 + wd 1e-5, ``update_lipschitz(50)`` per
step, 20k iters — pass ``--iters 20000`` for the full recipe)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models
from nf_tpu.utils.optim import update_lipschitz

from _utils import base_parser, out_path, plot_density, train


def make_moons(key, n, noise=0.1):
    """sklearn.datasets.make_moons semantics (outer circle + inner
    half-circle shifted by (1, 0.5)), implemented in jax."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = jax.random.uniform(k1, (n,)) * np.pi
    upper = jax.random.bernoulli(k2, 0.5, (n,))
    x = jnp.where(upper, jnp.cos(t), 1.0 - jnp.cos(t))
    y = jnp.where(upper, jnp.sin(t), 0.5 - jnp.sin(t))
    return (jnp.stack([x, y], axis=1)
            + noise * jax.random.normal(k3, (n, 2)))


def main():
    p = base_parser(__doc__, iters=3000, lr=3e-4, num_samples=512)
    p.add_argument("--K", type=int, default=16)
    p.add_argument("--hidden", type=int, default=128)
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)
    model = models.build_residual(key, K=args.K, hidden=args.hidden,
                                  n_hidden_layers=2)
    key, sub, k_init = jax.random.split(key, 3)
    model = model.init_from_data(make_moons(sub, 512), key=k_init)

    def loss(model, key, it):
        k1, k2 = jax.random.split(key)
        x = make_moons(k1, args.num_samples)
        return model.forward_kld(x, key=k2)

    model, _ = train(model, loss, args, weight_decay=1e-5,
                     post_update=lambda m: update_lipschitz(m, 50))

    # eval with the exact 2D Jacobian log-det (the reference's eval-mode
    # behavior) instead of the noisy stochastic estimator
    from nf_tpu.flows import set_exact_logdet

    eval_model = set_exact_logdet(model)
    key, sub = jax.random.split(key)
    x = make_moons(sub, 2048)
    print("final forward KLD (exact log-det):",
          float(eval_model.forward_kld(x, key=key)))
    if args.plot:
        plot_density(lambda z: eval_model.log_prob(z),
                     out_path("residual_model.png"),
                     extent=(-1.5, 2.5, -1.5, 2.0),
                     title="Residual flow fit of two moons")


if __name__ == "__main__":
    main()
