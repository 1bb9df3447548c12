"""Mixed circular/unbounded neural spline flow trained by forward KLD on
samples from a mixed target (reference ``examples/circular_nsf.ipynb``)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models

from _utils import base_parser, out_path, plot_hist2d, train


def sample_target(key, n):
    """The reference notebook's mixed target: bimodal Gaussian in dim 0,
    skewed circular density in dim 1 (``circular_nsf.ipynb`` cell 4)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = jax.random.normal(k1, (n, 2))
    c = jax.random.uniform(k2, (n, 2)) > 0.6
    s = jnp.where(c, 0.3 * s - 0.5, s + 1.3)
    u = jax.random.uniform(k3, (n, 1))
    s_ = jnp.arccos(2 * u - 1)
    flip = jax.random.uniform(k4, (n, 1)) > 0.3
    s_ = jnp.where(flip, -s_, s_)
    phi = jnp.mod(s_ + 1, 2 * np.pi) - np.pi
    return s.at[:, 1:2].set(phi)


def main():
    args = base_parser(__doc__, iters=2000, lr=3e-3,
                       num_samples=1024).parse_args()
    key = jax.random.PRNGKey(args.seed)
    model = models.build_circular_nsf(key, dim=2, ind_circ=(1,), K=6,
                                      hidden=64, num_bins=8)

    def loss(model, key, it):
        x = sample_target(key, args.num_samples)
        return model.forward_kld(x)

    model, _ = train(model, loss, args)
    key, sub = jax.random.split(key)
    z, _ = model.sample(sub, 8192)
    print("circular coord bounded:",
          bool(jnp.all(jnp.abs(z[:, 1]) <= np.pi + 1e-4)))
    if args.plot:
        plot_hist2d(z, out_path("circular_nsf_model.png"),
                    extent=(-3, 3, -np.pi, np.pi), title="model samples")
        plot_hist2d(sample_target(key, 8192),
                    out_path("circular_nsf_target.png"),
                    extent=(-3, 3, -np.pi, np.pi), title="target samples")


if __name__ == "__main__":
    main()
