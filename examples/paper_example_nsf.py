"""The reference paper's flagship example: circular autoregressive neural
spline flow fitting a Gauss-von Mises density on a cylinder, trained by
reverse KLD with 2^14-sample batches (reference
``examples/paper_example_nsf.ipynb`` cells 8-11 and ``paper/paper.md:98-106``).

The target lives on (phi, z) with phi circular: p(phi, z) proportional to a
von Mises in phi coupled to a Gaussian in z.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models
from nf_tpu.utils.module import Module, static_field

from _utils import base_parser, out_path, plot_density, train


class GaussVonMises(Module):
    """Unnormalized Gauss-von Mises cylinder density (the in-notebook target
    of reference ``paper_example_nsf.ipynb`` cell 8)."""

    loc_phi: float = static_field(default=0.0)
    conc: float = static_field(default=2.0)
    loc_z: float = static_field(default=0.0)
    scale_z: float = static_field(default=1.0)
    corr: float = static_field(default=0.8)

    def log_prob(self, x, context=None):
        phi, z = x[..., 0], x[..., 1]
        mu_z = self.loc_z + self.corr * jnp.sin(phi - self.loc_phi)
        return (self.conc * jnp.cos(phi - self.loc_phi)
                - 0.5 * ((z - mu_z) / self.scale_z) ** 2)


def main():
    p = base_parser(__doc__, iters=2000, lr=5e-4, num_samples=2 ** 12)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--K", type=int, default=6)
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)

    target = GaussVonMises()
    model = models.build_circular_nsf(key, dim=2, ind_circ=(0,), K=args.K,
                                      hidden=args.hidden, num_bins=10,
                                      target=target)

    import optax
    sched = optax.cosine_decay_schedule(args.lr, args.iters)

    def loss(model, key, it):
        return model.reverse_kld(key, args.num_samples)

    model, _ = train(model, loss, args, lr_schedule=sched)

    key, sub = jax.random.split(key)
    z, _ = model.sample(sub, 8192)
    print("phi in [-pi, pi]:",
          bool(jnp.all(jnp.abs(z[:, 0]) <= np.pi + 1e-4)))
    print("sample moments: mean", np.asarray(jnp.mean(z, 0)),
          "std", np.asarray(jnp.std(z, 0)))
    if args.plot:
        plot_density(model.log_prob, out_path("nsf_cylinder_model.png"),
                     extent=(-np.pi, np.pi, -3, 3),
                     title="Circular NSF on cylinder")
        plot_density(target.log_prob, out_path("nsf_cylinder_target.png"),
                     extent=(-np.pi, np.pi, -3, 3),
                     title="Gauss-von Mises target")


if __name__ == "__main__":
    main()
