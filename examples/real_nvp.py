"""Real NVP fitting the bimodal TwoModes target by annealed reverse KLD
(reference ``examples/real_nvp.ipynb``: K=64 MaskedAffineFlow+ActNorm,
Adam 1e-4, beta annealed over the first half of training)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp

import nf_tpu.models as models
from nf_tpu.distributions import TwoModes

from _utils import base_parser, out_path, plot_density, plot_hist2d, train


def main():
    args = base_parser(__doc__, iters=2000, lr=1e-3,
                       num_samples=1024).parse_args()
    anneal = max(1, args.iters // 2)
    key = jax.random.PRNGKey(args.seed)
    model = models.build_realnvp(key, dim=2, K=16, hidden=[64, 64],
                                 target=TwoModes())
    key, sub = jax.random.split(key)
    model = model.init_from_samples(sub, 512)

    def loss(model, key, it):
        beta = jnp.minimum(1.0, 0.01 + it / anneal)
        return model.reverse_kld(key, args.num_samples, beta=beta)

    model, _ = train(model, loss, args)

    key, sub = jax.random.split(key)
    z, log_q = model.sample(sub, 4096)
    print("sample mean |z|:", float(jnp.mean(jnp.linalg.norm(z, axis=-1))))
    if args.plot:
        plot_density(model.log_prob, out_path("real_nvp_model.png"),
                     title="Real NVP fit")
        plot_density(model.p.log_prob, out_path("real_nvp_target.png"),
                     title="TwoModes target")
        plot_hist2d(z, out_path("real_nvp_samples.png"))


if __name__ == "__main__":
    main()
