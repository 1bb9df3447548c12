"""Augmented normalizing flow: Real NVP over (x, a) with a TwoIndependent
target (data density times standard-normal auxiliary), trained by annealed
reverse KLD (reference ``examples/augmented_flow.ipynb``: latent 4 = 2 data
+ 2 augmented dims)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp

import nf_tpu.models as models
from nf_tpu.distributions import DiagGaussian, TwoIndependent, TwoMoons

from _utils import base_parser, out_path, plot_hist2d, train


def main():
    args = base_parser(__doc__, iters=2000, lr=1e-3,
                       num_samples=1024).parse_args()
    anneal = max(1, args.iters // 2)
    key = jax.random.PRNGKey(args.seed)
    target = TwoIndependent(target1=TwoMoons(),
                            target2=DiagGaussian.create(2, trainable=False))
    model = models.build_realnvp(key, dim=4, K=16, hidden=[64, 64],
                                 target=target)
    key, sub = jax.random.split(key)
    model = model.init_from_samples(sub, 512)

    def loss(model, key, it):
        beta = jnp.minimum(1.0, 0.01 + it / anneal)
        return model.reverse_kld(key, args.num_samples, beta=beta)

    model, _ = train(model, loss, args)

    key, sub = jax.random.split(key)
    z, _ = model.sample(sub, 8192)
    print("data-coord std:", jnp.std(z[:, :2], 0),
          " aux-coord std:", jnp.std(z[:, 2:], 0))
    if args.plot:
        plot_hist2d(z[:, :2], out_path("augmented_data_coords.png"),
                    title="data coordinates")
        plot_hist2d(z[:, 2:], out_path("augmented_aux_coords.png"),
                    title="augmented coordinates")


if __name__ == "__main__":
    main()
