"""Planar flow stack fitting a 2D target by reverse KLD
(reference ``examples/planar.ipynb``)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax

import nf_tpu.models as models
from nf_tpu.distributions import TwoModes

from _utils import base_parser, out_path, plot_density, train


def main():
    args = base_parser(__doc__, iters=3000, lr=5e-3,
                       num_samples=512).parse_args()
    key = jax.random.PRNGKey(args.seed)
    model = models.build_planar_stack(key, dim=2, K=16, target=TwoModes())

    def loss(model, key, it):
        return model.reverse_kld(key, args.num_samples)

    model, _ = train(model, loss, args)
    if args.plot:
        plot_density(model.log_prob, out_path("planar_model.png"),
                     title="Planar flow fit")


if __name__ == "__main__":
    main()
