"""Comparison study: planar vs radial vs affine-coupling flows on the
reference's 2D VI targets (reference
``examples/comparison_plan_rad_aff.ipynb``)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp

import nf_tpu.models as models
from nf_tpu.distributions import (
    RingMixture,
    Sinusoidal,
    Smiley,
    TwoModes,
)

from _utils import base_parser, out_path, plot_density, train

TARGETS = {
    "two_modes": TwoModes(),
    "sinusoidal": Sinusoidal(scale=2.0, period=4.0),
    "smiley": Smiley(scale=2.0),
    "ring_mixture": RingMixture(),
}

BUILDERS = {
    "planar": lambda key, target: models.build_planar_stack(
        key, dim=2, K=16, target=target),
    "radial": lambda key, target: models.build_radial_stack(
        key, dim=2, K=16, target=target),
    "affine": lambda key, target: models.build_realnvp(
        key, dim=2, K=8, hidden=[32, 32], target=target),
}


def main():
    p = base_parser(__doc__, iters=1500, lr=3e-3, num_samples=512)
    p.add_argument("--targets", nargs="*", default=["two_modes", "smiley"])
    p.add_argument("--flows", nargs="*", default=list(BUILDERS))
    args = p.parse_args()

    results = {}
    for tname in args.targets:
        target = TARGETS[tname]
        for fname in args.flows:
            key = jax.random.PRNGKey(args.seed)
            model = BUILDERS[fname](key, target)
            print(f"=== {fname} on {tname} ===")

            def loss(model, key, it):
                beta = jnp.minimum(1.0, 0.05 + it / max(1, args.iters // 2))
                return model.reverse_kld(key, args.num_samples, beta=beta)

            model, hist = train(model, loss, args)
            results[(fname, tname)] = hist[-1][1]
            if args.plot:
                plot_density(model.log_prob,
                             out_path(f"cmp_{fname}_{tname}.png"),
                             title=f"{fname} on {tname}")

    print("\nfinal reverse-KLD losses (lower is better):")
    for (fname, tname), v in sorted(results.items()):
        print(f"  {fname:8s} {tname:12s} {v:+.4f}")


if __name__ == "__main__":
    main()
