"""Changing the base distribution: fit TwoMoons with (a) a standard
Gaussian base and (b) a trainable Gaussian-mixture base, which resolves the
topology mismatch (reference ``examples/change_base_distribution.ipynb``)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax

import nf_tpu.flows as nff
from nf_tpu import core
from nf_tpu.distributions import DiagGaussian, GaussianMixture, TwoMoons
from nf_tpu.nets import MLP

from _utils import base_parser, out_path, plot_density, train


def build(key, q0, K=8):
    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        param_map = MLP.create(keys[i], [1, 64, 64, 2], init_zeros=True)
        flows.append(nff.AffineCouplingBlock.create(param_map))
        flows.append(nff.Permute.create(keys[K + i], 2, mode="swap"))
    return core.NormalizingFlow.create(q0, flows, p=TwoMoons())


def main():
    p = base_parser(__doc__, iters=2000, lr=3e-3, num_samples=512)
    p.add_argument("--base", choices=["gauss", "gmm"], default="gmm")
    args = p.parse_args()
    key, k0 = jax.random.split(jax.random.PRNGKey(args.seed))

    if args.base == "gmm":
        q0 = GaussianMixture.create(n_modes=2, dim=2,
                                    loc=[[-1.0, 0.0], [1.0, 0.0]])
    else:
        q0 = DiagGaussian.create(2, trainable=True)
    model = build(k0, q0)

    def loss(model, key, it):
        x = model.p.sample(key, args.num_samples)
        return model.forward_kld(x)

    model, _ = train(model, loss, args)
    if args.plot:
        plot_density(model.log_prob,
                     out_path(f"base_{args.base}_model.png"),
                     title=f"TwoMoons fit, base={args.base}")


if __name__ == "__main__":
    main()
