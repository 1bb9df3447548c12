"""Neural spline flows (coupled and autoregressive RQS) fitting TwoMoons
by forward KLD on target samples (reference
``examples/neural_spline_flow.ipynb``)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax

import nf_tpu.models as models
from nf_tpu.distributions import TwoMoons

from _utils import base_parser, out_path, plot_density, train


def main():
    p = base_parser(__doc__, iters=2000, lr=3e-3, num_samples=512)
    p.add_argument("--autoregressive", action="store_true")
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)
    target = TwoMoons()

    if args.autoregressive:
        import nf_tpu.flows as nff
        from nf_tpu import core
        from nf_tpu.distributions import DiagGaussian

        keys = jax.random.split(key, 8)
        flows = []
        for i in range(4):
            flows.append(nff.AutoregressiveRationalQuadraticSpline.create(
                keys[2 * i], num_input_channels=2, num_blocks=2,
                num_hidden_channels=64, num_bins=8))
            flows.append(nff.LULinearPermute.create(keys[2 * i + 1], 2))
        model = core.NormalizingFlow.create(
            DiagGaussian.create(2, trainable=False), flows, p=target)
    else:
        model = models.build_nsf(key, dim=2, K=4, hidden=64, num_bins=8,
                                 target=target)

    def loss(model, key, it):
        k1, k2 = jax.random.split(key)
        x = model.p.sample(k1, args.num_samples)
        return model.forward_kld(x)

    model, _ = train(model, loss, args)
    if args.plot:
        kind = "ar" if args.autoregressive else "coupled"
        plot_density(model.log_prob, out_path(f"nsf_{kind}_model.png"),
                     title=f"NSF ({kind}) fit of TwoMoons")


if __name__ == "__main__":
    main()
