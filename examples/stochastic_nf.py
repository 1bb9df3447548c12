"""Stochastic normalizing flow: deterministic coupling layers interleaved
with Hamiltonian Monte Carlo layers targeting annealed interpolations
between base and target (Wu et al. 2020; reference layers
``normflows/flows/stochastic.py`` — the reference ships no SNF example).

The MCMC layers contribute log-ratio weights to log_q, so reverse-KLD
training and sampling work through the standard NormalizingFlow API with
per-layer RNG keys.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp

import nf_tpu.flows as nff
from nf_tpu import core
from nf_tpu.distributions import (
    DiagGaussian,
    LinearInterpolation,
    TwoModes,
)
from nf_tpu.nets import MLP
from nf_tpu.utils.masks import create_alternating_binary_mask

from _utils import base_parser, out_path, plot_hist2d, train


def build_snf(key, dim=2, K=4, hidden=64, mcmc_every=2, hmc_leapfrog=5,
              target=None):
    base = DiagGaussian.create(dim, trainable=False)
    keys = jax.random.split(key, 2 * K)
    flows = []
    for i in range(K):
        b = create_alternating_binary_mask(dim, even=(i % 2 == 0))
        s = MLP.create(keys[2 * i], [dim, hidden, hidden, dim],
                       init_zeros=True)
        t = MLP.create(keys[2 * i + 1], [dim, hidden, hidden, dim],
                       init_zeros=True)
        flows.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
        flows.append(nff.ActNorm.create(dim))
        if (i + 1) % mcmc_every == 0:
            # anneal toward the target as depth increases
            alpha = (i + 1) / K
            intermediate = LinearInterpolation(dist1=target, dist2=base,
                                               alpha=alpha)
            flows.append(nff.HamiltonianMonteCarlo.create(
                intermediate, steps=hmc_leapfrog,
                log_step_size=jnp.log(jnp.full((dim,), 0.2)),
                log_mass=jnp.zeros((dim,))))
    return core.NormalizingFlow.create(base, flows, p=target)


def main():
    args = base_parser(__doc__, iters=1500, lr=2e-3,
                       num_samples=1024).parse_args()
    key = jax.random.PRNGKey(args.seed)
    target = TwoModes()
    model = build_snf(key, target=target)
    key, sub = jax.random.split(key)
    model = model.init_from_samples(sub, 512)

    def loss(model, key, it):
        beta = jnp.minimum(1.0, 0.05 + it / max(1, args.iters // 2))
        return model.reverse_kld(key, args.num_samples, beta=beta)

    model, _ = train(model, loss, args)

    key, sub = jax.random.split(key)
    z, log_q, acceptance = jax.jit(
        lambda k: model.sample_with_mcmc_stats(k, 8192))(sub)
    r = jnp.linalg.norm(z, axis=-1)
    print("sample mean |z| (TwoModes ring radius ~2):",
          float(jnp.mean(r)))
    # per-HMC-layer acceptance (first-class MCMC observability): each entry
    # is the layer's MH-correction acceptance rate over the 8192 chains
    import numpy as np

    rates = [float(np.asarray(a).mean()) for a in acceptance]
    print("HMC layer acceptance rates:",
          ", ".join(f"{r_:.3f}" for r_ in rates))
    with open(out_path("snf_acceptance.csv"), "w") as f:
        f.write("mcmc_layer,acceptance\n")
        f.writelines(f"{i},{a:.6f}\n" for i, a in enumerate(rates))
    if args.plot:
        plot_hist2d(z, out_path("snf_samples.png"),
                    title="SNF samples (coupling + HMC layers)")


if __name__ == "__main__":
    main()
