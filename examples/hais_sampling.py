"""Hamiltonian annealed importance sampling from a 2D target, with the
effective sample size of the importance weights as the quality metric
(reference ``normflows/sampling/hais.py`` — the reference ships no
notebook for HAIS; this script is its driver)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu.distributions import DiagGaussian, TwoModes
from nf_tpu.sampling import HAIS
from nf_tpu.utils import effective_sample_size

from _utils import out_path, plot_hist2d


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-samples", type=int, default=4096)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--leapfrog", type=int, default=5)
    p.add_argument("--step-size", type=float, default=0.12)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()

    betas = np.linspace(1.0, 0.0, args.steps + 1)
    prior = DiagGaussian.create(2, trainable=False)
    target = TwoModes()
    hais = HAIS.create(betas, prior, target, num_leapfrog=args.leapfrog,
                       step_size=[args.step_size] * 2, log_mass=[0.0] * 2)

    key = jax.random.PRNGKey(args.seed)
    samples, log_w, acceptance = jax.jit(
        lambda k: hais.sample_with_stats(k, args.num_samples))(key)
    ess = float(effective_sample_size(log_w))
    w = jnp.exp(log_w - jnp.max(log_w))
    w = w / jnp.sum(w)
    mean = jnp.sum(w[:, None] * samples, axis=0)
    print(f"ESS: {ess:.1f} / {args.num_samples} "
          f"({100 * ess / args.num_samples:.1f}%)")
    print("weighted mean:", np.asarray(mean))
    print("log Z estimate:",
          float(jax.nn.logsumexp(log_w) - np.log(args.num_samples)))
    acceptance = np.asarray(acceptance)
    print(f"HMC acceptance over the {len(acceptance)} annealing layers: "
          f"mean {acceptance.mean():.3f}, "
          f"min {acceptance.min():.3f} (layer {int(acceptance.argmin())}), "
          f"max {acceptance.max():.3f}")
    # acceptance curve along the annealing schedule (first-class MCMC
    # observability — the reference computes the accept mask but drops it)
    with open(out_path("hais_acceptance.csv"), "w") as f:
        f.write("layer,acceptance\n")
        f.writelines(f"{i},{a:.6f}\n" for i, a in enumerate(acceptance))
    if args.plot:
        plot_hist2d(samples, out_path("hais_samples.png"),
                    title="HAIS samples (unweighted)")


if __name__ == "__main__":
    main()
