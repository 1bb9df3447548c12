"""Conditional normalizing flow q(x|c) fitting a conditional Gaussian
target whose mean and scale are the context (reference
``examples/conditional_flow.ipynb``: context size 4, conditional coupled
NSF / MAF)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp

import nf_tpu.models as models
from nf_tpu.distributions import ConditionalDiagGaussianTarget

from _utils import base_parser, train


def main():
    args = base_parser(__doc__, iters=2000, lr=3e-3,
                       num_samples=512).parse_args()
    key = jax.random.PRNGKey(args.seed)
    target = ConditionalDiagGaussianTarget()
    model = models.build_conditional_nsf(key, target=target)

    def sample_context(key, n):
        k1, k2 = jax.random.split(key)
        mu = 2.0 * jax.random.uniform(k1, (n, 2)) - 1.0
        sigma = 0.5 + jax.random.uniform(k2, (n, 2))
        return jnp.concatenate([mu, sigma], axis=-1)

    def loss(model, key, it):
        k1, k2 = jax.random.split(key)
        context = sample_context(k1, args.num_samples)
        x = target.sample(k2, args.num_samples, context=context)
        return model.forward_kld(x, context=context)

    model, _ = train(model, loss, args)

    # check: conditional samples should track the requested moments
    key, k1, k2 = jax.random.split(key, 3)
    ctx = jnp.tile(jnp.asarray([[0.3, 0.9, 0.6, 0.6]]), (4096, 1))
    z, _ = model.sample(k1, 4096, context=ctx)
    print("requested mean [0.3, 0.9]  got", jnp.mean(z, 0))
    print("requested std  [0.6, 0.6]  got", jnp.std(z, 0))


if __name__ == "__main__":
    main()
