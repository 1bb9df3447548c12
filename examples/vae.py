"""Normalizing-flow VAE: flow-transformed approximate posterior over a
binarized image dataset (reference ``examples/vae.py`` /
``examples/vae.ipynb``: MNIST, NNDiagGaussian encoder, Planar/RealNVP
posterior flows, Bernoulli decoder, IWAE-style bound).

Data: pass ``--data path.npz`` with array ``x`` (N, 784) in [0,1]; without
it a procedural multi-blob dataset is used (zero-download environment).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu.flows as nff
from nf_tpu import core
from nf_tpu.distributions import (
    DiagGaussian,
    NNBernoulliDecoder,
    NNDiagGaussian,
)
from nf_tpu.nets import MLP
from nf_tpu.utils.module import combine, partition

from _utils import base_parser


def procedural_digits(key, n=4096, side=28):
    """Blob 'digits': a few Gaussian bumps at class-dependent positions."""
    k1, k2 = jax.random.split(key)
    cls = jax.random.randint(k1, (n,), 0, 10)
    yy, xx = jnp.mgrid[0:side, 0:side] / side
    cx = 0.25 + 0.5 * (cls % 3)[:, None, None] / 2.0
    cy = 0.25 + 0.5 * (cls // 3)[:, None, None] / 3.0
    img = jnp.exp(-(((xx[None] - cx) ** 2 + (yy[None] - cy) ** 2) / 0.02))
    img = jnp.clip(img + 0.05 * jax.random.uniform(k2, img.shape), 0, 1)
    return img.reshape(n, -1)


def main():
    p = base_parser(__doc__, iters=1000, lr=1e-3, num_samples=1)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--latent", type=int, default=16)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--flows", type=int, default=4,
                   help="number of posterior RealNVP layers (0 = plain VAE)")
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)

    if args.data:
        x_all = jnp.asarray(np.load(args.data)["x"], jnp.float32)
    else:
        key, sub = jax.random.split(key)
        x_all = procedural_digits(sub)
    n, d_in = x_all.shape
    L = args.latent

    k_enc, k_dec, key = jax.random.split(key, 3)
    encoder_net = MLP.create(k_enc, [d_in, 256, 256, 2 * L])
    decoder_net = MLP.create(k_dec, [L, 256, 256, d_in])
    q0 = NNDiagGaussian(net=encoder_net)
    decoder = NNBernoulliDecoder(net=decoder_net)
    prior = DiagGaussian.create(L, trainable=False)

    flows = []
    keys = jax.random.split(key, 2 * max(args.flows, 1) + 1)
    key = keys[-1]
    for i in range(args.flows):
        b = jnp.asarray([1.0] * (L // 2) + [0.0] * (L - L // 2))
        b = b if i % 2 == 0 else 1.0 - b
        s = MLP.create(keys[2 * i], [L, 128, L], init_zeros=True)
        t = MLP.create(keys[2 * i + 1], [L, 128, L], init_zeros=True)
        flows.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
    model = core.NormalizingFlowVAE.create(prior, q0, flows=flows,
                                           decoder=decoder)

    params, static = partition(model)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (args.batch,), 0, n)
        x = x_all[idx]

        def loss_fn(p):
            m = combine(p, static)
            _, log_q, log_p = m.forward(k2, x, num_samples=args.num_samples)
            return jnp.mean(log_q - log_p)  # negative ELBO

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    every = max(1, args.iters // 10)
    for it in range(args.iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if it % every == 0 or it == args.iters - 1:
            print(f"iter {it:6d}  -ELBO {float(loss):.4f}", flush=True)

    # IWAE-style bound with more posterior samples
    model = combine(params, static)
    key, sub = jax.random.split(key)
    _, log_q, log_p = model.forward(sub, x_all[:512], num_samples=16)
    iwae = jnp.mean(jax.nn.logsumexp(log_p - log_q, axis=1) - np.log(16))
    print("IWAE-16 bound:", float(iwae))


if __name__ == "__main__":
    main()
