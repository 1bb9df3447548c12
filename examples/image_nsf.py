"""Multi-scale neural-spline flow on images (4D RQS channel couplings with
ConvResidualNet conditioners) — assembled from pieces the reference ships
individually (``neural_spline/coupling.py:56-61``, ``nets/resnet.py:107``).
On TPU the elementwise spline rides the fused Pallas kernel.

Data: ``--data path.npz`` with ``x`` (N,3,32,32) uint8, else procedural.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np

import nf_tpu.models as models
from nf_tpu.utils.eval import bits_per_dim
from nf_tpu.utils.preprocessing import Jitter, Scale

from _utils import base_parser, train

from nf_tpu.data import procedural_image_classes


def main():
    p = base_parser(__doc__, iters=300, lr=1e-3, num_samples=64)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--L", type=int, default=2)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--num-bins", type=int, default=8)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)

    if args.data:
        x_all = jnp.asarray(np.load(args.data)["x"])
    else:
        x_u8, _ = procedural_image_classes(args.seed, 2048)
        x_all = jnp.asarray(x_u8)
    n = x_all.shape[0]
    scale, jitter = Scale(), Jitter()

    key, sub = jax.random.split(key)
    model = models.build_image_nsf(sub, input_shape=x_all.shape[1:],
                                   L=args.L, K=args.K,
                                   hidden_channels=args.hidden,
                                   num_bins=args.num_bins)

    def get_batch(key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (args.batch,), 0, n)
        return jitter(scale(x_all[idx].astype(jnp.float32) / 255.0), k2)

    key, sub = jax.random.split(key)
    model = model.init_from_data(get_batch(sub))

    def loss(model, key, it):
        return model.forward_kld(get_batch(key))

    model, _ = train(model, loss, args, weight_decay=1e-5)

    key, k1, k2 = jax.random.split(key, 3)
    bpd = bits_per_dim(model, get_batch(k1))
    print("bits/dim:", float(jnp.nanmean(bpd)))
    s, _ = model.sample(k2, 16, temperature=0.7)
    print("sample shape:", s.shape, "finite:",
          bool(jnp.isfinite(s).all()))


if __name__ == "__main__":
    main()
