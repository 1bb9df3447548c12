"""Multi-scale class-conditional Glow (reference ``examples/glow.ipynb``:
L=3, K=16, hidden 256, CIFAR-10, Adamax 1e-3, bits/dim eval).

Data: pass ``--data path.npz`` with arrays ``x`` (N,3,32,32) uint8 and
``y`` (N,) int; without it a procedural class-structured dataset is used so
the recipe runs in a zero-download environment.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu.models as models
from nf_tpu.data import procedural_image_classes
from nf_tpu.utils.eval import bits_per_dim
from nf_tpu.utils.preprocessing import Jitter, Scale

from _utils import base_parser, out_path, train


def main():
    p = base_parser(__doc__, iters=300, lr=1e-3, num_samples=128)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--L", type=int, default=2)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--scan", action="store_true",
                   help="lax.scan the K GlowBlocks per level (faster compile + step)")
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)

    if args.data:
        d = np.load(args.data)
        x_all, y_all = jnp.asarray(d["x"]), jnp.asarray(d["y"])
    else:
        x_u8, y_np = procedural_image_classes(args.seed, 2048)
        x_all, y_all = jnp.asarray(x_u8), jnp.asarray(y_np)
    n = x_all.shape[0]
    scale, jitter = Scale(), Jitter()

    key, sub = jax.random.split(key)
    model = models.build_glow_multiscale(
        sub, input_shape=x_all.shape[1:], L=args.L, K=args.K,
        hidden_channels=args.hidden, num_classes=10, class_cond=True,
        scan=args.scan)

    def get_batch(key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (args.batch,), 0, n)
        x = scale(x_all[idx].astype(jnp.float32) / 255.0)
        x = jitter(x, k2)
        return x, y_all[idx]

    key, sub = jax.random.split(key)
    model = model.init_from_data(*get_batch(sub))

    def loss(model, key, it):
        x, y = get_batch(key)
        return model.forward_kld(x, y)

    model, _ = train(model, loss, args, weight_decay=1e-5)

    # bits/dim on a held-out batch (reference utils/eval.py:5-34)
    key, k1, k2 = jax.random.split(key, 3)
    x, y = get_batch(k1)
    bpd = bits_per_dim(model, x, y)
    print("bits/dim:", float(jnp.nanmean(bpd)))

    key, sub = jax.random.split(key)
    samples, _ = model.sample(sub, 16, temperature=0.7)
    print("sample shape:", samples.shape,
          "finite:", bool(jnp.isfinite(samples).all()))
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        s = np.asarray(jnp.clip(samples, 0, 1).transpose(0, 2, 3, 1))
        fig, axes = plt.subplots(4, 4, figsize=(8, 8))
        for ax, im in zip(axes.ravel(), s):
            ax.imshow(im)
            ax.axis("off")
        fig.savefig(out_path("glow_samples.png"), dpi=120,
                    bbox_inches="tight")
        print("wrote", out_path("glow_samples.png"))


if __name__ == "__main__":
    main()
