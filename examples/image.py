"""Learn the 2D density given by an image's intensities with Real NVP
(reference ``examples/image.ipynb``: ImagePrior target, forward KLD on
rejection-sampled pixels). With no --image given, a procedural smiley is
used so the example runs with zero assets."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import argparse

import jax
import numpy as np

import nf_tpu.models as models
from nf_tpu.distributions import ImagePrior

from _utils import base_parser, out_path, plot_density, train


def procedural_image(size=128):
    """Smiley-face intensity grid (stand-in for the notebook's img.png)."""
    y, x = np.mgrid[-1:1:size * 1j, -1:1:size * 1j]
    face = np.exp(-((np.hypot(x, y) - 0.8) / 0.08) ** 2)
    eyes = (np.exp(-(((x + 0.35) ** 2 + (y + 0.3) ** 2) / 0.02))
            + np.exp(-(((x - 0.35) ** 2 + (y + 0.3) ** 2) / 0.02)))
    r = np.hypot(x, y - 0.15)
    mouth = np.exp(-((r - 0.45) / 0.06) ** 2) * (y > 0.25)
    return face + eyes + mouth


def main():
    p = base_parser(__doc__, iters=2000, lr=1e-3, num_samples=512)
    p.add_argument("--image", type=str, default=None,
                   help="path to a grayscale image (defaults to procedural)")
    args = p.parse_args()
    key, k0 = jax.random.split(jax.random.PRNGKey(args.seed))

    if args.image:
        import matplotlib.pyplot as plt
        img = 1.0 - plt.imread(args.image)[:, :, 0]
    else:
        img = procedural_image()
    target = ImagePrior.create(img)
    model = models.build_realnvp(k0, dim=2, K=16, hidden=[64, 64],
                                 target=target)

    def loss(model, key, it):
        x = model.p.sample(key, args.num_samples)
        return model.forward_kld(x)

    model, _ = train(model, loss, args)
    if args.plot:
        plot_density(model.log_prob, out_path("image_model.png"),
                     title="Real NVP fit of image density")
        plot_density(target.log_prob, out_path("image_target.png"),
                     title="image target")


if __name__ == "__main__":
    main()
