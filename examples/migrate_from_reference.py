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
    return model, x_np


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

    ref_model, x_np = train_reference(args.torch_iters, seed=args.seed)
    sd = ref_model.state_dict()

    # --- the npz bridge: the TPU host never needs torch ---
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "realnvp.npz")
        save_state_dict_npz(sd, path)
        model = import_state_dict(build_matching_model(),
                                  load_state_dict_npz(path))
    print(f"imported {len(sd)} checkpoint entries")

    # --- parity check: migrated densities must equal the reference's ---
    # matched arithmetic: the reference evaluates in exact f32 on CPU, so
    # force exact-f32 matmuls here too — under the TPU's DEFAULT matmul
    # precision (bf16 passes) the same weights read ~1e-2 apart after 16
    # layers, which is eval arithmetic, not an import error (measured at
    # the 50k-Glow scale in benchmarks/exp_ckpt_exchange_50k.py)
    import torch

    x_chk = x_np[:256]
    with torch.no_grad():
        lp_ref = ref_model.log_prob(torch.from_numpy(x_chk)).numpy()
    @jax.jit
    def f32_log_prob(xx):
        with jax.default_matmul_precision("float32"):
            return model.log_prob(xx)

    lp_jax = np.asarray(f32_log_prob(jnp.asarray(x_chk)))
    gap = float(np.abs(lp_jax - lp_ref).max())
    print(f"parity: max |log_prob gap| = {gap:.2e} over {len(x_chk)} points")
    assert gap < 1e-3, "migrated densities diverge from the reference"

    # --- continue training on the accelerator from the migrated weights ---
    mesh = make_mesh(("data",))
    opt = optax.adam(args.lr)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt, mesh=mesh,
                                 skip_nonfinite=True)
    data = jnp.asarray(x_np)
    nll0 = nll = None
    for it in range(args.iters):
        batch = shard_batch(mesh, data)
        state, loss = step(state, batch)
        if it == 0:
            nll0 = float(loss)
        nll = loss
    if nll is None:
        print("no accelerator steps requested (--iters 0); migration done")
    else:
        print(f"continued {args.iters} accelerator steps: NLL {nll0:.3f} "
              f"-> {float(nll):.3f} (resumed from the migrated weights)")


if __name__ == "__main__":
    main()
