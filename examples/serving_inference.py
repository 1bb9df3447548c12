"""Production-style inference: train briefly, then serve with AOT-compiled
executables (nf_tpu.serving) fed by the input pipeline (nf_tpu.data).

    python examples/serving_inference.py [--iters 300]

The serving path compiles `sample` and `log_prob` once for fixed batch
shapes; parameter updates rebind without recompiling (`with_model`), and
XLA's cost analysis reports FLOPs per call for roofline accounting. The
reference has no deployment story (eager PyTorch modules).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu.models as models
from nf_tpu.data import ArrayDataset, prefetch_to_device
from nf_tpu.distributions import TwoMoons
from nf_tpu.serving import compile_log_prob, compile_sampler
from nf_tpu.utils.module import combine, partition

from _utils import base_parser


def main():
    p = base_parser(__doc__, iters=300, lr=3e-3)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--serve-batch", type=int, default=4096)
    args = p.parse_args()
    key = jax.random.PRNGKey(args.seed)

    # --- train a small NSF on TwoMoons data through the input pipeline ---
    key, k_data, k_model = jax.random.split(key, 3)
    x_all = np.asarray(TwoMoons().sample(k_data, 1 << 15))
    ds = ArrayDataset(x_all, batch_size=args.batch, shuffle=True)
    model = models.build_nsf(k_model, dim=2, K=4, hidden=64, num_bins=8)
    params, static = partition(model)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        loss, grads = jax.value_and_grad(
            lambda p: combine(p, static).forward_kld(x))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    it = 0
    for x in prefetch_to_device(ds.epochs(), size=2):
        params, opt_state, loss = step(params, opt_state, x)
        it += 1
        if it >= args.iters:
            break
    model = combine(params, static)
    print(f"trained {it} steps, final NLL {float(loss):.3f}")

    # --- compile the serving executables once ---
    sampler = compile_sampler(model, num_samples=args.serve_batch)
    density = compile_log_prob(model, (args.serve_batch, 2))
    fl = density.flops()
    if fl:
        print(f"log_prob executable: {fl/1e6:.1f} MFLOP/call")

    key, sub = jax.random.split(key)
    z, log_q = sampler(sub)
    lp = density(z)
    err = float(jnp.max(jnp.abs(lp - log_q)))
    print(f"served {args.serve_batch} samples; sample/log_prob max err "
          f"{err:.3f} (trained NSFs have sharp spline bins; ~1 nat max "
          "over 4k samples is the expected f32 tail, see docs/accuracy.md)")

    # --- parameter refresh without recompilation ---
    params2 = jax.tree_util.tree_map(
        lambda a: a * 0.999 if a is not None else None, params,
        is_leaf=lambda v: v is None)
    sampler2 = sampler.with_model(combine(params2, static))
    z2, _ = sampler2(sub)
    print("rebind without recompile:",
          bool(jnp.any(z2 != z)), "(outputs changed)")

    # --- serialized artifact: export, reload, serve without model code ---
    from nf_tpu.serving import export_log_prob, load_exported

    blob = export_log_prob(model, (args.serve_batch, 2))
    reloaded = load_exported(blob)
    err_art = float(jnp.max(jnp.abs(reloaded(z) - lp)))
    print(f"StableHLO artifact: {len(blob)/1e3:.0f} kB, reload max err "
          f"{err_art:.2e} vs the in-process executable")

    # throughput of the compiled sampler (amortized over many calls).
    # Sync EVERY call via a host scalar fetch: on the axon relay
    # block_until_ready can be a no-op for never-fetched buffers and
    # independent unfetched dispatches need never execute (CLAUDE.md), so
    # fetching only the last result would overstate the rate by up to
    # n_calls x. Each call gets a distinct key so the relay's
    # identical-call memoization can't serve cached results.
    float(sampler(sub)[1][0])  # warmup incl. any deferred compile
    t0 = time.perf_counter()
    n_calls = 20
    for i in range(n_calls):
        float(sampler(jax.random.fold_in(sub, i))[1][0])
    dt = (time.perf_counter() - t0) / n_calls
    print(f"compiled sampler: {args.serve_batch/dt:,.0f} samples/s "
          f"({dt*1e3:.2f} ms/call incl. dispatch)")


if __name__ == "__main__":
    main()
