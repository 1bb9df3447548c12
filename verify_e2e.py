"""End-to-end TPU verification driver (the `/verify` recipe, runnable).

Drives nf_tpu through its public API on the real device, asserting
training convergence and numerical consistency. Sections:

    python verify_e2e.py                # all sections
    python verify_e2e.py realnvp       # mixed-precision RealNVP + spline A/B
    python verify_e2e.py residual      # reverse-KLD residual (implicit VJP)
    python verify_e2e.py data          # input pipeline feeding Glow steps
    python verify_e2e.py image_nsf     # 4D couplings (bin-major feed) A/B

Each section prints `... OK`; non-convergence or mismatch raises.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import nf_tpu.models as models
from nf_tpu.distributions import TwoModes
from nf_tpu.ops import splines
from nf_tpu.utils.module import combine, partition, partition_arrays
from nf_tpu.utils.optim import update_lipschitz
from nf_tpu.utils.profiling import enable_compilation_cache


def check_realnvp_and_spline():
    """Mixed-precision RealNVP reverse-KLD on TwoModes + pallas/dense A/B."""
    key = jax.random.PRNGKey(0)
    model = models.build_realnvp(key, dim=2, K=16, hidden=[64, 64],
                                 target=TwoModes(), mixed_precision=True)
    model = model.init_from_samples(key, 512)
    params, static = partition(model)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: combine(p, static).reverse_kld(key, 1024))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for it in range(400):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    print(f"  realnvp loss {float(loss):+.3f} after 400 iters "
          f"({time.time() - t0:.0f}s incl. compile)", flush=True)
    assert float(loss) < -1.0, f"no convergence: {float(loss)}"

    model = combine(params, static)
    key, sub = jax.random.split(key)
    z, log_q = model.sample(sub, 4096)
    err = float(jnp.max(jnp.abs(model.log_prob(z) - log_q)))
    r = float(jnp.mean(jnp.linalg.norm(z, axis=1)))
    assert err < 0.1, f"sample/log_prob mismatch: {err}"
    assert 1.5 < r < 2.5, f"TwoModes ring radius off: {r}"

    # pallas vs dense at identical params
    key = jax.random.PRNGKey(7)
    nsf = models.build_nsf(key, dim=2, K=4, hidden=64, num_bins=8)
    x = jax.random.normal(key, (8192, 2)) * 2
    a = jax.jit(nsf.log_prob)(x)  # traced with pallas auto-dispatch
    splines.set_pallas_enabled(False)
    b = jax.jit(lambda x: nsf.log_prob(x))(x)
    splines.set_pallas_enabled(True)
    d = float(jnp.max(jnp.abs(a - b)))
    assert d < 5e-4, f"pallas/dense mismatch: {d}"
    print(f"  pallas-vs-dense log_prob max diff {d:.2e}", flush=True)
    print("REALNVP+SPLINE OK", flush=True)


def check_residual_reverse_kld():
    """Residual flow trained by reverse KLD through the implicit-diff
    fixed-point inverse (impossible in the reference)."""
    key = jax.random.PRNGKey(0)
    model = models.build_residual(key, dim=2, K=4, hidden=64,
                                  n_hidden_layers=2, target=TwoModes())
    model = model.init_from_samples(key, 512)
    params, rest = partition(model)
    buffers, config = partition_arrays(rest)  # u/v power-iteration state
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, buffers, opt_state, key):
        def loss_fn(p):
            m = combine(combine(p, buffers), config)
            return m.reverse_kld(key, 512)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # buffers must thread through the step (CLAUDE.md invariant)
        m = update_lipschitz(combine(combine(params, buffers), config), 5)
        p2, r2 = partition(m)
        b2, _ = partition_arrays(r2)
        return p2, b2, opt_state, loss

    losses = []
    t0 = time.time()
    for it in range(300):
        key, sub = jax.random.split(key)
        params, buffers, opt_state, loss = step(params, buffers, opt_state,
                                                sub)
        losses.append(float(loss))
    print(f"  residual reverse-KLD {losses[0]:+.2f} -> {losses[-1]:+.2f} "
          f"({time.time() - t0:.0f}s incl. compile)", flush=True)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) - 0.5
    m = combine(combine(params, buffers), config)
    key, sub = jax.random.split(key)
    z, _ = m.sample(sub, 2048)
    r = float(jnp.mean(jnp.linalg.norm(z, axis=1)))
    assert 1.4 < r < 2.6, f"ring radius off: {r}"
    print("RESIDUAL OK", flush=True)


def check_data_pipeline():
    """ArrayDataset + prefetch_to_device feeding Glow train steps."""
    from nf_tpu.data import ArrayDataset, prefetch_to_device
    from nf_tpu.parallel import init_train_state, make_forward_kld_step

    rng = np.random.default_rng(0)
    x_all = rng.random((512, 3, 32, 32), np.float32) * 0.98 + 0.01
    y_all = rng.integers(0, 10, 512)
    ds = ArrayDataset(x_all, y_all, batch_size=64, shuffle=True)

    key = jax.random.PRNGKey(0)
    model = models.build_glow_multiscale(key, input_shape=(3, 32, 32),
                                         L=2, K=8, hidden_channels=128,
                                         scan=True)
    x0, y0 = next(iter(ds))
    model = model.init_from_data(jnp.asarray(x0), jnp.asarray(y0))
    opt = optax.adamax(1e-3)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt)
    losses = []
    for batch in prefetch_to_device(ds.epochs(3), size=2):
        state, loss = step(state, batch)
        losses.append(loss)
    losses = [float(l) for l in losses]
    assert len(losses) == 24 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    print(f"  {len(losses)} prefetched steps, loss {losses[0]:.1f} -> "
          f"{losses[-1]:.1f}", flush=True)
    print("DATA OK", flush=True)


def check_image_nsf():
    """Image-NSF training through the bin-major spline feed (4D
    couplings), plus a fast-path vs generic-path numerics check."""
    from nf_tpu.parallel import init_train_state, make_forward_kld_step

    key = jax.random.PRNGKey(0)
    model = models.build_image_nsf(key, input_shape=(3, 32, 32), L=2, K=4,
                                   hidden_channels=64)
    x = jax.random.uniform(key, (64, 3, 32, 32), minval=0.01, maxval=0.99)
    model = model.init_from_data(x)
    opt = optax.adam(1e-3)
    state, static = init_train_state(model, opt)
    step = make_forward_kld_step(static, opt)
    losses = []
    for _ in range(12):
        state, loss = step(state, x)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    print(f"  image-NSF 12 steps, loss {losses[0]:.1f} -> {losses[-1]:.1f}",
          flush=True)

    # fast bin-major feed vs generic bin-minor path at identical params
    lp_fast = jax.jit(model.log_prob)(x)
    splines.set_pallas_enabled(False)
    lp_ref = jax.jit(lambda x: model.log_prob(x))(x)
    splines.set_pallas_enabled(True)
    d = float(jnp.max(jnp.abs(lp_fast - lp_ref)))
    rel = d / float(jnp.mean(jnp.abs(lp_ref)))
    # |log p| ~ 3e3 over 3072 dims x 8 couplings: f32 accumulation makes
    # ~1e-1 absolute normal; the relative bound is the meaningful one
    assert rel < 1e-3, f"kmajor pallas vs dense mismatch: {d} ({rel:.1e})"
    print(f"  kmajor-pallas vs dense log_prob: max abs diff {d:.2e} "
          f"(relative {rel:.1e})", flush=True)
    print("IMAGE-NSF OK", flush=True)


def check_nsf2d_bin_major():
    """2D coupled NSF through the bin-major conditioner head (the default):
    trains on-device, and agrees with the feature-major variant at
    permuted-identical parameters (pallas k-major vs generic kernels)."""
    import nf_tpu.flows as nff
    from nf_tpu.compat import _head_to_bin_major

    # layer-level A/B at pallas sizes: same head weights modulo the fixed
    # row permutation must give identical outputs through DIFFERENT kernels
    # (k-major fast feed vs the (N,K) generic feed)
    kwargs = dict(num_input_channels=4, num_blocks=2,
                  num_hidden_channels=32, num_bins=8, tail_bound=3.0)
    a = nff.CoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(3), bin_major_head=True, **kwargs)
    b = nff.CoupledRationalQuadraticSpline.create(
        jax.random.PRNGKey(3), bin_major_head=False, **kwargs)
    head = a.prqct.transform_net.bin_major_head
    rng = np.random.RandomState(0)
    w = rng.randn(*b.prqct.transform_net.final_layer.weight.shape) \
        .astype(np.float32) * 0.3
    bias = rng.randn(*b.prqct.transform_net.final_layer.bias.shape) \
        .astype(np.float32) * 0.3

    def with_head(mod, weight, bias):
        net = mod.prqct.transform_net
        net = net.replace(final_layer=net.final_layer.replace(
            weight=jnp.asarray(weight), bias=jnp.asarray(bias)))
        return mod.replace(prqct=mod.prqct.replace(transform_net=net))

    a = with_head(a, _head_to_bin_major(w, head),
                  _head_to_bin_major(bias, head))
    b = with_head(b, w, bias)
    x = jax.random.normal(jax.random.PRNGKey(4), (4096, 4)) * 2
    # precision-matched: the bin-major arm now routes through the fused
    # head+spline kernel (in-kernel f32 MXU GEMM) while the feature-major
    # arm's head GEMM runs at the TPU's default bf16-pass precision — pin
    # both to exact f32 so the 1e-4 layout-equivalence tolerance holds
    with jax.default_matmul_precision("float32"):
        for direction in ("forward", "inverse"):
            za, lda = jax.jit(getattr(a, direction))(x)
            zb, ldb = jax.jit(getattr(b, direction))(x)
            dz = float(jnp.max(jnp.abs(za - zb)))
            dl = float(jnp.max(jnp.abs(lda - ldb)))
            assert dz < 1e-4 and dl < 1e-3, \
                f"bin-major vs generic {direction}: dz={dz} dl={dl}"
            print(f"  bin-major vs feature-major {direction}: "
                  f"dz {dz:.2e}, dld {dl:.2e}", flush=True)

    # mixed circular/linear tails (the cylinder flagship config) through
    # the same fast feed: per-feature derivative padding in the k-major
    # entry, A/B'd against the feature-major generic path on-device
    ka = nff.CircularAutoregressiveRationalQuadraticSpline.create(
        jax.random.PRNGKey(5), num_input_channels=2, num_blocks=2,
        num_hidden_channels=32, ind_circ=[0], num_bins=8,
        tail_bound=jnp.asarray([np.pi, 3.0]), permute_mask=False,
        bin_major_head=True)
    kb = nff.CircularAutoregressiveRationalQuadraticSpline.create(
        jax.random.PRNGKey(5), num_input_channels=2, num_blocks=2,
        num_hidden_channels=32, ind_circ=[0], num_bins=8,
        tail_bound=jnp.asarray([np.pi, 3.0]), permute_mask=False,
        bin_major_head=False)
    headm = ka.mprqat.autoregressive_net.bin_major_head
    assert headm is not None
    ga, gb = ka.mprqat.autoregressive_net, kb.mprqat.autoregressive_net
    wm = rng.randn(*gb.final_layer.weight.shape).astype(np.float32) * 0.3
    bm = rng.randn(*gb.final_layer.bias.shape).astype(np.float32) * 0.3
    ka = ka.replace(mprqat=ka.mprqat.replace(
        autoregressive_net=ga.replace(final_layer=ga.final_layer.replace(
            weight=jnp.asarray(_head_to_bin_major(wm, headm)),
            bias=jnp.asarray(_head_to_bin_major(bm, headm))))))
    kb = kb.replace(mprqat=kb.mprqat.replace(
        autoregressive_net=gb.replace(final_layer=gb.final_layer.replace(
            weight=jnp.asarray(wm), bias=jnp.asarray(bm)))))
    xc = jax.random.normal(jax.random.PRNGKey(6), (4096, 2)) * 2
    za, lda = jax.jit(ka.forward)(xc)
    zb, ldb = jax.jit(kb.forward)(xc)
    dz = float(jnp.max(jnp.abs(za - zb)))
    dl = float(jnp.max(jnp.abs(lda - ldb)))
    assert dz < 1e-4 and dl < 1e-3, f"mixed-tails AR: dz={dz} dl={dl}"
    print(f"  mixed-tails circular AR bin-major vs generic: dz {dz:.2e}, "
          f"dld {dl:.2e}", flush=True)

    # affine MAF through the param-major head: scale/shift as contiguous
    # (D, B) planes vs the feature-major stride-2 layout, on-device
    ma = nff.MaskedAffineAutoregressive.create(
        jax.random.PRNGKey(7), features=4, hidden_features=32,
        num_blocks=2, bin_major_head=True)
    mb = nff.MaskedAffineAutoregressive.create(
        jax.random.PRNGKey(7), features=4, hidden_features=32,
        num_blocks=2, bin_major_head=False)
    headf = ma.autoregressive_net.bin_major_head
    ga, gb = ma.autoregressive_net, mb.autoregressive_net
    wf = rng.randn(*gb.final_layer.weight.shape).astype(np.float32) * 0.3
    bf = rng.randn(*gb.final_layer.bias.shape).astype(np.float32) * 0.3
    ma = ma.replace(autoregressive_net=ga.replace(
        final_layer=ga.final_layer.replace(
            weight=jnp.asarray(_head_to_bin_major(wf, headf)),
            bias=jnp.asarray(_head_to_bin_major(bf, headf)))))
    mb = mb.replace(autoregressive_net=gb.replace(
        final_layer=gb.final_layer.replace(
            weight=jnp.asarray(wf), bias=jnp.asarray(bf))))
    xm = jax.random.normal(jax.random.PRNGKey(8), (4096, 4))
    for direction in ("forward", "inverse"):
        za, lda = jax.jit(getattr(ma, direction))(xm)
        zb, ldb = jax.jit(getattr(mb, direction))(xm)
        dz = float(jnp.max(jnp.abs(za - zb)))
        dl = float(jnp.max(jnp.abs(lda - ldb)))
        assert dz < 1e-4 and dl < 1e-3, \
            f"MAF bin-major vs generic {direction}: dz={dz} dl={dl}"
        print(f"  affine MAF bin-major vs feature-major {direction}: "
              f"dz {dz:.2e}, dld {dl:.2e}", flush=True)

    # end-to-end: forward-KLD training through the fast feed
    key = jax.random.PRNGKey(0)
    model = models.build_nsf(key, dim=2, K=4, hidden=64, num_bins=8)
    from nf_tpu.distributions import TwoMoons
    tm = TwoMoons()
    x_tr = tm.sample(jax.random.PRNGKey(1), 4096)
    params, static = partition(model)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        loss, grads = jax.value_and_grad(
            lambda p: combine(p, static).forward_kld(x))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for it in range(300):
        params, opt_state, loss = step(params, opt_state, x_tr)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0] - 0.5, \
        f"2D NSF no convergence: {losses[0]:.2f} -> {losses[-1]:.2f}"
    print(f"  2D NSF forward-KLD {losses[0]:.2f} -> {losses[-1]:.2f} "
          "(bin-major default)", flush=True)
    print("NSF2D BIN-MAJOR OK", flush=True)


def check_serving():
    """AOT serving path: class-cond sampler + bucketed ragged log_prob."""
    import numpy as np

    import nf_tpu.models as models
    from nf_tpu.serving import compile_log_prob_buckets, compile_sampler

    key = jax.random.PRNGKey(0)
    model = models.build_glow_multiscale(
        key, input_shape=(3, 8, 8), L=1, K=2, hidden_channels=16,
        class_cond=True, num_classes=4)
    x0 = jax.random.uniform(key, (8, 3, 8, 8), minval=0.1, maxval=0.9)
    y0 = jnp.arange(8, dtype=jnp.int32) % 4
    model = model.init_from_data(x0, y0)

    sampler = compile_sampler(model, num_samples=8, class_cond=True,
                              temperature=0.7)
    z, log_q = sampler(jax.random.PRNGKey(1), y0)
    assert bool(jnp.isfinite(z).all()) and bool(jnp.isfinite(log_q).all())

    served = compile_log_prob_buckets(model, max_batch=8,
                                      feature_shape=(3, 8, 8),
                                      class_cond=True, buckets=(4, 8))
    for n in (3, 8):
        got = np.asarray(served(x0[:n], y0[:n]))
        want = np.asarray(model.log_prob(x0[:n], y0[:n]))
        err = float(np.max(np.abs(got - want)))
        assert err < 1e-3, err
    print(f"  class-cond sampler + bucketed ragged log_prob agree "
          f"(max err {err:.1e})", flush=True)
    print("SERVING OK", flush=True)


def check_compat():
    """Checkpoint migration: torch-reference weights -> nf_tpu model on the
    live backend, density parity, then one training step from the migrated
    weights."""
    import os
    import sys as _sys

    import numpy as np

    if not os.path.isdir("/root/reference"):
        print("COMPAT SKIPPED (no reference checkout)", flush=True)
        return
    _sys.path.insert(0, "/root/reference")
    import normflows as nf
    import torch

    import nf_tpu
    import nf_tpu.distributions as dist
    import nf_tpu.flows as nff
    from nf_tpu.compat import import_state_dict
    from nf_tpu.nets import MLP
    from nf_tpu.utils.module import combine, partition

    torch.manual_seed(0)
    K = 4
    flows_r, flows_j = [], []
    keys = jax.random.split(jax.random.PRNGKey(0), 2 * K)
    for i in range(K):
        b = [float((j + i) % 2) for j in range(2)]
        flows_r.append(nf.flows.MaskedAffineFlow(
            torch.tensor(b), t=nf.nets.MLP([2, 32, 2], init_zeros=True),
            s=nf.nets.MLP([2, 32, 2], init_zeros=True)))
        flows_r.append(nf.flows.ActNorm(2))
        flows_j.append(nff.MaskedAffineFlow.create(
            jnp.array(b), t=MLP.create(keys[2 * i], [2, 32, 2],
                                       init_zeros=True),
            s=MLP.create(keys[2 * i + 1], [2, 32, 2], init_zeros=True)))
        flows_j.append(nff.ActNorm.create(2))
    ref = nf.NormalizingFlow(nf.distributions.DiagGaussian(2), flows_r)
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(0.2 * torch.randn(p.shape, generator=g))
        for name, buf in ref.named_buffers():
            if name.endswith("data_dep_init_done"):
                buf.fill_(1.0)
    ours = nf_tpu.NormalizingFlow.create(
        dist.DiagGaussian.create(2), flows_j, p=dist.TwoModes())
    model = import_state_dict(ours, ref.state_dict())

    x = np.random.default_rng(0).normal(size=(64, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref.log_prob(torch.from_numpy(x)).numpy()
    # precision-matched parity: the TPU's default matmul precision (bf16
    # passes) drifts ~0.05 from the reference's exact-f32 CPU arithmetic
    # over 4 MLP couplings; cross-framework weight-copy checks compare in
    # exact f32 (same policy as the 50k A/B, docs/accuracy.md)
    with jax.default_matmul_precision("float32"):
        got = np.asarray(model.log_prob(jnp.asarray(x)))
    gap = float(np.abs(got - want).max())
    assert gap < 1e-3, gap
    print(f"  migrated log_prob parity: max gap {gap:.1e}", flush=True)

    import optax

    params, static = partition(model)
    opt = optax.adam(1e-3)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(
            lambda q: combine(q, static).forward_kld(jnp.asarray(x)))(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params, opt_state, loss = step(params, opt.init(params))
    assert bool(jnp.isfinite(loss)), float(loss)
    print("COMPAT OK", flush=True)


def check_export():
    """Serialized StableHLO artifact: export -> reload -> same densities."""
    import numpy as np

    import nf_tpu.models as models
    from nf_tpu.serving import export_log_prob, load_exported

    key = jax.random.PRNGKey(2)
    model = models.build_realnvp(key, dim=2, K=4, hidden=[16, 16])
    x = jax.random.normal(key, (32, 2))
    fn = load_exported(export_log_prob(model, (32, 2)))
    err = float(jnp.max(jnp.abs(fn(x) - model.log_prob(x))))
    assert err < 1e-4, err
    print(f"  StableHLO artifact reload parity: max err {err:.1e}",
          flush=True)
    print("EXPORT OK", flush=True)


SECTIONS = {
    "realnvp": check_realnvp_and_spline,
    "residual": check_residual_reverse_kld,
    "data": check_data_pipeline,
    "image_nsf": check_image_nsf,
    "nsf2d": check_nsf2d_bin_major,
    "serving": check_serving,
    "compat": check_compat,
    "export": check_export,
}


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    names = sys.argv[1:] or list(SECTIONS)
    for n in names:
        if n not in SECTIONS:
            raise SystemExit(
                f"unknown section {n!r}; valid: {', '.join(SECTIONS)}")
        SECTIONS[n]()
    print("VERIFY E2E OK", flush=True)


if __name__ == "__main__":
    main()
