"""Multi-chip sharded training demo — the TPU-native capability the
reference lacks entirely (SURVEY.md §2.6): data-parallel forward KLD and
sample-parallel reverse KLD over a jax.sharding.Mesh.

On a single-chip host, run with a virtual CPU mesh:
    python examples/multichip_training.py --virtual-devices 8
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import argparse
import time


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual-devices", type=int, default=0,
                   help="force an N-device virtual CPU mesh")
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--num-samples", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.virtual_devices:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count"
              f"={args.virtual_devices}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import optax

    import nf_tpu.models as models
    from nf_tpu.distributions import TwoModes
    from nf_tpu.parallel import (
        init_train_state,
        make_forward_kld_step,
        make_mesh,
        make_reverse_kld_step,
        shard_batch,
    )

    devices = jax.devices()
    print(f"{len(devices)} devices: {devices[0].platform}")
    mesh = make_mesh(("data",), devices=devices)

    key = jax.random.PRNGKey(args.seed)
    model = models.build_realnvp(key, dim=2, K=16, hidden=[64, 64],
                                 target=TwoModes())
    opt = optax.adam(1e-3)

    # sample-parallel VI: each device draws its own slice of the MC batch
    state, static = init_train_state(model, opt)
    vi_step = make_reverse_kld_step(
        static, opt, mesh, num_samples=args.num_samples,
        beta_schedule=lambda step: jnp.minimum(
            1.0, 0.01 + step / max(1, args.iters // 2)))
    t0 = time.time()
    for it in range(args.iters):
        key, sub = jax.random.split(key)
        state, loss = vi_step(state, sub)
        if it % max(1, args.iters // 5) == 0:
            print(f"[reverse_kld] iter {it:5d} loss {float(loss):+.4f}")
    dt = time.time() - t0
    print(f"sample-parallel VI: {args.iters} steps in {dt:.1f}s, "
          f"{args.iters * args.num_samples / dt:.0f} samples/s")

    # sharded sampling: HAIS chains split over the mesh
    import numpy as np

    from nf_tpu.distributions import DiagGaussian
    from nf_tpu.parallel import log_normalizer, make_sharded_sampler
    from nf_tpu.sampling import HAIS

    hais = HAIS.create(np.linspace(1.0, 0.0, 17),
                       DiagGaussian.create(2, trainable=False),
                       model.p, num_leapfrog=5, step_size=[0.1, 0.1],
                       log_mass=[0.0, 0.0])
    sampler = make_sharded_sampler(mesh, num_samples=args.num_samples)
    key, sub = jax.random.split(key)
    z, log_w = sampler(hais, sub)
    print(f"[hais] {args.num_samples} chains over {len(devices)} devices, "
          f"log Z = {float(log_normalizer(log_w)):+.3f}")

    # data-parallel MLE on rejection-sampled TwoMoons data
    from nf_tpu.distributions import TwoMoons

    data_dist = TwoMoons()
    state2, static2 = init_train_state(model, opt)
    mle_step = make_forward_kld_step(static2, opt, mesh=mesh)
    for it in range(args.iters // 2):
        key, k1, k2 = jax.random.split(key, 3)
        x = shard_batch(mesh, data_dist.sample(k1, args.num_samples))
        state2, loss = mle_step(state2, x)
        if it % max(1, args.iters // 10) == 0:
            print(f"[forward_kld] iter {it:5d} loss {float(loss):+.4f}")

    # host data pipeline -> mesh: batches land pre-sharded over the data
    # axis via the background prefetch thread (nf_tpu.data)
    from nf_tpu.data import ArrayDataset, prefetch_to_device
    from nf_tpu.parallel.mesh import data_sharding

    rng = np.random.default_rng(args.seed)
    n_img = 8 * max(1, len(devices))
    x_all = rng.random((n_img * 4, 3, 8, 8), np.float32) * 0.98 + 0.01
    ds = ArrayDataset(x_all, batch_size=n_img, shuffle=True)
    img_model = models.build_image_nsf(
        jax.random.PRNGKey(1), input_shape=(3, 8, 8), L=1, K=2,
        hidden_channels=16)
    img_model = img_model.init_from_data(jnp.asarray(next(iter(ds))))
    state3, static3 = init_train_state(img_model, opt)
    img_step = make_forward_kld_step(static3, opt, mesh=mesh)
    steps = 0
    for batch in prefetch_to_device(ds.epochs(2), size=2,
                                    sharding=data_sharding(mesh, 4)):
        state3, loss = img_step(state3, batch)
        steps += 1
    print(f"[pipeline] {steps} prefetched sharded image batches, "
          f"last loss {float(loss):.1f}")
    print("done")


if __name__ == "__main__":
    main()
