"""Tests for the pytree module system."""

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu.utils.module import (
    Module, buffer_field, combine, partition, static_field,
)


class Inner(Module):
    w: jax.Array
    name: str = static_field(default="inner")


class Outer(Module):
    inner: Inner
    mask: jax.Array = buffer_field(default=None)
    items: tuple = ()
    n: int = static_field(default=3)


def make():
    inner = Inner(w=jnp.ones((2, 2)))
    return Outer(inner=inner, mask=jnp.zeros(4),
                 items=(jnp.arange(3), jnp.ones(3)))


def test_pytree_roundtrip():
    m = make()
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert m2.n == 3
    np.testing.assert_array_equal(m2.inner.w, m.inner.w)


def test_partition_excludes_buffers_and_ints():
    m = make()
    params, static = partition(m)
    leaves = [x for x in jax.tree_util.tree_leaves(params)]
    # trainable: inner.w and items[1] (float); excluded: mask (buffer),
    # items[0] (int array)
    assert len(leaves) == 2
    m2 = combine(params, static)
    np.testing.assert_array_equal(m2.mask, m.mask)
    np.testing.assert_array_equal(m2.items[0], m.items[0])


def test_grad_through_partition():
    m = make()
    params, static = partition(m)

    def loss(p):
        mm = combine(p, static)
        return jnp.sum(mm.inner.w**2) + jnp.sum(mm.items[1] * 3.0)

    grads = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(grads.inner.w),
                               2 * np.asarray(m.inner.w))
    np.testing.assert_allclose(np.asarray(grads.items[1]), 3.0 * np.ones(3))
    # buffers get no gradient entry
    assert grads.mask is None


def test_jit_with_module_arg():
    m = make()

    @jax.jit
    def f(mod, x):
        return mod.inner.w @ x

    out = f(m, jnp.ones(2))
    np.testing.assert_allclose(np.asarray(out), [2.0, 2.0])


def test_model_save_load_methods(tmp_path):
    """Reference-parity model.save / model.load convenience methods."""
    import jax
    import numpy as np

    import nf_tpu.models as models

    key = jax.random.PRNGKey(0)
    m = models.build_realnvp(key, dim=2, K=2, hidden=[8, 8])
    p = str(tmp_path / "model.npz")
    m.save(p)
    m2 = models.build_realnvp(jax.random.PRNGKey(1), dim=2, K=2,
                              hidden=[8, 8]).load(p)
    x = jax.random.normal(key, (4, 2))
    np.testing.assert_allclose(np.asarray(m2.log_prob(x)),
                               np.asarray(m.log_prob(x)), atol=1e-6)
