"""Functional pytree module system — the foundation of nf_tpu.

The reference framework (normflows) builds on ``torch.nn.Module`` with mutable
parameters and buffers (see reference ``normflows/flows/base.py:5``).  On TPU we
want every model to be a *pure pytree of arrays* so that it can be passed
through ``jax.jit`` / ``jax.grad`` / ``pjit`` and sharded with
``jax.sharding.NamedSharding``.  This module implements a minimal, dependency
free "module = frozen dataclass registered as a pytree" system:

* dynamic fields (default): pytree children — arrays, sub-modules, lists, ...
* ``static_field()``: compile-time constants (ints, strings, callables) that
  become part of the pytree treedef (must be hashable),
* ``buffer_field()``: non-trainable arrays (masks, permutations, running
  stats).  They travel with the pytree (device placement, serialization) but
  are excluded from gradients by :func:`partition`.

Training code uses the equinox-style filtered transform pattern::

    params, static = partition(model)
    grads = jax.grad(lambda p: loss(combine(p, static)))(params)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_STATIC_KEY = "nf_static"
_BUFFER_KEY = "nf_buffer"


def static_field(**kwargs):
    """A field holding compile-time configuration (part of the treedef)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def buffer_field(**kwargs):
    """A field holding non-trainable array state (excluded from gradients)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_BUFFER_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


class Module:
    """Base class: subclasses become frozen dataclasses registered as pytrees."""

    _nf_dynamic: tuple = ()
    _nf_static: tuple = ()
    _nf_buffers: frozenset = frozenset()

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)
        dynamic, static = [], []
        buffers = set()
        for f in dataclasses.fields(cls):
            if f.metadata.get(_STATIC_KEY, False):
                static.append(f.name)
            else:
                dynamic.append(f.name)
                if f.metadata.get(_BUFFER_KEY, False):
                    buffers.add(f.name)
        cls._nf_dynamic = tuple(dynamic)
        cls._nf_static = tuple(static)
        cls._nf_buffers = frozenset(buffers)

        def flatten_with_keys(obj):
            children = [
                (jax.tree_util.GetAttrKey(name), getattr(obj, name))
                for name in cls._nf_dynamic
            ]
            aux = tuple(getattr(obj, name) for name in cls._nf_static)
            return children, aux

        def flatten(obj):
            children = [getattr(obj, name) for name in cls._nf_dynamic]
            aux = tuple(getattr(obj, name) for name in cls._nf_static)
            return children, aux

        def unflatten(aux, children):
            obj = object.__new__(cls)
            for name, value in zip(cls._nf_dynamic, children):
                object.__setattr__(obj, name, value)
            for name, value in zip(cls._nf_static, aux):
                object.__setattr__(obj, name, value)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

    def replace(self, **updates) -> "Module":
        """Functional field update (out-of-place)."""
        return dataclasses.replace(self, **updates)

    def save(self, path):
        """Serialize all array leaves to an ``.npz`` (reference
        ``core.py:199-205`` ``save``; structure comes from the code on
        load)."""
        from .serialization import save as _save

        _save(path, self)

    def load(self, path):
        """Return a copy with arrays loaded from ``path`` (reference
        ``core.py:207-213`` ``load``; ``self`` is the structure
        template)."""
        from .serialization import load as _load

        return _load(path, self)

    def __repr__(self):
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                parts.append(f"{f.name}=Array{tuple(v.shape)}:{v.dtype}")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(parts)})"


def is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def is_inexact_array(x) -> bool:
    return is_array(x) and jnp.issubdtype(x.dtype, jnp.inexact)


def _none_tree(tree):
    return jax.tree_util.tree_map(lambda _: None, tree)


def _rebuild_seq(tree, items):
    """Reconstruct a list/tuple (incl. namedtuples, which need *args)."""
    ctor = type(tree)
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):
        return ctor(*items)
    return ctor(items)


def _check_opaque_leaf(tree, fn_name):
    """A non-container leaf holding arrays inside a registered pytree would
    silently land wholesale on the static side and freeze its parameters;
    refuse instead of corrupting."""
    if is_array(tree):
        return
    try:
        leaves = jax.tree_util.tree_leaves(tree)
    except Exception:
        return
    if any(is_array(l) for l in leaves if l is not tree):
        raise TypeError(
            f"{fn_name} reached a non-Module pytree container "
            f"{type(tree).__name__!r} holding arrays; wrap it in a Module "
            "or use list/tuple/dict so its parameters are split correctly.")


def partition(tree, is_trainable=is_inexact_array):
    """Split ``tree`` into (trainable params, everything else).

    Both returned trees have the *same structure* as the input; positions are
    filled with ``None`` on the side they don't belong to.  Buffer fields
    (declared with :func:`buffer_field`) land wholesale on the static side.
    Reunite with :func:`combine`.
    """
    if isinstance(tree, Module):
        p_updates, s_updates = {}, {}
        for name in tree._nf_dynamic:
            val = getattr(tree, name)
            if name in tree._nf_buffers:
                p, s = _none_tree(val), val
            else:
                p, s = partition(val, is_trainable)
            p_updates[name] = p
            s_updates[name] = s
        return tree.replace(**p_updates), tree.replace(**s_updates)
    elif isinstance(tree, (list, tuple)):
        pairs = [partition(v, is_trainable) for v in tree]
        return (_rebuild_seq(tree, [p for p, _ in pairs]),
                _rebuild_seq(tree, [s for _, s in pairs]))
    elif isinstance(tree, dict):
        pairs = {k: partition(v, is_trainable) for k, v in tree.items()}
        return {k: p for k, (p, _) in pairs.items()}, {
            k: s for k, (_, s) in pairs.items()
        }
    elif tree is None:
        return None, None
    elif is_trainable(tree):
        return tree, None
    else:
        _check_opaque_leaf(tree, "partition")
        return None, tree


def partition_arrays(tree):
    """Split ``tree`` into (all array leaves, non-array remainder).

    Unlike :func:`partition`, buffer fields land on the ARRAY side — this is
    how training steps thread buffer state (spectral-norm u/v, ActNorm
    statistics) through jit instead of losing in-step updates to the baked
    static closure. Reunite with nested :func:`combine`:
    ``combine(combine(params, buffers), config)``.
    """
    if isinstance(tree, Module):
        a_up, c_up = {}, {}
        for name in tree._nf_dynamic:
            a, c = partition_arrays(getattr(tree, name))
            a_up[name] = a
            c_up[name] = c
        return tree.replace(**a_up), tree.replace(**c_up)
    elif isinstance(tree, (list, tuple)):
        pairs = [partition_arrays(v) for v in tree]
        return (_rebuild_seq(tree, [a for a, _ in pairs]),
                _rebuild_seq(tree, [c for _, c in pairs]))
    elif isinstance(tree, dict):
        pairs = {k: partition_arrays(v) for k, v in tree.items()}
        return ({k: a for k, (a, _) in pairs.items()},
                {k: c for k, (_, c) in pairs.items()})
    elif tree is None:
        return None, None
    elif is_array(tree):
        return tree, None
    _check_opaque_leaf(tree, "partition_arrays")
    return None, tree


def combine(params, static):
    """Inverse of :func:`partition`: overlay two same-structure trees."""
    return jax.tree_util.tree_map(
        lambda p, s: s if p is None else p,
        params,
        static,
        is_leaf=lambda x: x is None,
    )


def stop_gradient_params(model):
    """Return a copy of ``model`` with gradients blocked through its params.

    Used for sticking-the-landing reverse KLD (reference ``core.py:121-129``
    emulates this with ``set_requires_grad(self, False)``).
    """
    params, static = partition(model)
    params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    return combine(params, static)


def tree_size(tree) -> int:
    """Total number of array elements in the tree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree) if is_array(x))
