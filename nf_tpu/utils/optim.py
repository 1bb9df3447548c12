"""Training helpers (reference ``normflows/utils/optim.py``).

``set_requires_grad``/``clear_grad`` have no functional analogue (use
``stop_gradient_params`` / fresh grads are free in JAX); ``update_lipschitz``
becomes a pytree traversal that returns a new model with the power iteration
advanced on every spectrally normalized layer.
"""

from __future__ import annotations

import jax

from ..nets.lipschitz import InducedNormConv2d, InducedNormLinear
from .module import Module


def update_lipschitz(model, n_iterations=5):
    """Advance spectral-norm power iterations on every InducedNorm layer
    (reference ``optim.py:28-31``); returns the updated model.

    Handles layers inside ``flows.Scanned`` stacks by unstacking the
    leading K axis, updating each layer, and restacking."""
    import jax.numpy as jnp

    from ..flows.base import Scanned

    def walk(node):
        if isinstance(node, (InducedNormLinear, InducedNormConv2d)):
            return node.update_power_iteration(n_iterations)
        if isinstance(node, Scanned):
            layers, _ = node._unstack()
            layers = [walk(l) for l in layers]
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *layers)
            return node.replace(stacked=stacked)
        if isinstance(node, Module):
            return node.replace(**{
                name: walk(getattr(node, name)) for name in node._nf_dynamic})
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(model)


def lipschitz_scales(model):
    """Collect the current sigma estimate of every InducedNorm layer
    (diagnostic)."""
    from ..flows.base import Scanned

    scales = []

    def walk(node):
        if isinstance(node, (InducedNormLinear, InducedNormConv2d)):
            scales.append(node.scale)
        elif isinstance(node, Scanned):
            for l in node._unstack()[0]:
                walk(l)
        elif isinstance(node, Module):
            for name in node._nf_dynamic:
                walk(getattr(node, name))
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)

    walk(model)
    return scales


def map_modules(model, match, fn):
    """Return a copy of ``model`` with ``fn`` applied to every submodule
    instance of type ``match`` (generic functional analogue of iterating
    ``nn.Module.modules()``). Descends into ``flows.Scanned`` stacks."""
    import jax.numpy as jnp

    from ..flows.base import Scanned

    def walk(node):
        if isinstance(node, match):
            return fn(node)
        if isinstance(node, Scanned):
            layers = [walk(l) for l in node._unstack()[0]]
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *layers)
            return node.replace(stacked=stacked)
        if isinstance(node, Module):
            return node.replace(**{
                name: walk(getattr(node, name)) for name in node._nf_dynamic})
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(model)
