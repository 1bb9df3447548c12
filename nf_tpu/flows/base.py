"""Flow layer contract and structural combinators.

Mirrors the capability of the reference ``normflows/flows/base.py:5-81``
(``Flow``/``Reverse``/``Composite``) in functional form: every layer is an
immutable pytree with pure ``forward``/``inverse`` methods returning
``(z', log_det)``.  The extra :class:`Scanned` combinator is TPU-specific — it
stacks K structurally identical layers and runs them under ``jax.lax.scan`` so
XLA compiles one layer body instead of K unrolled copies (faster compilation,
identical math).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..utils.module import Module, static_field


def zero_log_det_like_z(z):
    """Per-sample zero log-det (reference ``flows/base.py:81``)."""
    if isinstance(z, (list, tuple)):
        z = z[0]
    return jnp.zeros(z.shape[0], dtype=z.dtype)


class Flow(Module):
    """Abstract invertible layer.

    ``forward(z) -> (z', log_det)`` maps latent → data direction;
    ``inverse`` is its inverse.  ``log_det`` is the per-sample log absolute
    Jacobian determinant of the applied map.  ``context`` threads conditional
    inputs, ``key`` threads RNG for stochastic (non-bijective) layers.
    """

    def forward(self, z, context=None, key=None):
        raise NotImplementedError("Forward pass has not been implemented.")

    def inverse(self, z, context=None, key=None):
        raise NotImplementedError("This flow has no algebraic inverse.")

    # Data-dependent initialization hooks.  Default: no state to initialize,
    # just apply the transform.  ActNorm and composites override these.
    def init_data_forward(self, z, context=None, key=None):
        z, log_det = self.forward(z, context=context, key=key)
        return self, z, log_det

    def init_data_inverse(self, z, context=None, key=None):
        z, log_det = self.inverse(z, context=context, key=key)
        return self, z, log_det


class Reverse(Flow):
    """Swap a layer's forward and inverse (reference ``flows/base.py:27``)."""

    flow: Flow

    def forward(self, z, context=None, key=None):
        return self.flow.inverse(z, context=context, key=key)

    def inverse(self, z, context=None, key=None):
        return self.flow.forward(z, context=context, key=key)

    def init_data_forward(self, z, context=None, key=None):
        flow, z, log_det = self.flow.init_data_inverse(z, context=context,
                                                       key=key)
        return self.replace(flow=flow), z, log_det

    def init_data_inverse(self, z, context=None, key=None):
        flow, z, log_det = self.flow.init_data_forward(z, context=context,
                                                       key=key)
        return self.replace(flow=flow), z, log_det


def _split_keys(key, n):
    if key is None:
        return [None] * n
    return list(jax.random.split(key, n))


class Composite(Flow):
    """Sequential composition of flows (reference ``flows/base.py:48``)."""

    flows: tuple

    @classmethod
    def create(cls, flows):
        return cls(flows=tuple(flows))

    def forward(self, z, context=None, key=None):
        keys = _split_keys(key, len(self.flows))
        log_det_tot = zero_log_det_like_z(z)
        for flow, k in zip(self.flows, keys):
            z, log_det = flow.forward(z, context=context, key=k)
            log_det_tot = log_det_tot + log_det
        return z, log_det_tot

    def inverse(self, z, context=None, key=None):
        keys = _split_keys(key, len(self.flows))
        log_det_tot = zero_log_det_like_z(z)
        for flow, k in zip(reversed(self.flows), reversed(keys)):
            z, log_det = flow.inverse(z, context=context, key=k)
            log_det_tot = log_det_tot + log_det
        return z, log_det_tot

    def init_data_forward(self, z, context=None, key=None):
        keys = _split_keys(key, len(self.flows))
        log_det_tot = zero_log_det_like_z(z)
        new_flows = []
        for flow, k in zip(self.flows, keys):
            flow, z, log_det = flow.init_data_forward(z, context=context, key=k)
            new_flows.append(flow)
            log_det_tot = log_det_tot + log_det
        return self.replace(flows=tuple(new_flows)), z, log_det_tot

    def init_data_inverse(self, z, context=None, key=None):
        keys = _split_keys(key, len(self.flows))
        log_det_tot = zero_log_det_like_z(z)
        new_flows = []
        for flow, k in zip(reversed(self.flows), reversed(keys)):
            flow, z, log_det = flow.init_data_inverse(z, context=context, key=k)
            new_flows.append(flow)
            log_det_tot = log_det_tot + log_det
        return self.replace(flows=tuple(reversed(new_flows))), z, log_det_tot


class Scanned(Flow):
    """K structurally identical layers executed with ``lax.scan``.

    TPU-first replacement for a Python list of layers: the stacked parameters
    live in one pytree whose leaves have a leading ``K`` axis, and XLA traces
    a single layer body.  All layers must share treedef and static config.
    """

    stacked: Flow  # leaves carry a leading K axis
    num_layers: int = static_field()
    remat: bool = static_field(default=False)

    @classmethod
    def create(cls, flows, remat=False):
        """``remat=True`` wraps the scan body in ``jax.checkpoint`` so
        activations of the K layers are recomputed in the backward pass
        instead of held in HBM — the memory lever for deep stacks."""
        flows = list(flows)
        treedefs = {jax.tree_util.tree_structure(f) for f in flows}
        if len(treedefs) != 1:
            raise ValueError("Scanned requires structurally identical flows.")
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *flows)
        return cls(stacked=stacked, num_layers=len(flows), remat=remat)

    def _scan(self, z, context, key, inverse):
        leaves, treedef = jax.tree_util.tree_flatten(self.stacked)
        keys = (
            jax.random.split(key, self.num_layers)
            if key is not None
            else jnp.zeros((self.num_layers, 2), dtype=jnp.uint32)
        )
        use_key = key is not None

        def body(carry, xs):
            z, log_det_tot = carry
            layer_leaves, k = xs
            layer = jax.tree_util.tree_unflatten(treedef, layer_leaves)
            kk = k if use_key else None
            if inverse:
                z, log_det = layer.inverse(z, context=context, key=kk)
            else:
                z, log_det = layer.forward(z, context=context, key=kk)
            return (z, log_det_tot + log_det), None

        if inverse:
            leaves = [jnp.flip(l, axis=0) for l in leaves]
            keys = jnp.flip(keys, axis=0)
        if self.remat:
            body = jax.checkpoint(body)
        init = (z, zero_log_det_like_z(z))
        (z, log_det), _ = jax.lax.scan(body, init, (leaves, keys))
        return z, log_det

    def forward(self, z, context=None, key=None):
        return self._scan(z, context, key, inverse=False)

    def inverse(self, z, context=None, key=None):
        return self._scan(z, context, key, inverse=True)

    def _unstack(self):
        leaves, treedef = jax.tree_util.tree_flatten(self.stacked)
        return [jax.tree_util.tree_unflatten(treedef, [l[i] for l in leaves])
                for i in range(self.num_layers)], treedef

    def _init_data(self, z, context, key, inverse):
        """Data-dependent init is a one-time eager pre-pass, so unrolling
        the K layers in Python here is fine (the compiled path stays a
        scan)."""
        layers, _ = self._unstack()
        keys = _split_keys(key, self.num_layers)
        total = zero_log_det_like_z(z)
        order = (reversed(range(self.num_layers)) if inverse
                 else range(self.num_layers))
        for i in order:
            k = keys[i]
            if inverse:
                layers[i], z, ld = layers[i].init_data_inverse(
                    z, context=context, key=k)
            else:
                layers[i], z, ld = layers[i].init_data_forward(
                    z, context=context, key=k)
            total = total + ld
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
        return self.replace(stacked=stacked), z, total

    def init_data_forward(self, z, context=None, key=None):
        return self._init_data(z, context, key, inverse=False)

    def init_data_inverse(self, z, context=None, key=None):
        return self._init_data(z, context, key, inverse=True)
