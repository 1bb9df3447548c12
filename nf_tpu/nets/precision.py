"""Mixed-precision conditioner wrapper (TPU bf16 compute path).

The reference package runs everything in one dtype (typically f32/f64 eager
torch). On TPU the right split is different: conditioner networks (MLP /
ConvNet2d / ResidualNet / MADE matmuls and convs) carry nearly all of the
FLOPs and map onto the MXU, which runs bfloat16 at twice the f32 rate — while
the *flow-level* math (affine/spline transforms and especially the log-det
accumulation) is numerically delicate and must stay in f32.

:class:`MixedPrecision` implements exactly that boundary: parameters are
stored (and optimized) in f32, cast to ``compute_dtype`` together with the
inputs for the wrapped net's forward pass, and the outputs are cast back to
the caller's dtype. The casts are free at the XLA level (fused into the
adjacent matmuls); gradients flow through them, so the optimizer sees f32
master weights — the standard mixed-precision recipe.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..utils.module import Module, is_inexact_array, static_field


def _cast_floats(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if is_inexact_array(x) else x, tree)


class MixedPrecision(Module):
    """Run a conditioner net in ``compute_dtype``, keeping f32 outside.

    Wraps any pytree-module net with signature ``net(x, *args, **kwargs)``.
    Float array arguments and the net's own float parameters are cast to
    ``compute_dtype`` (bfloat16 by default — MXU-native); float outputs are
    cast back to the dtype of the primary input so flow-level log-det math
    stays in full precision. Non-float arguments (PRNG keys, int masks)
    pass through untouched.
    """

    net: Any
    compute_dtype: Any = static_field(default=jnp.bfloat16)

    def __getattr__(self, name):
        # Delegate attribute reads (e.g. ``hidden_features``, inspected by
        # PiecewiseRationalQuadraticCoupling.create) to the wrapped net.
        if name.startswith("_") or name in ("net", "compute_dtype"):
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "net"), name)

    def __call__(self, x, *args, **kwargs):
        out_dtype = (x.dtype if is_inexact_array(x) else jnp.float32)
        net = _cast_floats(self.net, self.compute_dtype)
        x = _cast_floats(x, self.compute_dtype)
        args = _cast_floats(args, self.compute_dtype)
        kwargs = {k: _cast_floats(v, self.compute_dtype)
                  for k, v in kwargs.items()}
        out = net(x, *args, **kwargs)
        return _cast_floats(out, out_dtype)
