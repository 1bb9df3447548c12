"""Affine flow layers: constant, class-conditional, coupling, masked coupling.

Capability parity with reference ``normflows/flows/affine/coupling.py``
(AffineConstFlow:9, CCAffineConst:57, AffineCoupling:99, MaskedAffineFlow:174,
AffineCouplingBlock:232).  All transforms are elementwise around conditioner
nets, so XLA fuses the scale/shift/log-det chain into the conditioner's last
matmul — the TPU equivalent of the reference's eager op sequence.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, buffer_field, static_field
from ..utils.nn import sum_except_batch
from .base import Flow, zero_log_det_like_z
from .reshape import Merge, Split


class AffineConstFlow(Flow):
    """Learned constant scale/shift per dimension (NICE scaling layer;
    reference ``flows/affine/coupling.py:9-54``).

    ``s``/``t`` have shape (1, *event_shape) possibly with broadcast axes of
    size 1 (e.g. (1, C, 1, 1) for ActNorm on images); the log-det multiplies
    by the number of broadcast positions.
    """

    s: Optional[jax.Array]  # None = no (trainable) scaling
    t: Optional[jax.Array]  # None = no (trainable) shift
    scale: bool = static_field(default=True)
    shift: bool = static_field(default=True)
    _shape: tuple = static_field(default=())

    @classmethod
    def create(cls, shape, scale=True, shift=True, dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        # a disabled flag stores None so partition() never trains the
        # parameter (reference register_buffer's it, ``coupling.py:24-31``)
        s = jnp.zeros((1,) + shape, dtype) if scale else None
        t = jnp.zeros((1,) + shape, dtype) if shift else None
        return cls(s=s, t=t, scale=scale, shift=shift, _shape=shape)

    @property
    def _s(self):
        return self.s if self.s is not None else jnp.zeros(
            (1,) + self._shape)

    @property
    def _t(self):
        return self.t if self.t is not None else 0.0

    def _num_broadcast(self, z):
        # product of z-dims where the parameter has a broadcast (size-1) axis
        n = 1
        s = self._s
        for i in range(1, z.ndim):
            if s.shape[i] == 1:
                n *= z.shape[i]
        return n

    def forward(self, z, context=None, key=None):
        s = self._s
        z_ = z * jnp.exp(s) + self._t
        log_det = self._num_broadcast(z) * jnp.sum(s)
        return z_, jnp.broadcast_to(log_det, (z.shape[0],)).astype(z.dtype)

    def inverse(self, z, context=None, key=None):
        s = self._s
        z_ = (z - self._t) * jnp.exp(-s)
        log_det = -self._num_broadcast(z) * jnp.sum(s)
        return z_, jnp.broadcast_to(log_det, (z.shape[0],)).astype(z.dtype)


class CCAffineConst(Flow):
    """Class-conditional affine constant flow
    (reference ``flows/affine/coupling.py:57-96``).  ``y`` is one-hot
    (batch, num_classes) or integer labels."""

    s: jax.Array
    t: jax.Array
    s_cc: jax.Array
    t_cc: jax.Array
    shape: tuple = static_field()
    num_classes: int = static_field()

    @classmethod
    def create(cls, shape, num_classes, dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        d = int(np.prod(shape))
        return cls(
            s=jnp.zeros((1,) + shape, dtype),
            t=jnp.zeros((1,) + shape, dtype),
            s_cc=jnp.zeros((num_classes, d), dtype),
            t_cc=jnp.zeros((num_classes, d), dtype),
            shape=shape,
            num_classes=num_classes,
        )

    def _params(self, y, batch):
        if y.ndim == 1:
            y = jax.nn.one_hot(y, self.num_classes, dtype=self.s.dtype)
        s = self.s + (y @ self.s_cc).reshape((-1,) + self.shape)
        t = self.t + (y @ self.t_cc).reshape((-1,) + self.shape)
        return s, t

    def forward(self, z, context=None, key=None, y=None):
        y = context if y is None else y
        s, t = self._params(y, z.shape[0])
        z_ = z * jnp.exp(s) + t
        nb = 1
        for i in range(1, z.ndim):
            if self.s.shape[i] == 1:
                nb *= z.shape[i]
        log_det = nb * sum_except_batch(s)
        return z_, log_det

    def inverse(self, z, context=None, key=None, y=None):
        y = context if y is None else y
        s, t = self._params(y, z.shape[0])
        z_ = (z - t) * jnp.exp(-s)
        nb = 1
        for i in range(1, z.ndim):
            if self.s.shape[i] == 1:
                nb *= z.shape[i]
        log_det = -nb * sum_except_batch(s)
        return z_, log_det


def _coupling_params(param, scale):
    """Split conditioner output into interleaved (shift, scale) channels,
    matching reference ``coupling.py:129-130``."""
    if scale:
        shift = param[:, 0::2, ...]
        scale_ = param[:, 1::2, ...]
        return shift, scale_
    return param, None


class AffineCoupling(Flow):
    """RealNVP/Glow affine coupling on a pre-split pair ``[z1, z2]``
    (reference ``flows/affine/coupling.py:99-171``).

    scale_map: 'exp' (RealNVP), 'sigmoid' (Glow, divides by sigma(s+2) in the
    forward direction), 'sigmoid_inv' (multiplies in the forward direction).
    """

    param_map: Any
    scale: bool = static_field(default=True)
    scale_map: str = static_field(default="exp")

    @classmethod
    def create(cls, param_map, scale=True, scale_map="exp"):
        return cls(param_map=param_map, scale=scale, scale_map=scale_map)

    def forward(self, z, context=None, key=None):
        z1, z2 = z
        param = self.param_map(z1)
        if self.scale:
            shift, scale_ = _coupling_params(param, True)
            if self.scale_map == "exp":
                z2 = z2 * jnp.exp(scale_) + shift
                log_det = sum_except_batch(scale_)
            elif self.scale_map == "sigmoid":
                sig = jax.nn.sigmoid(scale_ + 2)
                z2 = z2 / sig + shift
                log_det = -sum_except_batch(jnp.log(sig))
            elif self.scale_map == "sigmoid_inv":
                sig = jax.nn.sigmoid(scale_ + 2)
                z2 = z2 * sig + shift
                log_det = sum_except_batch(jnp.log(sig))
            else:
                raise NotImplementedError("This scale map is not implemented.")
        else:
            z2 = z2 + param
            log_det = zero_log_det_like_z(z2)
        return [z1, z2], log_det

    def inverse(self, z, context=None, key=None):
        z1, z2 = z
        param = self.param_map(z1)
        if self.scale:
            shift, scale_ = _coupling_params(param, True)
            if self.scale_map == "exp":
                z2 = (z2 - shift) * jnp.exp(-scale_)
                log_det = -sum_except_batch(scale_)
            elif self.scale_map == "sigmoid":
                sig = jax.nn.sigmoid(scale_ + 2)
                z2 = (z2 - shift) * sig
                log_det = sum_except_batch(jnp.log(sig))
            elif self.scale_map == "sigmoid_inv":
                sig = jax.nn.sigmoid(scale_ + 2)
                z2 = (z2 - shift) / sig
                log_det = -sum_except_batch(jnp.log(sig))
            else:
                raise NotImplementedError("This scale map is not implemented.")
        else:
            z2 = z2 - param
            log_det = zero_log_det_like_z(z2)
        return [z1, z2], log_det


class MaskedAffineFlow(Flow):
    """RealNVP masked coupling ``f(z) = b*z + (1-b)*(z*exp(s(b*z)) + t(b*z))``
    (reference ``flows/affine/coupling.py:174-229``), with the same NaN guard
    on non-finite conditioner outputs."""

    b: jax.Array = buffer_field()
    s: Optional[Any] = None  # scale net (None = no scaling)
    t: Optional[Any] = None  # shift net (None = no shift)

    @classmethod
    def create(cls, b, t=None, s=None):
        b = jnp.asarray(b)
        return cls(b=b[None], s=s, t=t)

    def _nets(self, z_masked):
        if self.s is None:
            scale = jnp.zeros_like(z_masked)
        else:
            scale = self.s(z_masked)
            scale = jnp.where(jnp.isfinite(scale), scale, jnp.nan)
        if self.t is None:
            trans = jnp.zeros_like(z_masked)
        else:
            trans = self.t(z_masked)
            trans = jnp.where(jnp.isfinite(trans), trans, jnp.nan)
        return scale, trans

    def forward(self, z, context=None, key=None):
        z_masked = self.b * z
        scale, trans = self._nets(z_masked)
        z_ = z_masked + (1 - self.b) * (z * jnp.exp(scale) + trans)
        log_det = sum_except_batch((1 - self.b) * scale)
        return z_, log_det

    def inverse(self, z, context=None, key=None):
        z_masked = self.b * z
        scale, trans = self._nets(z_masked)
        z_ = z_masked + (1 - self.b) * (z - trans) * jnp.exp(-scale)
        log_det = -sum_except_batch((1 - self.b) * scale)
        return z_, log_det


class AffineCouplingBlock(Flow):
    """Split -> AffineCoupling -> Merge composite
    (reference ``flows/affine/coupling.py:232-267``)."""

    split: Split
    coupling: AffineCoupling
    merge: Merge

    @classmethod
    def create(cls, param_map, scale=True, scale_map="exp", split_mode="channel"):
        return cls(
            split=Split(mode=split_mode),
            coupling=AffineCoupling.create(param_map, scale, scale_map),
            merge=Merge(mode=split_mode),
        )

    def forward(self, z, context=None, key=None):
        log_det_tot = zero_log_det_like_z(z)
        for flow in (self.split, self.coupling, self.merge):
            z, log_det = flow.forward(z, context=context)
            log_det_tot = log_det_tot + log_det
        return z, log_det_tot

    def inverse(self, z, context=None, key=None):
        log_det_tot = zero_log_det_like_z(z)
        for flow in (self.merge, self.coupling, self.split):
            z, log_det = flow.inverse(z, context=context)
            log_det_tot = log_det_tot + log_det
        return z, log_det_tot
