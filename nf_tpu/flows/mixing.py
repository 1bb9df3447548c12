"""Mixing flows: permutations, invertible 1x1 convolutions, LU linear layers.

Capability parity with reference ``normflows/flows/mixing.py`` (Permute:9,
Invertible1x1Conv:57, InvertibleAffine:136, _Permutation:213, _LULinear:368,
LULinearPermute:535).

TPU-first changes vs the reference:
* No float64 inversion islands (reference ``mixing.py:95-115`` inverts W in
  double precision): we default to the LU parameterization, whose inverse is
  two triangular solves in f32 with an O(D) exact log-det.
* The eval-time ``_LinearCache`` (reference ``mixing.py:287-332``) becomes the
  explicit, functional :meth:`LULinear.with_cache` that precomputes the
  assembled weight/inverse/log-det into buffers.
* 1x1 conv runs as a channel einsum so XLA maps it onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import buffer_field, static_field
from .base import Flow


class Permute(Flow):
    """Channel permutation: fixed random shuffle or swap-halves
    (reference ``mixing.py:9-54``)."""

    perm: Optional[jax.Array] = buffer_field(default=None)
    inv_perm: Optional[jax.Array] = buffer_field(default=None)
    num_channels: int = static_field(default=0)
    mode: str = static_field(default="shuffle")

    @classmethod
    def create(cls, key, num_channels, mode="shuffle"):
        perm = inv_perm = None
        if mode == "shuffle":
            perm = jax.random.permutation(key, num_channels)
            inv_perm = jnp.argsort(perm)
        return cls(perm=perm, inv_perm=inv_perm, num_channels=num_channels,
                   mode=mode)

    def forward(self, z, context=None, key=None):
        if self.mode == "shuffle":
            z = jnp.take(z, self.perm, axis=1)
        elif self.mode == "swap":
            z1 = z[:, : self.num_channels // 2, ...]
            z2 = z[:, self.num_channels // 2:, ...]
            z = jnp.concatenate([z2, z1], axis=1)
        else:
            raise NotImplementedError(f"The mode {self.mode} is not implemented.")
        return z, jnp.zeros(z.shape[0], dtype=z.dtype)

    def inverse(self, z, context=None, key=None):
        if self.mode == "shuffle":
            z = jnp.take(z, self.inv_perm, axis=1)
        elif self.mode == "swap":
            z1 = z[:, : (self.num_channels + 1) // 2, ...]
            z2 = z[:, (self.num_channels + 1) // 2:, ...]
            z = jnp.concatenate([z2, z1], axis=1)
        else:
            raise NotImplementedError(f"The mode {self.mode} is not implemented.")
        return z, jnp.zeros(z.shape[0], dtype=z.dtype)


def _random_orthogonal(key, n, dtype=jnp.float32):
    q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n), dtype))
    return q


def _lu_init(key, num_channels, dtype=jnp.float32):
    """LU-decompose a random orthogonal matrix into trainable pieces
    (mirrors reference ``mixing.py:74-84``)."""
    q = _random_orthogonal(key, num_channels, dtype)
    import scipy.linalg  # CPU-side, init-time only

    p, l, u = scipy.linalg.lu(np.asarray(q, dtype=np.float64))
    s = np.diag(u)
    return (
        jnp.asarray(p, dtype),
        jnp.asarray(np.tril(l, -1), dtype),
        jnp.asarray(np.triu(u, 1), dtype),
        jnp.asarray(np.sign(s), dtype),
        jnp.asarray(np.log(np.abs(s)), dtype),
    )


class _LUWeight:
    """Mixin assembling W (or its inverse) from P, L, U, sign_S, log_S."""

    def _assemble_w(self, inverse=False):
        n = self.log_S.shape[0]
        eye = jnp.eye(n, dtype=self.log_S.dtype)
        L = jnp.tril(self.L, -1) + eye
        U = jnp.triu(self.U, 1) + jnp.diag(self.sign_S * jnp.exp(self.log_S))
        if inverse:
            l_inv = jax.scipy.linalg.solve_triangular(L, eye, lower=True,
                                                      unit_diagonal=True)
            u_inv = jax.scipy.linalg.solve_triangular(U, eye, lower=False)
            return u_inv @ l_inv @ self.P.T
        return self.P @ L @ U


class Invertible1x1Conv(Flow, _LUWeight):
    """Glow invertible 1x1 convolution on NCHW tensors
    (reference ``mixing.py:57-133``).  Note the direction convention: the
    *forward* pass applies W^{-1} (sampling direction in Glow), the *inverse*
    applies W — matching the reference exactly.
    """

    W: Optional[jax.Array] = None
    L: Optional[jax.Array] = None
    U: Optional[jax.Array] = None
    log_S: Optional[jax.Array] = None
    P: Optional[jax.Array] = buffer_field(default=None)
    sign_S: Optional[jax.Array] = buffer_field(default=None)
    num_channels: int = static_field(default=0)
    use_lu: bool = static_field(default=False)

    @classmethod
    def create(cls, key, num_channels, use_lu=False, dtype=jnp.float32):
        if use_lu:
            p, l, u, sign_s, log_s = _lu_init(key, num_channels, dtype)
            return cls(P=p, L=l, U=u, sign_S=sign_s, log_S=log_s,
                       num_channels=num_channels, use_lu=True)
        w = _random_orthogonal(key, num_channels, dtype)
        return cls(W=w, num_channels=num_channels, use_lu=False)

    def _apply(self, z, w):
        # 1x1 conv == channel mixing matmul; runs on the MXU
        return jnp.einsum("oi,bihw->bohw", w, z,
                          preferred_element_type=z.dtype)

    def forward(self, z, context=None, key=None):
        if self.use_lu:
            w = self._assemble_w(inverse=True)
            log_det = -jnp.sum(self.log_S)
        else:
            w = jnp.linalg.inv(self.W)
            log_det = -jnp.linalg.slogdet(self.W)[1]
        z_ = self._apply(z, w)
        log_det = log_det * z.shape[2] * z.shape[3]
        return z_, jnp.broadcast_to(log_det, (z.shape[0],)).astype(z.dtype)

    def inverse(self, z, context=None, key=None):
        if self.use_lu:
            w = self._assemble_w()
            log_det = jnp.sum(self.log_S)
        else:
            w = self.W
            log_det = jnp.linalg.slogdet(self.W)[1]
        z_ = self._apply(z, w)
        log_det = log_det * z.shape[2] * z.shape[3]
        return z_, jnp.broadcast_to(log_det, (z.shape[0],)).astype(z.dtype)


class InvertibleAffine(Flow, _LUWeight):
    """1-D version of the invertible 1x1 convolution
    (reference ``mixing.py:136-207``)."""

    W: Optional[jax.Array] = None
    L: Optional[jax.Array] = None
    U: Optional[jax.Array] = None
    log_S: Optional[jax.Array] = None
    P: Optional[jax.Array] = buffer_field(default=None)
    sign_S: Optional[jax.Array] = buffer_field(default=None)
    num_channels: int = static_field(default=0)
    use_lu: bool = static_field(default=True)

    @classmethod
    def create(cls, key, num_channels, use_lu=True, dtype=jnp.float32):
        if use_lu:
            p, l, u, sign_s, log_s = _lu_init(key, num_channels, dtype)
            return cls(P=p, L=l, U=u, sign_S=sign_s, log_S=log_s,
                       num_channels=num_channels, use_lu=True)
        w = _random_orthogonal(key, num_channels, dtype)
        return cls(W=w, num_channels=num_channels, use_lu=False)

    def forward(self, z, context=None, key=None):
        if self.use_lu:
            w = self._assemble_w(inverse=True)
            log_det = -jnp.sum(self.log_S)
        else:
            w = jnp.linalg.inv(self.W)
            log_det = -jnp.linalg.slogdet(self.W)[1]
        z_ = z @ w
        return z_, jnp.broadcast_to(log_det, (z.shape[0],)).astype(z.dtype)

    def inverse(self, z, context=None, key=None):
        if self.use_lu:
            w = self._assemble_w()
            log_det = jnp.sum(self.log_S)
        else:
            w = self.W
            log_det = jnp.linalg.slogdet(self.W)[1]
        z_ = z @ w
        return z_, jnp.broadcast_to(log_det, (z.shape[0],)).astype(z.dtype)


class _Permutation(Flow):
    """Index-select permutation along a given axis
    (reference ``mixing.py:213-247``)."""

    permutation: jax.Array = buffer_field()
    inv_permutation: jax.Array = buffer_field(default=None)
    dim: int = static_field(default=1)

    def _inv(self):
        # precomputed in create(); fall back for hand-built instances
        if self.inv_permutation is not None:
            return self.inv_permutation
        return jnp.argsort(self.permutation)

    def forward(self, z, context=None, key=None):
        z_ = jnp.take(z, self.permutation, axis=self.dim)
        return z_, jnp.zeros(z.shape[0], dtype=z.dtype)

    def inverse(self, z, context=None, key=None):
        z_ = jnp.take(z, self._inv(), axis=self.dim)
        return z_, jnp.zeros(z.shape[0], dtype=z.dtype)


class _RandomPermutation(_Permutation):
    """Random fixed permutation (reference ``mixing.py:250-254``)."""

    @classmethod
    def create(cls, key, features, dim=1):
        perm = jax.random.permutation(key, features)
        return cls(permutation=perm, inv_permutation=jnp.argsort(perm),
                   dim=dim)


class LULinear(Flow):
    """Linear transform parameterized by its LU decomposition
    (reference ``mixing.py:368-532``).

    Forward: ``y = L U x + b`` with unit-diagonal L and
    ``diag(U) = softplus(raw) + eps``; inverse via two triangular solves;
    log-det is ``sum(log(diag(U)))`` — O(D).

    :meth:`with_cache` precomputes the assembled weight, its inverse, and the
    log-det into buffers, functionally replacing the reference's mutable
    ``_LinearCache`` (``mixing.py:287-332``).
    """

    lower_entries: jax.Array
    upper_entries: jax.Array
    unconstrained_upper_diag: jax.Array
    bias: jax.Array
    cache_weight: Optional[jax.Array] = buffer_field(default=None)
    cache_inverse: Optional[jax.Array] = buffer_field(default=None)
    cache_logabsdet: Optional[jax.Array] = buffer_field(default=None)
    features: int = static_field(default=0)
    eps: float = static_field(default=1e-3)

    @classmethod
    def create(cls, key, features, identity_init=True, eps=1e-3,
               dtype=jnp.float32):
        n_tri = ((features - 1) * features) // 2
        if identity_init:
            lower = jnp.zeros((n_tri,), dtype)
            upper = jnp.zeros((n_tri,), dtype)
            constant = float(np.log(np.exp(1 - eps) - 1))
            diag = jnp.full((features,), constant, dtype)
        else:
            stdv = 1.0 / np.sqrt(features)
            k1, k2, k3 = jax.random.split(key, 3)
            lower = jax.random.uniform(k1, (n_tri,), dtype, -stdv, stdv)
            upper = jax.random.uniform(k2, (n_tri,), dtype, -stdv, stdv)
            diag = jax.random.uniform(k3, (features,), dtype, -stdv, stdv)
        return cls(lower_entries=lower, upper_entries=upper,
                   unconstrained_upper_diag=diag,
                   bias=jnp.zeros((features,), dtype),
                   features=features, eps=eps)

    @property
    def upper_diag(self):
        return jax.nn.softplus(self.unconstrained_upper_diag) + self.eps

    def _create_lower_upper(self):
        n = self.features
        tril_r, tril_c = np.tril_indices(n, k=-1)
        triu_r, triu_c = np.triu_indices(n, k=1)
        lower = jnp.zeros((n, n), self.lower_entries.dtype)
        lower = lower.at[tril_r, tril_c].set(self.lower_entries)
        lower = lower + jnp.eye(n, dtype=lower.dtype)
        upper = jnp.zeros((n, n), self.upper_entries.dtype)
        upper = upper.at[triu_r, triu_c].set(self.upper_entries)
        upper = upper + jnp.diag(self.upper_diag)
        return lower, upper

    def logabsdet(self):
        return jnp.sum(jnp.log(self.upper_diag))

    def with_cache(self):
        """Precompute weight/inverse/log-det (eval-time amortization)."""
        lower, upper = self._create_lower_upper()
        weight = lower @ upper
        eye = jnp.eye(self.features, dtype=weight.dtype)
        l_inv = jax.scipy.linalg.solve_triangular(lower, eye, lower=True,
                                                  unit_diagonal=True)
        w_inv = jax.scipy.linalg.solve_triangular(upper, l_inv, lower=False)
        return self.replace(cache_weight=weight, cache_inverse=w_inv,
                            cache_logabsdet=self.logabsdet())

    def without_cache(self):
        return self.replace(cache_weight=None, cache_inverse=None,
                            cache_logabsdet=None)

    def forward(self, z, context=None, key=None):
        if self.cache_weight is not None:
            out = z @ self.cache_weight.T + self.bias
            ld = self.cache_logabsdet
        else:
            lower, upper = self._create_lower_upper()
            out = (z @ upper.T) @ lower.T + self.bias
            ld = self.logabsdet()
        return out, jnp.broadcast_to(ld, (z.shape[0],)).astype(z.dtype)

    def inverse(self, z, context=None, key=None):
        if self.cache_inverse is not None:
            out = (z - self.bias) @ self.cache_inverse.T
            ld = -self.cache_logabsdet
        else:
            lower, upper = self._create_lower_upper()
            rhs = (z - self.bias).T
            sol = jax.scipy.linalg.solve_triangular(lower, rhs, lower=True,
                                                    unit_diagonal=True)
            sol = jax.scipy.linalg.solve_triangular(upper, sol, lower=False)
            out = sol.T
            ld = -self.logabsdet()
        return out, jnp.broadcast_to(ld, (z.shape[0],)).astype(z.dtype)


class LULinearPermute(Flow):
    """Fixed random permutation composed with an LU linear transform — the
    NSF mixing layer (reference ``mixing.py:535-563``).  Note the direction
    flip: ``forward`` applies ``linear.inverse`` then ``permutation.inverse``.
    """

    permutation: _RandomPermutation
    linear: LULinear

    @classmethod
    def create(cls, key, num_channels, identity_init=True):
        kp, kl = jax.random.split(key)
        return cls(
            permutation=_RandomPermutation.create(kp, num_channels),
            linear=LULinear.create(kl, num_channels,
                                   identity_init=identity_init),
        )

    def forward(self, z, context=None, key=None):
        z, log_det = self.linear.inverse(z, context=context)
        z, _ = self.permutation.inverse(z, context=context)
        return z, log_det

    def inverse(self, z, context=None, key=None):
        z, _ = self.permutation.forward(z, context=context)
        z, log_det = self.linear.forward(z, context=context)
        return z, log_det
