"""Lipschitz-constrained networks for residual flows
(reference ``normflows/nets/lipschitz.py``, from the residual-flows codebase).

Spectral normalization by power iteration.  The reference mutates ``u``/``v``
buffers inside ``compute_weight`` (``lipschitz.py:223-270``); here the power
iteration is the explicit functional :meth:`update_power_iteration` — the
training loop calls :func:`nf_tpu.utils.optim.update_lipschitz` once per step
(as the reference example does) and gets a new model back.  The forward pass
uses the stored ``u``/``v`` with *soft* normalization — the weight is divided
by ``max(1, sigma/coeff)`` so gradients flow through sigma
(``lipschitz.py:267-269``).

General (p, q) induced norms are supported through ``domain``/``codomain``
options mirroring the reference's ``normalize_u``/``normalize_v``/
``projmax_``/``asym_squash`` helpers (``lipschitz.py:642-714``); the default
(2, 2) spectral norm remains the fast path (it is the only configuration the
reference's ``LipschitzMLP``/``LipschitzCNN`` ever instantiate,
``lipschitz.py:50-60,105-120``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, buffer_field, static_field


def _l2_normalize(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


# --- generic (p, q) induced-norm helpers (reference lipschitz.py:642-714,
# algorithm from http://www.qetlab.com/InducedMatrixNorm) ------------------

def vector_norm(x, p):
    """``(sum |x|^p)^(1/p)`` over the flattened vector (reference
    ``vector_norm``; applied to non-negative magnitudes)."""
    x = jnp.abs(x.reshape(-1))
    return jnp.sum(x ** p) ** (1.0 / p)


def projmax(v):
    """One-hot at the argmax of ``|v|`` — the functional form of the
    reference's in-place ``projmax_`` (the p=1 / q=inf extreme points)."""
    return jax.nn.one_hot(jnp.argmax(jnp.abs(v)), v.shape[0],
                          dtype=v.dtype)


def normalize_v(v, domain, eps=1e-12):
    """Project onto the unit ``domain``-norm sphere along the dual-scaling
    direction (reference ``normalize_v``). ``domain`` is a static float."""
    domain = float(domain)
    if domain == 2.0:
        return _l2_normalize(v, eps)
    if domain == 1.0:
        return projmax(v)
    vabs = jnp.abs(v)
    # sign with 0 -> +1 (reference sets NaN phases to 1)
    vph = jnp.where(vabs > 0, v / jnp.where(vabs > 0, vabs, 1.0), 1.0)
    vabs = vabs / (jnp.max(vabs) + eps)
    vabs = vabs ** (1.0 / (domain - 1.0))
    return vph * vabs / (vector_norm(vabs, domain) + eps)


def normalize_u(u, codomain, eps=1e-12):
    """Dual projection for the output side (reference ``normalize_u``).
    ``codomain`` is a static float; ``inf`` selects the max coordinate."""
    codomain = float(codomain)
    if codomain == 2.0:
        return _l2_normalize(u, eps)
    if codomain == float("inf"):
        return projmax(u)
    uabs = jnp.abs(u)
    uph = jnp.where(uabs > 0, u / jnp.where(uabs > 0, uabs, 1.0), 1.0)
    uabs = uabs / (jnp.max(uabs) + eps)
    uabs = uabs ** (codomain - 1.0)
    if codomain == 1.0:
        return uph * uabs / (jnp.max(jnp.abs(uabs)) + eps)
    return uph * uabs / (vector_norm(uabs, codomain / (codomain - 1.0))
                         + eps)


def leaky_elu(x, a=0.3):
    return a * x + (1 - a) * jax.nn.elu(x)


def asym_squash(x):
    """Squash an unconstrained scalar into (1, 5) for learnable-order
    norms (reference ``asym_squash``: tanh(-leaky_elu(-x + log(3)/...)))."""
    return jnp.tanh(-leaky_elu(-x + 0.5493061829986572)) * 2.0 + 3.0


class Swish(Module):
    """``x * sigmoid(softplus(beta) * x) / 1.1`` with trainable beta
    (reference ``lipschitz.py:642-648``); Lipschitz constant <= 1."""

    beta: jax.Array

    @classmethod
    def create(cls, dtype=jnp.float32):
        return cls(beta=jnp.asarray([0.5], dtype))

    def __call__(self, x):
        return x * jax.nn.sigmoid(x * jax.nn.softplus(self.beta)) / 1.1


class InducedNormLinear(Module):
    """Induced-norm normalized dense layer (reference
    ``lipschitz.py:132-295``). Default ``domain=codomain=2`` is the
    spectral norm; other static float orders (1, 1.5, ..., inf codomain)
    run the generalized power iteration with the dual projections
    ``normalize_u``/``normalize_v``."""

    weight: jax.Array  # (out, in)
    bias: Optional[jax.Array]
    u: jax.Array = buffer_field(default=None)
    v: jax.Array = buffer_field(default=None)
    coeff: float = static_field(default=0.97)
    n_iterations: int = static_field(default=5)
    domain: float = static_field(default=2.0)
    codomain: float = static_field(default=2.0)

    @classmethod
    def create(cls, key, in_features, out_features, bias=True, coeff=0.97,
               n_iterations=5, zero_init=False, domain=2.0, codomain=2.0,
               dtype=jnp.float32):
        kw, kb, ku, kv = jax.random.split(key, 4)
        bound_w = float(np.sqrt(1.0 / in_features))
        weight = jax.random.uniform(kw, (out_features, in_features), dtype,
                                    -bound_w * np.sqrt(3) * np.sqrt(2),
                                    bound_w * np.sqrt(3) * np.sqrt(2))
        if zero_init:
            weight = weight / 1000.0  # normalize can't handle exact zeros
        b = None
        if bias:
            b = jax.random.uniform(kb, (out_features,), dtype, -bound_w,
                                   bound_w)
        u = normalize_u(jax.random.normal(ku, (out_features,), dtype),
                        codomain)
        v = normalize_v(jax.random.normal(kv, (in_features,), dtype),
                        domain)
        layer = cls(weight=weight, bias=b, u=u, v=v, coeff=coeff,
                    n_iterations=n_iterations, domain=float(domain),
                    codomain=float(codomain))
        # warm-start the power iteration (reference does 200 iters at init)
        layer = layer.update_power_iteration(200)
        if (domain, codomain) != (2.0, 2.0):
            # non-(2,2) iterations can land in bad fixed points: try extra
            # random restarts and keep the largest sigma estimate
            # (reference lipschitz.py:176-194)
            best_u, best_v, best_scale = layer.u, layer.v, layer.scale
            for i in range(10):
                ku, kv = jax.random.split(jax.random.fold_in(ku, i))
                cand = layer.replace(
                    u=normalize_u(jax.random.normal(
                        ku, (out_features,), dtype), codomain),
                    v=normalize_v(jax.random.normal(
                        kv, (in_features,), dtype), domain),
                ).update_power_iteration(200)
                better = cand.scale > best_scale
                best_u = jnp.where(better, cand.u, best_u)
                best_v = jnp.where(better, cand.v, best_v)
                best_scale = jnp.maximum(best_scale, cand.scale)
            layer = layer.replace(u=best_u, v=best_v)
        return layer

    def update_power_iteration(self, n_iterations=None):
        """Run the u/v power iteration; returns the updated layer
        (functional replacement for ``compute_weight(update=True)``)."""
        n = n_iterations if n_iterations is not None else self.n_iterations
        w = jax.lax.stop_gradient(self.weight)
        dom, cod = self.domain, self.codomain

        def body(_, uv):
            u, v = uv
            u = normalize_u(w @ v, cod)
            v = normalize_v(w.T @ u, dom)
            return u, v

        u, v = jax.lax.fori_loop(0, n, body, (self.u, self.v))
        return self.replace(u=u, v=v)

    def _effective_weight(self):
        u = jax.lax.stop_gradient(self.u)
        v = jax.lax.stop_gradient(self.v)
        sigma = jnp.dot(u, self.weight @ v)
        # soft normalization: only shrink when sigma exceeds coeff
        factor = jnp.maximum(1.0, sigma / self.coeff)
        return self.weight / factor

    @property
    def scale(self):
        """Current spectral-norm estimate sigma (diagnostic)."""
        return jnp.dot(self.u, self.weight @ self.v)

    def __call__(self, x):
        w = self._effective_weight()
        y = jnp.dot(x, w.T, preferred_element_type=x.dtype)
        if self.bias is not None:
            y = y + self.bias
        return y


class InducedNormConv2d(Module):
    """Spectrally normalized conv layer (reference ``lipschitz.py:295-610``).

    The k x k power iteration runs conv / conv-transpose pairs on full input-
    shaped vectors (``lipschitz.py:561-578``), so the spatial dims must be
    known: pass ``spatial_dims`` at creation (the reference infers them on
    the first forward call).
    """

    weight: jax.Array  # (out, in, kh, kw)
    bias: Optional[jax.Array]
    u: jax.Array = buffer_field(default=None)
    v: jax.Array = buffer_field(default=None)
    coeff: float = static_field(default=0.97)
    n_iterations: int = static_field(default=5)
    stride: int = static_field(default=1)
    padding: int = static_field(default=1)
    spatial_dims: tuple = static_field(default=(1, 1))
    domain: float = static_field(default=2.0)
    codomain: float = static_field(default=2.0)

    @classmethod
    def create(cls, key, in_channels, out_channels, kernel_size,
               spatial_dims, stride=1, padding=None, bias=True, coeff=0.97,
               n_iterations=5, zero_init=False, domain=2.0, codomain=2.0,
               dtype=jnp.float32):
        if padding is None:
            padding = kernel_size // 2
        kw, kb, ku, kv = jax.random.split(key, 4)
        fan_in = in_channels * kernel_size * kernel_size
        bound_w = float(np.sqrt(1.0 / fan_in))
        shape = (out_channels, in_channels, kernel_size, kernel_size)
        weight = jax.random.uniform(kw, shape, dtype,
                                    -bound_w * np.sqrt(3) * np.sqrt(2),
                                    bound_w * np.sqrt(3) * np.sqrt(2))
        if zero_init:
            weight = weight / 1000.0
        b = None
        if bias:
            b = jax.random.uniform(kb, (out_channels,), dtype, -bound_w,
                                   bound_w)
        h, w_ = spatial_dims
        if kernel_size == 1:
            u = normalize_u(jax.random.normal(ku, (out_channels,), dtype),
                            codomain)
            v = normalize_v(jax.random.normal(kv, (in_channels,), dtype),
                            domain)
        else:
            v = normalize_v(
                jax.random.normal(kv, (in_channels * h * w_,), dtype),
                domain)
            # output size inferred from a conv on the input-shaped vector
            probe = jax.lax.conv_general_dilated(
                v.reshape(1, in_channels, h, w_), weight,
                (stride, stride), [(padding, padding)] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            u = normalize_u(
                jax.random.normal(ku, (int(np.prod(probe.shape)),), dtype),
                codomain)
        layer = cls(weight=weight, bias=b, u=u, v=v, coeff=coeff,
                    n_iterations=n_iterations, stride=stride,
                    padding=padding, spatial_dims=tuple(spatial_dims),
                    domain=float(domain), codomain=float(codomain))
        return layer.update_power_iteration(200)

    def _conv(self, x, w):
        return jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    def _conv_t(self, y, w):
        return jax.lax.conv_transpose(
            y, w, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            transpose_kernel=True)

    def update_power_iteration(self, n_iterations=None):
        n = n_iterations if n_iterations is not None else self.n_iterations
        w = jax.lax.stop_gradient(self.weight)
        c_in = w.shape[1]
        h, w_sp = self.spatial_dims
        dom, cod = self.domain, self.codomain
        if w.shape[-1] == 1 and w.shape[-2] == 1:
            w2 = w[:, :, 0, 0]

            def body(_, uv):
                u, v = uv
                u = normalize_u(w2 @ v, cod)
                v = normalize_v(w2.T @ u, dom)
                return u, v

            u, v = jax.lax.fori_loop(0, n, body, (self.u, self.v))
            return self.replace(u=u, v=v)

        out_shape = self._conv(jnp.zeros((1, c_in, h, w_sp), w.dtype),
                               w).shape

        def body(_, uv):
            u, v = uv
            u_s = self._conv(v.reshape(1, c_in, h, w_sp), w)
            u = normalize_u(u_s.reshape(-1), cod)
            v_s = self._conv_t(u.reshape(out_shape), w)
            v = normalize_v(v_s.reshape(-1), dom)
            return u, v

        u, v = jax.lax.fori_loop(0, n, body, (self.u, self.v))
        return self.replace(u=u, v=v)

    def _sigma(self):
        u = jax.lax.stop_gradient(self.u)
        v = jax.lax.stop_gradient(self.v)
        c_in = self.weight.shape[1]
        h, w_sp = self.spatial_dims
        if self.weight.shape[-1] == 1 and self.weight.shape[-2] == 1:
            w2 = self.weight[:, :, 0, 0]
            return jnp.dot(u, w2 @ v)
        wv = self._conv(v.reshape(1, c_in, h, w_sp), self.weight)
        return jnp.dot(u, wv.reshape(-1))

    @property
    def scale(self):
        return self._sigma()

    def _effective_weight(self):
        factor = jnp.maximum(1.0, self._sigma() / self.coeff)
        return self.weight / factor

    def __call__(self, x):
        w = self._effective_weight()
        y = self._conv(x, w)
        if self.bias is not None:
            y = y + self.bias[None, :, None, None]
        return y


class LipschitzMLP(Module):
    """Swish + spectrally normalized dense layers with L < 1
    (reference ``lipschitz.py:14-67``)."""

    layers: tuple  # alternating Swish / InducedNormLinear

    @classmethod
    def create(cls, key, channels, lipschitz_const=0.97,
               max_lipschitz_iter=5, init_zeros=True, dtype=jnp.float32):
        n_layers = len(channels) - 1
        keys = jax.random.split(key, n_layers)
        layers = []
        for i in range(n_layers):
            layers.append(Swish.create(dtype))
            layers.append(InducedNormLinear.create(
                keys[i], channels[i], channels[i + 1], coeff=lipschitz_const,
                n_iterations=max_lipschitz_iter,
                zero_init=(init_zeros and i == n_layers - 1), dtype=dtype))
        return cls(layers=tuple(layers))

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class LipschitzCNN(Module):
    """Swish + spectrally normalized conv layers with L < 1
    (reference ``lipschitz.py:70-129``)."""

    layers: tuple

    @classmethod
    def create(cls, key, channels, kernel_size, spatial_dims,
               lipschitz_const=0.97, max_lipschitz_iter=5, init_zeros=True,
               dtype=jnp.float32):
        n_layers = len(kernel_size)
        keys = jax.random.split(key, n_layers)
        layers = []
        for i in range(n_layers):
            layers.append(Swish.create(dtype))
            layers.append(InducedNormConv2d.create(
                keys[i], channels[i], channels[i + 1], kernel_size[i],
                spatial_dims=spatial_dims, coeff=lipschitz_const,
                n_iterations=max_lipschitz_iter,
                zero_init=(init_zeros and i == n_layers - 1), dtype=dtype))
        return cls(layers=tuple(layers))

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x
