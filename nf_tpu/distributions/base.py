"""Base distributions (capability parity with reference
``normflows/distributions/base.py``).

Functional API: ``forward(key, num_samples[, context/y]) -> (z, log_p)``
samples with log density; ``log_prob(z[, context/y])`` evaluates density;
``sample`` returns samples only.  Temperature-annealed sampling (mutable
``.temperature`` in the reference, e.g. ``base.py:84-88``) is a static field —
use ``with_temperature(t)`` to get an annealed copy.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, buffer_field, static_field

_LOG2PI = float(np.log(2 * np.pi))


class BaseDistribution(Module):
    """Abstract base distribution (reference ``distributions/base.py:8-49``)."""

    def forward(self, key, num_samples=1, context=None):
        raise NotImplementedError

    def log_prob(self, z, context=None):
        raise NotImplementedError

    def sample(self, key, num_samples=1, **kwargs):
        z, _ = self.forward(key, num_samples, **kwargs)
        return z

    def with_temperature(self, temperature):
        if "temperature" in getattr(self, "_nf_static", ()):
            return self.replace(temperature=temperature)
        raise NotImplementedError(
            "This distribution does not support temperature annealed sampling"
        )


class DiagGaussian(BaseDistribution):
    """Diagonal Gaussian with trainable loc/log_scale
    (reference ``base.py:52-103``)."""

    loc: jax.Array
    log_scale: jax.Array
    shape: tuple = static_field()
    trainable: bool = static_field(default=True)
    temperature: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, shape, trainable=True, dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        return cls(loc=jnp.zeros((1,) + shape, dtype),
                   log_scale=jnp.zeros((1,) + shape, dtype),
                   shape=shape, trainable=trainable)

    @property
    def d(self):
        return int(np.prod(self.shape))

    def _log_scale(self):
        ls = self.log_scale
        if not self.trainable:
            ls = jax.lax.stop_gradient(ls)
        if self.temperature is not None:
            ls = ls + float(np.log(self.temperature))
        return ls

    def _loc(self):
        return jax.lax.stop_gradient(self.loc) if not self.trainable else self.loc

    def forward(self, key, num_samples=1, context=None):
        eps = jax.random.normal(key, (num_samples,) + self.shape,
                                self.loc.dtype)
        log_scale = self._log_scale()
        z = self._loc() + jnp.exp(log_scale) * eps
        log_p = -0.5 * self.d * _LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=tuple(range(1, eps.ndim)))
        return z, log_p

    def log_prob(self, z, context=None):
        log_scale = self._log_scale()
        eps = (z - self._loc()) / jnp.exp(log_scale)
        return -0.5 * self.d * _LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=tuple(range(1, z.ndim)))


class ConditionalDiagGaussian(BaseDistribution):
    """Diagonal Gaussian whose mean/log-std come from a context encoder
    (reference ``base.py:106-155``)."""

    context_encoder: Any
    shape: tuple = static_field()

    @classmethod
    def create(cls, shape, context_encoder):
        if isinstance(shape, int):
            shape = (shape,)
        return cls(context_encoder=context_encoder, shape=tuple(shape))

    def _params(self, context):
        out = self.context_encoder(context)
        split = out.shape[-1] // 2
        return out[..., :split], out[..., split:]

    def forward(self, key, num_samples=1, context=None):
        mean, log_scale = self._params(context)
        eps = jax.random.normal(key, (num_samples,) + self.shape, mean.dtype)
        z = mean + jnp.exp(log_scale) * eps
        d = int(np.prod(self.shape))
        log_p = -0.5 * d * _LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=tuple(range(1, eps.ndim)))
        return z, log_p

    def log_prob(self, z, context=None):
        mean, log_scale = self._params(context)
        d = int(np.prod(self.shape))
        eps = (z - mean) / jnp.exp(log_scale)
        return -0.5 * d * _LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=tuple(range(1, z.ndim)))


class Uniform(BaseDistribution):
    """Box-uniform distribution (reference ``base.py:158-195``)."""

    shape: tuple = static_field()
    low: float = static_field(default=-1.0)
    high: float = static_field(default=1.0)

    @classmethod
    def create(cls, shape, low=-1.0, high=1.0):
        if isinstance(shape, int):
            shape = (shape,)
        return cls(shape=tuple(shape), low=float(low), high=float(high))

    @property
    def _log_prob_val(self):
        d = int(np.prod(self.shape))
        return -d * float(np.log(self.high - self.low))

    def forward(self, key, num_samples=1, context=None):
        z = jax.random.uniform(key, (num_samples,) + self.shape,
                               minval=self.low, maxval=self.high)
        log_p = jnp.full((num_samples,), self._log_prob_val, z.dtype)
        return z, log_p

    def log_prob(self, z, context=None):
        out_range = jnp.logical_or(z < self.low, z > self.high)
        ind_inf = jnp.any(out_range.reshape(z.shape[0], -1), axis=-1)
        return jnp.where(ind_inf, -jnp.inf, self._log_prob_val)


class UniformGaussian(BaseDistribution):
    """Per-index mix of uniform (width ``scale`` centered at 0) and Gaussian
    entries (reference ``base.py:198-270``); base for circular NSF."""

    scale: jax.Array = buffer_field()
    ind: jax.Array = buffer_field()
    ind_: jax.Array = buffer_field()
    inv_perm: jax.Array = buffer_field()
    ndim: int = static_field()

    @classmethod
    def create(cls, ndim, ind, scale=None, dtype=jnp.float32):
        if isinstance(ind, int):
            ind = [ind]
        ind = [int(i) for i in np.asarray(ind).reshape(-1)]
        other = [i for i in range(ndim) if i not in ind]
        perm = ind + other
        inv_perm = np.zeros(ndim, dtype=np.int64)
        for i, p in enumerate(perm):
            inv_perm[p] = i
        if scale is None:
            scale = jnp.ones((ndim,), dtype)
        return cls(scale=jnp.asarray(scale, dtype), ind=jnp.asarray(ind),
                   ind_=jnp.asarray(other), inv_perm=jnp.asarray(inv_perm),
                   ndim=ndim)

    def forward(self, key, num_samples=1, context=None):
        z = self.sample(key, num_samples)
        return z, self.log_prob(z)

    def sample(self, key, num_samples=1, context=None):
        ku, kg = jax.random.split(key)
        eps_u = jax.random.uniform(ku, (num_samples, self.ind.shape[0]),
                                   self.scale.dtype) - 0.5
        eps_g = jax.random.normal(kg, (num_samples, self.ind_.shape[0]),
                                  self.scale.dtype)
        z = jnp.concatenate([eps_u, eps_g], axis=-1)
        z = z[..., self.inv_perm]
        return self.scale * z

    def log_prob(self, z, context=None):
        log_p_u = jnp.broadcast_to(-jnp.log(self.scale[self.ind]),
                                   (z.shape[0], self.ind.shape[0]))
        log_p_g = (-0.5 * _LOG2PI - jnp.log(self.scale[self.ind_])
                   - 0.5 * (z[..., self.ind_] / self.scale[self.ind_]) ** 2)
        return jnp.sum(log_p_u, -1) + jnp.sum(log_p_g, -1)


def _onehot_t(y, num_classes, dtype):
    """(num_classes, batch) one-hot from int labels or transpose of one-hot."""
    if y.ndim == 1:
        return jax.nn.one_hot(y, num_classes, dtype=dtype).T
    return y.T


class ClassCondDiagGaussian(BaseDistribution):
    """Class-conditional diagonal Gaussian (reference ``base.py:273-344``)."""

    loc: jax.Array  # (*shape, num_classes)
    log_scale: jax.Array
    shape: tuple = static_field()
    num_classes: int = static_field()
    temperature: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, shape, num_classes, dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        return cls(loc=jnp.zeros(shape + (num_classes,), dtype),
                   log_scale=jnp.zeros(shape + (num_classes,), dtype),
                   shape=shape, num_classes=num_classes)

    def _params(self, y):
        yt = _onehot_t(y, self.num_classes, self.loc.dtype)
        n_dim = len(self.shape)
        perm = (n_dim,) + tuple(range(n_dim))
        loc = jnp.transpose(self.loc @ yt, perm)
        log_scale = jnp.transpose(self.log_scale @ yt, perm)
        if self.temperature is not None:
            log_scale = log_scale + float(np.log(self.temperature))
        return loc, log_scale

    def forward(self, key, num_samples=1, y=None):
        if y is not None:
            num_samples = y.shape[0]
        else:
            key, ky = jax.random.split(key)
            y = jax.random.randint(ky, (num_samples,), 0, self.num_classes)
        loc, log_scale = self._params(y)
        eps = jax.random.normal(key, (num_samples,) + self.shape,
                                self.loc.dtype)
        z = loc + jnp.exp(log_scale) * eps
        d = int(np.prod(self.shape))
        log_p = -0.5 * d * _LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=tuple(range(1, eps.ndim)))
        return z, log_p

    def log_prob(self, z, y):
        loc, log_scale = self._params(y)
        d = int(np.prod(self.shape))
        eps = (z - loc) / jnp.exp(log_scale)
        return -0.5 * d * _LOG2PI - jnp.sum(
            log_scale + 0.5 * eps**2, axis=tuple(range(1, z.ndim)))


class GlowBase(BaseDistribution):
    """Glow base: per-channel Gaussian with logscale-factor reparam, optional
    class conditioning and temperature (reference ``base.py:347-471``)."""

    loc: jax.Array
    loc_logs: jax.Array
    log_scale: jax.Array
    log_scale_logs: jax.Array
    loc_cc: Optional[jax.Array]
    log_scale_cc: Optional[jax.Array]
    shape: tuple = static_field()
    num_classes: Optional[int] = static_field(default=None)
    logscale_factor: float = static_field(default=3.0)
    temperature: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, shape, num_classes=None, logscale_factor=3.0,
               dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        n_dim = len(shape)
        pshape = (1, shape[0]) + (1,) * (n_dim - 1)
        cc = num_classes is not None
        return cls(
            loc=jnp.zeros(pshape, dtype), loc_logs=jnp.zeros(pshape, dtype),
            log_scale=jnp.zeros(pshape, dtype),
            log_scale_logs=jnp.zeros(pshape, dtype),
            loc_cc=jnp.zeros((num_classes, shape[0]), dtype) if cc else None,
            log_scale_cc=jnp.zeros((num_classes, shape[0]), dtype) if cc else None,
            shape=shape, num_classes=num_classes,
            logscale_factor=logscale_factor,
        )

    @property
    def class_cond(self):
        return self.num_classes is not None

    def _params(self, y, batch):
        loc = self.loc * jnp.exp(self.loc_logs * self.logscale_factor)
        log_scale = self.log_scale * jnp.exp(
            self.log_scale_logs * self.logscale_factor)
        if self.class_cond:
            if y.ndim == 1:
                y = jax.nn.one_hot(y, self.num_classes, dtype=self.loc.dtype)
            n_dim = len(self.shape)
            cshape = (y.shape[0], self.shape[0]) + (1,) * (n_dim - 1)
            loc = loc + (y @ self.loc_cc).reshape(cshape)
            log_scale = log_scale + (y @ self.log_scale_cc).reshape(cshape)
        if self.temperature is not None:
            log_scale = log_scale + float(np.log(self.temperature))
        return loc, log_scale

    def forward(self, key, num_samples=1, y=None):
        if self.class_cond:
            if y is not None:
                num_samples = y.shape[0]
            else:
                key, ky = jax.random.split(key)
                y = jax.random.randint(ky, (num_samples,), 0, self.num_classes)
        loc, log_scale = self._params(y, num_samples)
        eps = jax.random.normal(key, (num_samples,) + self.shape,
                                self.loc.dtype)
        z = loc + jnp.exp(log_scale) * eps
        d = int(np.prod(self.shape))
        num_pix = int(np.prod(self.shape[1:]))
        sum_dim = tuple(range(1, len(self.shape) + 1))
        log_p = (-0.5 * d * _LOG2PI
                 - num_pix * jnp.sum(log_scale, axis=sum_dim)
                 - 0.5 * jnp.sum(eps**2, axis=sum_dim))
        return z, log_p

    def log_prob(self, z, y=None):
        loc, log_scale = self._params(y, z.shape[0])
        d = int(np.prod(self.shape))
        num_pix = int(np.prod(self.shape[1:]))
        sum_dim = tuple(range(1, len(self.shape) + 1))
        return (-0.5 * d * _LOG2PI
                - num_pix * jnp.sum(log_scale, axis=sum_dim)
                - 0.5 * jnp.sum(((z - loc) / jnp.exp(log_scale)) ** 2,
                                axis=sum_dim))


class AffineGaussian(BaseDistribution):
    """Standard Gaussian pushed through an (optionally class-conditional)
    affine-const transform, with temperature (reference ``base.py:474-570``)."""

    transform: Any  # AffineConstFlow or CCAffineConst
    shape: tuple = static_field()
    num_classes: Optional[int] = static_field(default=None)
    temperature: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, shape, affine_shape, num_classes=None, dtype=jnp.float32):
        from ..flows.affine import AffineConstFlow, CCAffineConst

        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        if num_classes is not None:
            transform = CCAffineConst.create(affine_shape, num_classes, dtype)
        else:
            transform = AffineConstFlow.create(affine_shape, dtype=dtype)
        return cls(transform=transform, shape=shape, num_classes=num_classes)

    @property
    def class_cond(self):
        return self.num_classes is not None

    def forward(self, key, num_samples=1, y=None):
        dtype = self.transform.s.dtype
        if self.class_cond:
            if y is not None:
                num_samples = y.shape[0]
            else:
                key, ky = jax.random.split(key)
                y = jax.random.randint(ky, (num_samples,), 0, self.num_classes)
            if y.ndim == 1:
                y = jax.nn.one_hot(y, self.num_classes, dtype=dtype)
        log_scale = float(np.log(self.temperature)) if self.temperature else 0.0
        d = int(np.prod(self.shape))
        sum_dim = tuple(range(1, len(self.shape) + 1))
        eps = jax.random.normal(key, (num_samples,) + self.shape, dtype)
        z = np.exp(log_scale) * eps
        log_p = (-0.5 * d * _LOG2PI - d * log_scale
                 - 0.5 * jnp.sum(eps**2, axis=sum_dim))
        if self.class_cond:
            z, log_det = self.transform.forward(z, y)
        else:
            z, log_det = self.transform.forward(z)
        return z, log_p - log_det

    def log_prob(self, z, y=None):
        dtype = self.transform.s.dtype
        if self.class_cond and y is not None and y.ndim == 1:
            y = jax.nn.one_hot(y, self.num_classes, dtype=dtype)
        log_scale = float(np.log(self.temperature)) if self.temperature else 0.0
        d = int(np.prod(self.shape))
        sum_dim = tuple(range(1, len(self.shape) + 1))
        if self.class_cond:
            z, log_p = self.transform.inverse(z, y)
        else:
            z, log_p = self.transform.inverse(z)
        z = z / np.exp(log_scale)
        return (log_p - d * log_scale - 0.5 * d * _LOG2PI
                - 0.5 * jnp.sum(z**2, axis=sum_dim))


class GaussianMixture(BaseDistribution):
    """Trainable diagonal GMM (reference ``base.py:573-659``)."""

    loc: jax.Array  # (1, n_modes, dim)
    log_scale: jax.Array
    weight_scores: jax.Array
    n_modes: int = static_field()
    dim: int = static_field()
    trainable: bool = static_field(default=True)

    @classmethod
    def create(cls, n_modes, dim, loc=None, scale=None, weights=None,
               trainable=True, key=None, dtype=jnp.float32):
        if loc is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            loc = jax.random.normal(key, (n_modes, dim), dtype)
        loc = jnp.asarray(loc, dtype)[None]
        if scale is None:
            scale = jnp.ones((n_modes, dim), dtype)
        scale = jnp.asarray(scale, dtype)[None]
        if weights is None:
            weights = jnp.ones((n_modes,), dtype)
        weights = jnp.asarray(weights, dtype)[None]
        weights = weights / jnp.sum(weights, axis=1, keepdims=True)
        return cls(loc=loc, log_scale=jnp.log(scale),
                   weight_scores=jnp.log(weights), n_modes=n_modes, dim=dim,
                   trainable=trainable)

    def _p(self):
        if self.trainable:
            return self.loc, self.log_scale, self.weight_scores
        sg = jax.lax.stop_gradient
        return sg(self.loc), sg(self.log_scale), sg(self.weight_scores)

    def forward(self, key, num_samples=1, context=None):
        loc, log_scale, weight_scores = self._p()
        weights = jax.nn.softmax(weight_scores, axis=1)
        k_mode, k_eps = jax.random.split(key)
        mode = jax.random.categorical(k_mode, jnp.log(weights[0]),
                                      shape=(num_samples,))
        mode_1h = jax.nn.one_hot(mode, self.n_modes, dtype=loc.dtype)[..., None]
        eps = jax.random.normal(k_eps, (num_samples, self.dim), loc.dtype)
        scale_sample = jnp.sum(jnp.exp(log_scale) * mode_1h, axis=1)
        loc_sample = jnp.sum(loc * mode_1h, axis=1)
        z = eps * scale_sample + loc_sample
        return z, self.log_prob(z)

    def log_prob(self, z, context=None):
        loc, log_scale, weight_scores = self._p()
        weights = jax.nn.softmax(weight_scores, axis=1)
        eps = (z[:, None, :] - loc) / jnp.exp(log_scale)
        log_p = (-0.5 * self.dim * _LOG2PI + jnp.log(weights)
                 - 0.5 * jnp.sum(eps**2, axis=2)
                 - jnp.sum(log_scale, axis=2))
        return jax.scipy.special.logsumexp(log_p, axis=1)


class GaussianPCA(BaseDistribution):
    """Low-rank-plus-noise Gaussian (reference ``base.py:662-719``).

    NOTE: the reference's density drops the log on ``det(Sig)`` and flips the
    sign of the normalizer (``base.py:700-704``) — we implement the correct
    ``-d/2 log(2π) - 1/2 logdet(Σ) - 1/2 zᵀΣ⁻¹z`` instead.
    """

    loc: jax.Array
    W: jax.Array
    log_sigma: jax.Array
    dim: int = static_field()
    latent_dim: int = static_field()

    @classmethod
    def create(cls, key, dim, latent_dim=None, sigma=0.1, dtype=jnp.float32):
        if latent_dim is None:
            latent_dim = dim
        return cls(loc=jnp.zeros((1, dim), dtype),
                   W=jax.random.normal(key, (latent_dim, dim), dtype),
                   log_sigma=jnp.asarray(np.log(sigma), dtype),
                   dim=dim, latent_dim=latent_dim)

    def _sig(self):
        return (self.W.T @ self.W
                + jnp.exp(self.log_sigma * 2) * jnp.eye(self.dim,
                                                        dtype=self.W.dtype))

    def forward(self, key, num_samples=1, context=None):
        k1, k2 = jax.random.split(key)
        eps = jax.random.normal(k1, (num_samples, self.latent_dim),
                                self.loc.dtype)
        # sigma observation noise so samples actually follow the returned
        # density W^T W + sigma^2 I (the reference samples on the rank-
        # latent_dim subspace only, ``base.py:689-693`` — deliberate fix)
        noise = jnp.exp(self.log_sigma) * jax.random.normal(
            k2, (num_samples, self.dim), self.loc.dtype)
        z_ = eps @ self.W + noise
        z = z_ + self.loc
        return z, self._log_prob_centered(z_)

    def _log_prob_centered(self, z_):
        sig = self._sig()
        sign, logdet = jnp.linalg.slogdet(sig)
        quad = jnp.sum(z_ * jnp.linalg.solve(sig, z_.T).T, axis=1)
        return -0.5 * self.dim * _LOG2PI - 0.5 * logdet - 0.5 * quad

    def log_prob(self, z, context=None):
        return self._log_prob_centered(z - self.loc)
