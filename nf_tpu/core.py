"""Model containers — the user API (capability parity with reference
``normflows/core.py``): NormalizingFlow (:9), ConditionalNormalizingFlow
(:216), ClassCondFlow (:369), MultiscaleFlow (:455), NormalizingFlowVAE
(:656).

Every method is a pure function of ``(self, inputs, key)`` and jit-compiles
as one XLA program; sampling RNG is threaded through explicit keys.  Data-
dependent ActNorm initialization — mutation-on-first-batch in the reference
(``normalization.py:19-39``) — is the explicit :meth:`init_from_data` /
:meth:`init_from_samples` pass here, run once before compiling the train step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .utils.module import Module, static_field, stop_gradient_params


def _split_keys(key, n):
    if key is None:
        return [None] * n
    return list(jax.random.split(key, n))


class NormalizingFlow(Module):
    """Base distribution + flow chain + optional target
    (reference ``core.py:9-213``)."""

    q0: Any
    flows: tuple
    p: Optional[Any] = None

    @classmethod
    def create(cls, q0, flows, p=None):
        return cls(q0=q0, flows=tuple(flows), p=p)

    # --- deterministic transport -------------------------------------------------

    def forward(self, z, context=None, key=None):
        """Latent z -> flow variable x (reference ``core.py:27``)."""
        for flow, k in zip(self.flows, _split_keys(key, len(self.flows))):
            z, _ = flow.forward(z, context=context, key=k)
        return z

    def forward_and_log_det(self, z, context=None, key=None):
        """(reference ``core.py:40``)"""
        log_det = jnp.zeros(z.shape[0], dtype=z.dtype)
        for flow, k in zip(self.flows, _split_keys(key, len(self.flows))):
            z, log_d = flow.forward(z, context=context, key=k)
            log_det = log_det + log_d
        return z, log_det

    def inverse(self, x, context=None, key=None):
        """Flow variable x -> latent z (reference ``core.py:56``)."""
        for flow, k in zip(reversed(self.flows),
                           reversed(_split_keys(key, len(self.flows)))):
            x, _ = flow.inverse(x, context=context, key=k)
        return x

    def inverse_and_log_det(self, x, context=None, key=None):
        """(reference ``core.py:70``)"""
        log_det = jnp.zeros(x.shape[0], dtype=x.dtype)
        for flow, k in zip(reversed(self.flows),
                           reversed(_split_keys(key, len(self.flows)))):
            x, log_d = flow.inverse(x, context=context, key=k)
            log_det = log_det + log_d
        return x, log_det

    # --- densities & losses ------------------------------------------------------

    def log_prob(self, x, context=None, key=None):
        """Per-sample log q(x) (reference ``core.py:182``)."""
        log_q = jnp.zeros(x.shape[0], dtype=x.dtype)
        z = x
        for flow, k in zip(reversed(self.flows),
                           reversed(_split_keys(key, len(self.flows)))):
            z, log_det = flow.inverse(z, context=context, key=k)
            log_q = log_q + log_det
        return log_q + self.q0.log_prob(z)

    def forward_kld(self, x, context=None, key=None):
        """MLE loss: -E[log q(x)] (reference ``core.py:87``)."""
        return -jnp.mean(self.log_prob(x, context=context, key=key))

    def sample(self, key, num_samples=1, context=None):
        """Draw samples with log prob (reference ``core.py:167``)."""
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q = self.q0.forward(keys[0], num_samples)
        for flow, k in zip(self.flows, keys[1:]):
            z, log_det = flow.forward(z, context=context, key=k)
            log_q = log_q - log_det
        return z, log_q

    def sample_with_mcmc_stats(self, key, num_samples=1, context=None):
        """:meth:`sample` plus per-stochastic-layer acceptance rates.

        Returns ``(z, log_q, acceptance)`` where ``acceptance`` is a tuple
        with one entry per MCMC layer in chain order (an array of per-MH-
        step mean acceptance rates — see ``forward_with_stats`` on
        :class:`~nf_tpu.flows.MetropolisHastings` /
        :class:`~nf_tpu.flows.HamiltonianMonteCarlo`). Deterministic flows
        contribute nothing. The reference's SNF layers compute the accept
        mask (ref ``flows/stochastic.py:41,88-96``) but never surface it;
        here it is a first-class output, psum-able across a mesh."""
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q = self.q0.forward(keys[0], num_samples)
        acceptance = []
        for flow, k in zip(self.flows, keys[1:]):
            if hasattr(flow, "forward_with_stats"):
                z, log_det, acc = flow.forward_with_stats(
                    z, context=context, key=k)
                acceptance.append(acc)
            else:
                z, log_det = flow.forward(z, context=context, key=k)
            log_q = log_q - log_det
        return z, log_q, tuple(acceptance)

    def reverse_kld(self, key, num_samples=1, beta=1.0, score_fn=True,
                    context=None):
        """VI loss: E_q[log q - beta*log p] with optional annealing and
        sticking-the-landing (reference ``core.py:104-131``)."""
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q_ = self.q0.forward(keys[0], num_samples)
        log_q = jnp.zeros_like(log_q_) + log_q_
        for flow, k in zip(self.flows, keys[1:]):
            z, log_det = flow.forward(z, context=context, key=k)
            log_q = log_q - log_det
        if not score_fn:
            # recompute log q via the inverse chain with gradient-blocked
            # params (sticking the landing, arXiv 1703.09194)
            model_sg = stop_gradient_params(self)
            z_ = z
            log_q = jnp.zeros(z_.shape[0], dtype=z_.dtype)
            for flow, k in zip(reversed(model_sg.flows), reversed(keys[1:])):
                z_, log_det = flow.inverse(z_, context=context, key=k)
                log_q = log_q + log_det
            log_q = log_q + model_sg.q0.log_prob(z_)
        log_p = self.p.log_prob(z, context=context) \
            if context is not None else self.p.log_prob(z)
        return jnp.mean(log_q) - beta * jnp.mean(log_p)

    def reverse_alpha_div(self, key, num_samples=1, alpha=1.0, dreg=False,
                          context=None):
        """Alpha divergence with optional DReG estimator
        (reference ``core.py:133-165``)."""
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q = self.q0.forward(keys[0], num_samples)
        for flow, k in zip(self.flows, keys[1:]):
            z, log_det = flow.forward(z, context=context, key=k)
            log_q = log_q - log_det
        log_p = self.p.log_prob(z, context=context) if context is not None \
            else self.p.log_prob(z)
        if dreg:
            w_const = jax.lax.stop_gradient(jnp.exp(log_p - log_q))
            model_sg = stop_gradient_params(self)
            z_ = z
            log_q = jnp.zeros(z_.shape[0], dtype=z_.dtype)
            for flow, k in zip(reversed(model_sg.flows), reversed(keys[1:])):
                z_, log_det = flow.inverse(z_, context=context, key=k)
                log_q = log_q + log_det
            log_q = log_q + model_sg.q0.log_prob(z_)
            w = jnp.exp(log_p - log_q)
            w_alpha = w_const**alpha
            w_alpha = w_alpha / jnp.mean(w_alpha)
            weights = (1 - alpha) * w_alpha + alpha * w_alpha**2
            loss = -alpha * jnp.mean(weights * jnp.log(w))
        else:
            loss = np.sign(alpha - 1) * jax.scipy.special.logsumexp(
                alpha * (log_p - log_q), axis=0)
        return loss

    # --- data-dependent initialization ------------------------------------------

    def init_from_data(self, x, context=None, key=None):
        """Initialize ActNorm layers from a data batch along the density
        (inverse) direction; returns the updated model. ``key`` is required
        when the chain contains stochastic-estimator layers (residual
        flows)."""
        keys = _split_keys(key, len(self.flows))
        new_flows = []
        z = x
        for flow, k in zip(reversed(self.flows), keys):
            flow, z, _ = flow.init_data_inverse(z, context=context, key=k)
            new_flows.append(flow)
        return self.replace(flows=tuple(reversed(new_flows)))

    def init_from_samples(self, key, num_samples=64, context=None):
        """Initialize ActNorm layers along the sampling (forward) direction
        — used before reverse-KLD training."""
        keys = _split_keys(key, len(self.flows) + 1)
        z, _ = self.q0.forward(keys[0], num_samples)
        new_flows = []
        for flow, k in zip(self.flows, keys[1:]):
            flow, z, _ = flow.init_data_forward(z, context=context, key=k)
            new_flows.append(flow)
        return self.replace(flows=tuple(new_flows))


class ConditionalNormalizingFlow(NormalizingFlow):
    """Flow with context threaded through the base and every layer
    (reference ``core.py:216-366``)."""

    def log_prob(self, x, context=None, key=None):
        log_q = jnp.zeros(x.shape[0], dtype=x.dtype)
        z = x
        for flow, k in zip(reversed(self.flows),
                           reversed(_split_keys(key, len(self.flows)))):
            z, log_det = flow.inverse(z, context=context, key=k)
            log_q = log_q + log_det
        return log_q + self.q0.log_prob(z, context=context)

    def sample(self, key, num_samples=1, context=None):
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q = self.q0.forward(keys[0], num_samples, context=context)
        for flow, k in zip(self.flows, keys[1:]):
            z, log_det = flow.forward(z, context=context, key=k)
            log_q = log_q - log_det
        return z, log_q

    def reverse_kld(self, key, num_samples=1, beta=1.0, score_fn=True,
                    context=None):
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q_ = self.q0.forward(keys[0], num_samples, context=context)
        log_q = jnp.zeros_like(log_q_) + log_q_
        for flow, k in zip(self.flows, keys[1:]):
            z, log_det = flow.forward(z, context=context, key=k)
            log_q = log_q - log_det
        if not score_fn:
            model_sg = stop_gradient_params(self)
            z_ = z
            log_q = jnp.zeros(z_.shape[0], dtype=z_.dtype)
            for flow, k in zip(reversed(model_sg.flows), reversed(keys[1:])):
                z_, log_det = flow.inverse(z_, context=context, key=k)
                log_q = log_q + log_det
            log_q = log_q + model_sg.q0.log_prob(z_, context=context)
        log_p = self.p.log_prob(z, context=context)
        return jnp.mean(log_q) - beta * jnp.mean(log_p)


class ClassCondFlow(Module):
    """Class label conditions only the base distribution (Glow-style;
    reference ``core.py:369-452``)."""

    q0: Any
    flows: tuple

    @classmethod
    def create(cls, q0, flows):
        return cls(q0=q0, flows=tuple(flows))

    def log_prob(self, x, y, key=None):
        log_q = jnp.zeros(x.shape[0], dtype=x.dtype)
        z = x
        for flow, k in zip(reversed(self.flows),
                           reversed(_split_keys(key, len(self.flows)))):
            z, log_det = flow.inverse(z, key=k)
            log_q = log_q + log_det
        return log_q + self.q0.log_prob(z, y)

    def forward_kld(self, x, y, key=None):
        return -jnp.mean(self.log_prob(x, y, key=key))

    def sample(self, key, num_samples=1, y=None, temperature=None):
        """``temperature`` rescales the class-conditional base via its
        ``with_temperature`` (GlowBase/ClassCondDiagGaussian API) — the
        reference's ClassCondFlow has no temperature path; added for
        serving parity with MultiscaleFlow.sample."""
        q0 = (self.q0.with_temperature(temperature)
              if temperature is not None else self.q0)
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q = q0.forward(keys[0], num_samples, y=y)
        for flow, k in zip(self.flows, keys[1:]):
            z, log_det = flow.forward(z, key=k)
            log_q = log_q - log_det
        return z, log_q

    def init_from_data(self, x, y=None):
        new_flows = []
        z = x
        for flow in reversed(self.flows):
            flow, z, _ = flow.init_data_inverse(z)
            new_flows.append(flow)
        return self.replace(flows=tuple(reversed(new_flows)))


class MultiscaleFlow(Module):
    """RealNVP/Glow multi-scale architecture
    (reference ``core.py:455-653``)."""

    q0: tuple  # per-level base distributions
    flows: tuple  # tuple of tuples of flows per level
    merges: tuple
    transform: Optional[Any] = None
    class_cond: bool = static_field(default=True)

    @classmethod
    def create(cls, q0, flows, merges, transform=None, class_cond=True):
        return cls(q0=tuple(q0), flows=tuple(tuple(f) for f in flows),
                   merges=tuple(merges), transform=transform,
                   class_cond=class_cond)

    @property
    def num_levels(self):
        return len(self.q0)

    def forward_kld(self, x, y=None, key=None):
        """(reference ``core.py:480``)"""
        return -jnp.mean(self.log_prob(x, y, key=key))

    def forward_and_log_det(self, z):
        """Latents per level -> observed x (reference ``core.py:504``)."""
        log_det = jnp.zeros(z[0].shape[0], dtype=z[0].dtype)
        z_ = None
        for i in range(len(self.q0)):
            if i == 0:
                z_ = z[0]
            else:
                [z_, log_det_] = list(self.merges[i - 1].forward([z_, z[i]]))
                log_det = log_det + log_det_
            for flow in self.flows[i]:
                z_, log_det_ = flow.forward(z_)
                log_det = log_det + log_det_
        if self.transform is not None:
            z_, log_det_ = self.transform.forward(z_)
            log_det = log_det + log_det_
        return z_, log_det

    def inverse_and_log_det(self, x):
        """Observed x -> latents per level (reference ``core.py:528``)."""
        log_det = jnp.zeros(x.shape[0], dtype=x.dtype)
        if self.transform is not None:
            x, log_det_ = self.transform.inverse(x)
            log_det = log_det + log_det_
        z = [None] * len(self.q0)
        for i in range(len(self.q0) - 1, -1, -1):
            for flow in reversed(self.flows[i]):
                x, log_det_ = flow.inverse(x)
                log_det = log_det + log_det_
            if i == 0:
                z[i] = x
            else:
                [x, z[i]], log_det_ = self.merges[i - 1].inverse(x)
                log_det = log_det + log_det_
        return z, log_det

    def sample(self, key, num_samples=1, y=None, temperature=None):
        """Temperature-annealed multi-scale sampling
        (reference ``core.py:553-586``)."""
        model = self.set_temperature(temperature) if temperature is not None \
            else self
        n_flows = sum(len(f) for f in model.flows)
        keys = _split_keys(key, len(model.q0) + n_flows + 1)
        if model.class_cond and y is None:
            # one label shared by every level (drawing per-level labels
            # would mix classes across scales; the reference does that —
            # deliberate fix)
            num_classes = model.q0[0].num_classes
            y = jax.random.randint(keys[-1], (num_samples,), 0, num_classes)
        ki = 0
        z = log_q = None
        for i in range(len(model.q0)):
            if model.class_cond:
                z_, log_q_ = model.q0[i].forward(keys[ki], num_samples, y=y)
            else:
                z_, log_q_ = model.q0[i].forward(keys[ki], num_samples)
            ki += 1
            if i == 0:
                log_q = log_q_
                z = z_
            else:
                log_q = log_q + log_q_
                z, log_det = model.merges[i - 1].forward([z, z_])
                log_q = log_q - log_det
            for flow in model.flows[i]:
                z, log_det = flow.forward(z, key=keys[ki])
                ki += 1
                log_q = log_q - log_det
        if model.transform is not None:
            z, log_det = model.transform.forward(z)
            log_q = log_q - log_det
        return z, log_q

    def log_prob(self, x, y=None, key=None):
        """(reference ``core.py:588``)"""
        n_flows = sum(len(f) for f in self.flows)
        keys = iter(_split_keys(key, n_flows))
        log_q = jnp.zeros(x.shape[0], dtype=x.dtype)
        z = x
        if self.transform is not None:
            z, log_det = self.transform.inverse(z)
            log_q = log_q + log_det
        for i in range(len(self.q0) - 1, -1, -1):
            for flow in reversed(self.flows[i]):
                z, log_det = flow.inverse(z, key=next(keys))
                log_q = log_q + log_det
            if i > 0:
                [z, z_], log_det = self.merges[i - 1].inverse(z)
                log_q = log_q + log_det
            else:
                z_ = z
            if self.class_cond:
                log_q = log_q + self.q0[i].log_prob(z_, y)
            else:
                log_q = log_q + self.q0[i].log_prob(z_)
        return log_q

    def set_temperature(self, temperature):
        """Return a copy with annealed base distributions
        (reference ``core.py:634-647``)."""
        return self.replace(
            q0=tuple(q.with_temperature(temperature) for q in self.q0))

    def reset_temperature(self):
        return self.set_temperature(None)

    def init_from_data(self, x, y=None):
        """Data-dependent ActNorm init along the density direction."""
        z = x
        if self.transform is not None:
            z, _ = self.transform.inverse(z)
        new_flows = [list(f) for f in self.flows]
        for i in range(len(self.q0) - 1, -1, -1):
            for j in range(len(self.flows[i]) - 1, -1, -1):
                flow, z, _ = self.flows[i][j].init_data_inverse(z)
                new_flows[i][j] = flow
            if i > 0:
                [z, _], _ = self.merges[i - 1].inverse(z)
        return self.replace(flows=tuple(tuple(f) for f in new_flows))


class NormalizingFlowVAE(Module):
    """VAE with flow-transformed approximate posterior
    (reference ``core.py:656-701``)."""

    prior: Any
    q0: Any
    flows: tuple
    decoder: Optional[Any] = None

    @classmethod
    def create(cls, prior, q0, flows=None, decoder=None):
        return cls(prior=prior, q0=q0, flows=tuple(flows or ()),
                   decoder=decoder)

    def forward(self, key, x, num_samples=1):
        """Returns (z, log_q, log_p) with (batch, num_samples, ...) shapes
        (reference ``core.py:676-700``)."""
        keys = _split_keys(key, len(self.flows) + 1)
        z, log_q = self.q0.forward(keys[0], x, num_samples=num_samples)
        # flatten batch and sample dims
        z = z.reshape((-1,) + z.shape[2:])
        log_q = log_q.reshape((-1,) + log_q.shape[2:])
        for flow, k in zip(self.flows, keys[1:]):
            z, log_det = flow.forward(z, key=k)
            log_q = log_q - log_det
        log_p = self.prior.log_prob(z)
        if self.decoder is not None:
            log_p = log_p + self.decoder.log_prob(x, z)
        z = z.reshape((-1, num_samples) + z.shape[1:])
        log_q = log_q.reshape((-1, num_samples) + log_q.shape[1:])
        log_p = log_p.reshape((-1, num_samples) + log_p.shape[1:])
        return z, log_q, log_p
