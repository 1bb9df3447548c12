"""Shared test fixtures mirroring the reference test strategy:

* ``check_forward_inverse`` — round-trip identity + log-det antisymmetry
  (reference ``flows/flow_test.py:7-48``).
* ``check_forward_log_prob`` — sampling/density consistency
  (reference ``distributions/distribution_test.py:6-51``).
"""

import jax
import jax.numpy as jnp
import numpy as np


def assert_close(a, b, atol=1e-4, rtol=1e-4, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                               rtol=rtol, err_msg=msg)


def check_forward_inverse(flow, inputs, atol=1e-4, context=None):
    """inverse(forward(x)) == x and log_det_fwd + log_det_inv == 0."""
    outputs, log_det = flow.forward(inputs, context=context)
    inputs_, log_det_ = flow.inverse(outputs, context=context)
    assert outputs.dtype == inputs.dtype
    assert inputs_.dtype == inputs.dtype
    assert inputs_.shape == inputs.shape
    assert_close(inputs_, inputs, atol=atol, rtol=0.0, msg="roundtrip")
    ld_sum = np.asarray(log_det + log_det_)
    np.testing.assert_allclose(ld_sum, np.zeros_like(ld_sum), atol=atol,
                               err_msg="log-det antisymmetry")


def check_inverse_forward(flow, inputs, atol=1e-4, context=None):
    """Same but starting from the inverse direction."""
    outputs, log_det = flow.inverse(inputs, context=context)
    inputs_, log_det_ = flow.forward(outputs, context=context)
    assert_close(inputs_, inputs, atol=atol, rtol=0.0, msg="roundtrip(inv)")
    ld_sum = np.asarray(log_det + log_det_)
    np.testing.assert_allclose(ld_sum, np.zeros_like(ld_sum), atol=atol,
                               err_msg="log-det antisymmetry(inv)")


def check_log_det_jacobian(flow, inputs, atol=5e-3, direction="forward"):
    """Brute-force Jacobian check on small inputs: the reported log-det must
    equal slogdet of the autodiff Jacobian (stronger than the reference's
    antisymmetry-only check)."""
    fn = flow.forward if direction == "forward" else flow.inverse

    def single(x):
        y, _ = fn(x[None])
        return y[0].reshape(-1)

    _, log_det = fn(inputs)
    for i in range(min(3, inputs.shape[0])):
        jac = jax.jacfwd(single)(inputs[i])
        d = inputs[i].size
        jac = jac.reshape(d, d)
        _, ref_ld = jnp.linalg.slogdet(jac)
        assert_close(log_det[i], ref_ld, atol=atol, rtol=1e-3,
                     msg=f"log-det vs jacobian (sample {i})")


def check_forward_log_prob(dist, key, num_samples=5, atol=1e-4, **kwargs):
    """Sampled log_p equals recomputed log_prob(z)."""
    z, log_p = dist.forward(key, num_samples, **kwargs)
    log_p_ = dist.log_prob(z, **kwargs)
    assert log_p.shape[0] == num_samples
    assert_close(log_p, log_p_, atol=atol, msg="sample/log_prob consistency")
    return z, log_p
