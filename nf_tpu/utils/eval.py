"""Evaluation metrics (reference ``normflows/utils/eval.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .nn import sum_except_batch


def bits_per_dim(model, x, y=None, trans="logit", trans_param=(0.05,)):
    """Bits/dim of a batch under ``model``, including the logit dequant
    correction (reference ``eval.py:5-34``)."""
    if trans != "logit":
        raise NotImplementedError(
            f"The transformation {trans} is not implemented.")
    dims = int(np.prod(x.shape[1:]))
    if y is None:
        log_q = model.log_prob(x)
    else:
        log_q = model.log_prob(x, y)
    sig_ = sum_except_batch(jax.nn.log_sigmoid(x)) / np.log(2)
    sig_ = sig_ + sum_except_batch(jax.nn.log_sigmoid(-x)) / np.log(2)
    b = -log_q / dims / np.log(2) - np.log2(1 - trans_param[0]) + 8
    return b + sig_ / dims


def bits_per_dim_dataset(model, data_iter, class_cond=True, trans="logit",
                         trans_param=(0.05,)):
    """NaN-robust average bits/dim over an iterable of (x, y) batches
    (reference ``eval.py:37-63``)."""
    n = 0
    b_cum = 0.0
    for x, y in data_iter:
        b_np = np.asarray(
            bits_per_dim(model, x, y if class_cond else None, trans,
                         trans_param))
        b_cum += np.nansum(b_np)
        n += len(b_np) - int(np.sum(np.isnan(b_np)))
    return b_cum / n


# aliases matching the reference names
bitsPerDim = bits_per_dim
bitsPerDimDataset = bits_per_dim_dataset
