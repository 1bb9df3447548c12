"""Metrics and observability (SURVEY §5 — the reference has no logging
framework; its examples append losses to numpy arrays)."""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def effective_sample_size(log_weights):
    """ESS of normalized importance weights: ``(sum w)^2 / sum w^2``."""
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return jnp.exp(-jax.scipy.special.logsumexp(2 * lw))


def mcmc_acceptance_rate(z_before, z_after):
    """Fraction of chains that moved (diagnostic for MH/HMC layers)."""
    moved = jnp.any(z_before != z_after, axis=tuple(range(1, z_before.ndim)))
    return jnp.mean(moved.astype(jnp.float32))


class MetricLogger:
    """Host-side JSONL (and optional CSV) metric logger."""

    def __init__(self, path, also_csv=False):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)
        self._jsonl = open(path, "a")
        self._csv = None
        self._csv_writer = None
        if also_csv:
            self._csv = open(os.path.splitext(path)[0] + ".csv", "a",
                             newline="")
        self._t0 = time.time()

    def log(self, step, **metrics):
        record = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        record.update({k: (float(v) if hasattr(v, "__float__") else v)
                       for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._csv is not None:
            if self._csv_writer is None:
                self._csv_fields = list(record)
                self._csv_writer = csv.DictWriter(
                    self._csv, fieldnames=self._csv_fields,
                    extrasaction="ignore", restval="")
                # header only when starting a fresh file (appending a second
                # header into an existing CSV corrupts it)
                if self._csv.tell() == 0:
                    self._csv_writer.writeheader()
            self._csv_writer.writerow(record)
            self._csv.flush()
        return record

    def close(self):
        self._jsonl.close()
        if self._csv is not None:
            self._csv.close()
