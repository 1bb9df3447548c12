"""Put the repo root on sys.path so ``import nf_tpu`` works when an example
is run as a script (do NOT use PYTHONPATH here: setting it breaks the axon
TPU plugin registration in this environment)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


# persistent XLA compilation cache: repeat example runs skip remote compiles.
# Skip when the platform was already flipped to cpu (the smoke tests import
# examples under tests/conftest.py, which owns the CPU cache dir) — TPU
# executables in this cache would spam cpu_aot_loader errors there.
try:
    import jax

    if jax.config.read("jax_platforms") != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/nf_tpu_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
