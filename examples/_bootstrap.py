"""Put the repo root on sys.path so ``import nf_tpu`` works when an example
is run as a script (do NOT use PYTHONPATH here: setting it breaks the axon
TPU plugin registration in this environment)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


# persistent XLA compilation cache: repeat example runs skip remote compiles
try:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
