"""Put the repo root on sys.path so ``import nf_tpu`` works when an example
is run as a script (do NOT use PYTHONPATH here: setting it breaks the axon
TPU plugin registration in this environment)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
