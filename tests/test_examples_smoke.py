"""Every example script runs 2 iterations on the CPU mesh.

The examples are the framework's public face (the reference ships them as
its documented notebooks, ``mkdocs.yml:18-31``); until round 4 they were
validated only by on-device sweeps, and a helper rename could silently
break one (it did — see commit a535278). This smoke pass imports each
script in-process (so it runs on the conftest CPU backend with the
persistent compilation cache) and drives its ``main()`` with tiny shapes.
"""

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")

# per-example tiny-args: 2 iterations, smallest model/batch the CLI allows
SMOKE = {
    "augmented_flow": ["--iters", "2", "--num-samples", "64"],
    "change_base_distribution": ["--iters", "2", "--num-samples", "64"],
    "circular_nsf": ["--iters", "2", "--num-samples", "64"],
    "comparison_plan_rad_aff": ["--iters", "2", "--num-samples", "64",
                                "--targets", "two_modes",
                                "--flows", "planar", "affine"],
    "conditional_flow": ["--iters", "2", "--num-samples", "64"],
    "glow": ["--iters", "2", "--L", "2", "--K", "2", "--hidden", "32",
             "--batch", "8"],
    "hais_sampling": ["--num-samples", "64", "--steps", "2",
                      "--leapfrog", "2"],
    "image": ["--iters", "2", "--num-samples", "64"],
    "image_nsf": ["--iters", "2", "--L", "2", "--K", "2", "--hidden", "16",
                  "--batch", "8"],
    "migrate_from_reference": ["--iters", "2", "--torch-iters", "2"],
    "multichip_training": ["--iters", "2", "--num-samples", "64"],
    "neural_spline_flow": ["--iters", "2", "--num-samples", "64"],
    "neural_spline_flow --autoregressive": [
        "--iters", "2", "--num-samples", "64", "--autoregressive"],
    "paper_example_nsf": ["--iters", "2", "--K", "2", "--hidden", "32",
                          "--num-samples", "64"],
    "planar": ["--iters", "2", "--num-samples", "64"],
    "real_nvp": ["--iters", "2", "--num-samples", "64"],
    "residual": ["--iters", "2", "--K", "2", "--hidden", "32",
                 "--num-samples", "64"],
    "serving_inference": ["--iters", "2", "--batch", "32",
                          "--serve-batch", "64"],
    "stochastic_nf": ["--iters", "2", "--num-samples", "64"],
    "vae": ["--iters", "2", "--latent", "4", "--batch", "16",
            "--flows", "2"],
}


@pytest.fixture(scope="module", autouse=True)
def _examples_on_path():
    sys.path.insert(0, EXAMPLES_DIR)
    yield
    sys.path.remove(EXAMPLES_DIR)


@pytest.mark.parametrize("spec", sorted(SMOKE))
def test_example_smoke(spec, monkeypatch, tmp_path):
    name = spec.split()[0]
    mod = importlib.import_module(name)
    # sandbox examples/out/: some examples write CSVs even without --plot,
    # and a 2-iteration smoke run must not clobber the committed artifacts
    import _utils

    monkeypatch.setattr(_utils, "OUT_DIR", str(tmp_path))
    monkeypatch.setattr(sys, "argv", [name + ".py"] + SMOKE[spec])
    mod.main()
