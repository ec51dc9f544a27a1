"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip sharding paths are exercised without TPU hardware by forcing
the CPU platform with 8 host devices (SURVEY.md section 4, point 3).

Note: this environment bakes ``JAX_PLATFORMS=axon`` (a tunneled TPU
backend) into the interpreter via sitecustomize, so overriding the env var
is NOT enough — the jax config must be updated after import, before the
backend initializes.  Compiles through the tunnel are slow and tests must
be hermetic, hence CPU.

TPU lane: ``BAMM_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu.py``
keeps the real backend and runs the compiled-Mosaic tests (kernel parity
on hardware, bench smoke, sharded kernel) — the bug class interpret-mode
CPU tests cannot see (bf16 MXU defaults, excess-precision elision,
Mosaic layouts).  Everything else auto-skips there and the TPU lane
auto-skips under the CPU config.
"""

import os

TPU_LANE = os.environ.get("BAMM_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
else:
    import jax  # keep the baked-in TPU backend

    # TPU compiles are 20-40 s each; persist them across lane runs
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "bammmotif2_tpu_xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs real TPU hardware (run with BAMM_TPU_TESTS=1; "
        "auto-skipped in the hermetic CPU suite)",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if TPU_LANE:
        skip = pytest.mark.skip(reason="CPU-suite test (TPU lane active)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs TPU (BAMM_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
