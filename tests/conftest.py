"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip sharding paths are exercised without TPU hardware by forcing
the CPU platform with 8 host devices (SURVEY.md section 4, point 3).

Note: this environment bakes ``JAX_PLATFORMS=axon`` (a tunneled TPU
backend) into the interpreter via sitecustomize, so overriding the env var
is NOT enough — the jax config must be updated after import, before the
backend initializes.  Compiles through the tunnel are slow and tests must
be hermetic, hence CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
