"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (the TPU-native answer to "test
multi-node without a cluster" — see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize force-sets jax_platforms post-import; undo it so
# tests really run on the 8-device virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeat test runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
