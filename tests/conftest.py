"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (data parallelism over a `jax.sharding.Mesh`) is
validated without TPU hardware by forcing the host platform and splitting it
into 8 virtual devices. Must run before the first `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The env var alone does not override the experimental 'axon' TPU plugin in
# this image; force the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA cache: the suite's CPU compiles dominate its 45-50 min
# runtime; shape-identical re-runs hit the on-disk cache instead.
from hipad_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
