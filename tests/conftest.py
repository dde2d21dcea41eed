"""Test harness setup.

Tests run on CPU with a virtual 8-device mesh so distributed code paths
(pjit sharding, collectives, sharded classifier) are exercised without TPU
hardware — the same code runs unmodified on a real slice.
Must run before anything imports jax.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax with another platform pinned (e.g. the
# axon TPU plugin's sitecustomize), in which case the env var above is read
# too late — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_SCRIPTS = "/root/reference/scripts"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SCRIPTS)


def add_reference_path():
    if REFERENCE_SCRIPTS not in sys.path:
        sys.path.insert(0, REFERENCE_SCRIPTS)
