"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices per the project test
strategy (no multi-chip hardware in CI); the bench path runs on real TPU.

Note: this environment registers an 'axon' TPU platform via sitecustomize and
pins ``jax_platforms="axon,cpu"`` — plain JAX_PLATFORMS env vars are
overridden, so we update the config after import instead.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
