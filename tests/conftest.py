"""Test configuration: run on 8 fake CPU devices.

SURVEY.md §4.4: JAX's standard trick — force 8 host-platform devices so
the real Mesh/NamedSharding/psum code paths are exercised in CI on one
machine.  Must run before jax is imported anywhere.  (Note: on this image
the axon TPU plugin ignores the JAX_PLATFORMS env var, so the platform is
pinned via jax.config instead.)
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
