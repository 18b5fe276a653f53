"""Test config: force the CPU backend with 8 virtual devices.

Must run before any backend is instantiated (SURVEY.md §4: multi-device DP
tests run on simulated devices; no TPU needed in CI).  The environment
registers an 'axon' TPU PJRT plugin at interpreter start (sitecustomize), so
selecting CPU must go through jax.config — the env var alone is overridden.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, (
        "expected 8 virtual CPU devices; XLA_FLAGS was set too late")
