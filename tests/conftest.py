"""Test harness: force JAX onto 8 virtual CPU devices.

Tests never require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh exactly as the driver's dryrun does. NOTE: under the axon
TPU plugin the JAX_PLATFORMS env var alone is ignored — the config update
below is what actually pins the platform.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolated_app_data_dir(tmp_path, monkeypatch):
    """Point the app-data dir (settings.json, presets) at a per-test tmp
    dir so tests never read or write the developer's real settings."""
    monkeypatch.setenv("RAPIDRAW_DATA_DIR", str(tmp_path / "_appdata"))
