"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware; multi-chip sharding tests use
XLA's host-platform device-count override (SURVEY.md §4: the deterministic
single-host multi-device harness libff never had).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
