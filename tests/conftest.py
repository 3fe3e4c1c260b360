"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware; multi-chip sharding tests use
XLA's host-platform device-count override (SURVEY.md §4: the deterministic
single-host multi-device harness libff never had).

Note: the environment may import jax at interpreter start (sitecustomize),
so setting JAX_PLATFORMS in os.environ here is too late — use
jax.config.update, which works as long as no backend has been initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (every VM scan /
# while-loop recompiles per worker process otherwise), and this box's
# XLA:CPU backend segfaults FLAKILY while compiling the eager field-mul
# programs — a warm cache is also the crash mitigation.  The CPU suite
# uses its own dir (never shared with a TPU process: concurrent TPU/CPU
# use of one dir segfaulted workers in the cache read path).  If entries
# were written by a DIFFERENT machine (cpu_aot_loader feature-mismatch
# warnings), delete the dir — foreign executables run pathologically
# slowly (see .claude/skills/verify/SKILL.md gotchas).
jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
