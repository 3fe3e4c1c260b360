"""Hierarchical block profiler + operation counters.

The TPU-native counterpart of libff's printf profiler
(libff/common/profiling.{hpp,cpp}): ``enter_block``/``leave_block`` nested
wall-clock timers with indentation and cumulative per-block maps
(profiling.cpp:62-352), global ``inhibit_profiling_info`` /
``inhibit_profiling_counters`` switches (:107-108), and op-count deltas per
block (:90-105).

Where libff counts Fq/G1 operator invocations with static per-class
counters (fp.hpp:49-55), here the formula VM makes op counting EXACT and
free: every traced Program knows its instruction histogram, and
``count_program`` accumulates (#muls, #adds, #subs) x executions x batch
size.  Device timings must be fenced by the caller (on tunneled TPU
backends only a host transfer is a reliable fence — see bench.py).
"""

from __future__ import annotations

import time
from collections import defaultdict

inhibit_profiling_info = False
inhibit_profiling_counters = False

_start_time: float | None = None
_block_stack: list[tuple[str, float]] = []
_cumulative: dict[str, float] = defaultdict(float)
_invocations: dict[str, int] = defaultdict(int)
_op_counts: dict[str, int] = defaultdict(int)
_block_op_snapshots: list[dict[str, int]] = []


def start_profiling() -> None:
    """Reset and start the global clock (libff start_profiling)."""
    global _start_time
    _start_time = time.perf_counter()
    _block_stack.clear()
    _cumulative.clear()
    _invocations.clear()
    _op_counts.clear()


def _indent() -> str:
    return "  " * len(_block_stack)


def enter_block(name: str, indent: bool = True) -> None:
    if _start_time is None:
        start_profiling()
    if not inhibit_profiling_info:
        print(f"{_indent()}(enter) {name}", flush=True)
    _block_stack.append((name, time.perf_counter()))
    _block_op_snapshots.append(dict(_op_counts))


def leave_block(name: str, indent: bool = True) -> None:
    assert _block_stack and _block_stack[-1][0] == name, (
        f"leave_block({name!r}) does not match "
        f"{_block_stack[-1][0] if _block_stack else None!r}")
    _, t0 = _block_stack.pop()
    snap = _block_op_snapshots.pop()
    dt = time.perf_counter() - t0
    _cumulative[name] += dt
    _invocations[name] += 1
    if not inhibit_profiling_info:
        msg = f"{_indent()}(leave) {name}    [{dt:.4f}s]"
        if not inhibit_profiling_counters:
            deltas = {k: _op_counts[k] - snap.get(k, 0)
                      for k in _op_counts if _op_counts[k] != snap.get(k, 0)}
            if deltas:
                msg += "  " + " ".join(
                    f"{k}={v}" for k, v in sorted(deltas.items()))
        print(msg, flush=True)


def count_op(kind: str, n: int = 1) -> None:
    """Increment an operation counter (libff PROFILE_OP_COUNTS statics)."""
    _op_counts[kind] += n


def count_program(prog, batch_elems: int = 1, times: int = 1) -> None:
    """Accumulate a VM Program's exact instruction histogram."""
    from .. import vm

    ops = prog.instr[:, 0]
    import numpy as np

    muls = int(np.sum(ops == vm.MUL))
    adds = int(np.sum(ops == vm.ADD))
    subs = int(np.sum(ops == vm.SUB))
    count_op("fp_mul", muls * batch_elems * times)
    count_op("fp_add", adds * batch_elems * times)
    count_op("fp_sub", subs * batch_elems * times)


def op_counts() -> dict[str, int]:
    return dict(_op_counts)


def print_cumulative_times() -> None:
    """Cumulative per-block table (profiling.cpp print_cumulative_times)."""
    if _start_time is None:
        return
    total = time.perf_counter() - _start_time
    print(f"Cumulative block times (total {total:.3f}s):")
    for name in sorted(_cumulative):
        t = _cumulative[name]
        print(f"  {name}: {t:.4f}s x{_invocations[name]} "
              f"({100 * t / total:.1f}%)")


def print_mem(label: str = "") -> None:
    """Peak host RSS + per-device HBM stats (profiling.cpp:354-373
    print_mem; procps is replaced by /proc/self/status + JAX memory_stats)."""
    vm_peak = ""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM"):
                    vm_peak = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    msg = f"* Peak memory{f' ({label})' if label else ''}: {vm_peak or 'n/a'}"
    try:
        import jax

        for d in jax.devices():
            stats = d.memory_stats() or {}
            used = stats.get("bytes_in_use")
            if used is not None:
                msg += f"; {d}: {used / 2**20:.0f} MiB in use"
    except Exception:
        pass
    if not inhibit_profiling_info:
        print(msg, flush=True)


def print_compilation_info() -> None:
    """Runtime environment dump (profiling.cpp print_compilation_info)."""
    import jax

    print(f"jax {jax.__version__}; backend {jax.default_backend()}; "
          f"devices {[str(d) for d in jax.devices()]}")
