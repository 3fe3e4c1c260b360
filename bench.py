"""North-star benchmark: alt_bn128 G1 signed-digit Pippenger MSM throughput.

Prints auxiliary JSON lines (2^24 run, G2 2^16 run, roofline ratio)
followed by the MAIN metric as the LAST JSON line
{"metric", "value", "unit", "vs_baseline"}.

The measured workload mirrors libff's multiexp_profile harness
(libff/algebra/scalar_multiplication/profile/profile_multiexp.cpp:401-414):
N scalars from the deterministic SHA512 RNG (common/rng.tcc:26-71) times N
points (32 distinct generator multiples repeated, profile_multiexp.cpp:36-45),
method = BDLO12_signed with mixed addition.

Correctness is checked at FULL size against an exact independent oracle:
because point i is (i%32 + 1) * gen, the MSM equals
(sum_i k_i * (i%32 + 1) mod r) * gen — one host scalar multiplication, so
even the 2^24 result is verified bit-exactly before timing.  The oracle's
per-class scalar sums are recomputed from the scalar limbs actually fed to
the device (never loaded pre-aggregated from the input cache), and cached
point coordinates are verified element-for-element against freshly
recomputed base points, so a stale or corrupted cache cannot pass.

BUDGET SAFETY (round-2 lesson: BENCH_r02 rc=124): the whole run fits a
wall-clock budget (BENCH_BUDGET_S, default 1380 s).  The main 2^20 metric
is computed FIRST and always printed (last, per the output contract); aux
stages run only while budget remains, and the compile-bearing aux stages
(G2, roofline) run in subprocesses under hard timeouts so a Mosaic/XLA
compile stall can never take down the main metric.  The 2^24 stage reuses
the 2^20-compiled program (2^20-point chunks), adding no compilation.

Timing is honest for the tunneled TPU backend: inputs are varied per
iteration (dispatch-cache defeat) and every iteration fences with a small
device->host transfer.

vs_baseline compares against the MEASURED libff reference throughput on a
4-vCPU Xeon @2.10GHz build host (see BASELINE.md "MEASURED baseline":
refbuild/baseline_driver.cpp, strongest configuration = MULTICORE
chunks=4).  Against the stock single-chunk harness configuration
(69,083 pts/s) multiply the reported vs_baseline by 4.16.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# MEASURED libff baselines on the build host (Xeon @2.10GHz, 4 vCPUs),
# strongest configuration (BDLO12_signed+mixed, MULTICORE chunks=4) — see
# BASELINE.md "MEASURED baseline" (refbuild/baseline_driver.cpp).  The
# stock harness's own configuration (chunks=1) measures 69,083 pts/s (G1
# 2^20) and 15,540 pts/s (G2 2^16).
BASELINE_G1_2E20_PPS = 287416.0
BASELINE_G2_2E16_PPS = 50152.0

T_START = time.time()


def _elapsed() -> float:
    return time.time() - T_START


def _budget() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "1380"))


def _remaining() -> float:
    return _budget() - _elapsed()


def _inputs(dc, log2n: int):
    """SHA512_rng scalars + 32 repeated generator multiples, cached in /tmp
    (the reference harness likewise persists its base-element files).

    The cache holds only raw inputs (scalar limbs + point coords); the
    oracle sums are recomputed from the limbs on every load and the coords
    are verified against freshly recomputed base points, so the
    correctness check never trusts cached derived data."""
    from libff_tpu.host import field as hf

    cache = f"/tmp/libff_tpu_bench_inputs_{log2n}.npz"
    n = 1 << log2n
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    base = [E.mul(i + 1, gen) for i in range(32)]
    bx = np.asarray(dc.fq.from_ints([p[0] for p in base]))
    by = np.asarray(dc.fq.from_ints([p[1] for p in base]))
    rep = np.arange(n) % 32

    if os.path.exists(cache):
        try:
            z = np.load(cache)
            limbs, x, y = z["limbs"], z["x"], z["y"]
            ok = (limbs.shape == (16, n)
                  and np.array_equal(x, bx[:, rep])
                  and np.array_equal(y, by[:, rep]))
        except Exception:
            ok = False
        if ok:
            return limbs, x, y, _class_sums(limbs)

    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    x, y = bx[:, rep], by[:, rep]
    # plain-form Fr limbs, vectorized via the little-endian byte dump
    raw = b"".join(k.to_bytes(32, "little") for k in ks)
    limbs = np.frombuffer(raw, dtype="<u2").reshape(n, 16).T.astype(np.uint32)
    np.savez(cache, limbs=limbs, x=x, y=y)
    return limbs, x, y, _class_sums(limbs)


def _class_sums(limbs: np.ndarray) -> list:
    """Exact per-residue-class scalar sums K_j = sum_{i%32==j} k_i,
    recomputed from the (16, n) plain-form u16 limb matrix: per-class
    per-limb partial sums in uint64 (no overflow: n/32 terms < 2^24, each
    < 2^16), combined exactly with Python ints."""
    n = limbs.shape[1]
    cls = (np.arange(n) % 32).astype(np.int64)
    out = []
    for j in range(32):
        part = limbs[:, cls == j].astype(np.uint64).sum(axis=1)  # (16,)
        out.append(sum(int(p) << (16 * l) for l, p in enumerate(part)))
    return out


def _oracle(dc, ks_mod):
    """Exact expected MSM value: sum_j (j+1) * K_j * gen over the host
    curve, where K_j = sum of scalars hitting residue class j."""
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    r = cd.r
    total = 0
    for j, kj in enumerate(ks_mod):
        total = (total + (j + 1) * kj) % r
    return E.mul(total, gen) if total else None


def _check(dc, out, want) -> bool:
    g1 = dc.g1
    import jax

    # jit the conversion: eagerly it is ~400 sequential Fermat-ladder
    # dispatches, each a tunnel round-trip
    A = jax.jit(g1.to_affine)(out)
    ax, ay = jax.device_get(A.x), jax.device_get(A.y)
    got = (g1.F.to_host(ax), g1.F.to_host(ay))
    return got == want


def _subprocess_metric(args, timeout_s: float, metric: str,
                       extra: dict | None = None) -> dict:
    """Run an aux bench stage in a subprocess under a hard timeout and
    return its last stdout JSON line (isolation: a compile stall in the
    child can never starve the main metric)."""
    try:
        r = subprocess.run([sys.executable] + args, capture_output=True,
                           text=True, timeout=timeout_s,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        lines = [ln for ln in r.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            tail = (r.stderr or r.stdout or "")[-160:]
            return {"metric": metric, "value": 0.0,
                    "error": f"no JSON output (rc={r.returncode}): {tail}"}
        d = json.loads(lines[-1])
        if extra:
            d = {**extra, **d}
        return d
    except subprocess.TimeoutExpired:
        return {"metric": metric, "value": 0.0,
                "error": f"timeout after {timeout_s:.0f}s"}
    except Exception as e:  # noqa: BLE001 - aux must never sink the main
        return {"metric": metric, "value": 0.0,
                "error": f"{type(e).__name__}: {e}"[:200]}


def _probe_tpu(timeout_s: float) -> str:
    """Probe the TPU backend in a subprocess (a hung tunnel cannot hang
    the bench).  Returns "tpu" (up), "absent" (backend initialized
    cleanly but no TPU exists — a CPU-only box, retrying is pointless),
    or "down" (init hung or raised — a tunnel outage worth retrying).
    A successful probe also warms the tunnel for the in-process init."""
    code = ("import jax, jax.numpy as jnp;"
            "d = jax.devices();"
            "x = jnp.ones((8,), jnp.uint32);"
            "assert int(jnp.sum(x)) == 8;"
            "print('PLATFORM=' + d[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s)
        if r.returncode == 0 and "PLATFORM=tpu" in r.stdout:
            return "tpu"
        if r.returncode == 0 and "PLATFORM=" in r.stdout:
            return "absent"
        return "down"
    except Exception:
        return "down"


def _wait_for_tpu() -> bool:
    """Retry TPU backend init with backoff (round-3 lesson: a transient
    tunnel outage at capture time silently produced a CPU artifact that
    became the round's official number).  Waits up to BENCH_TPU_WAIT_S
    (default 600 s, capped at half the remaining budget) before giving
    up; each probe runs in a subprocess under its own timeout."""
    wait_budget = min(float(os.environ.get("BENCH_TPU_WAIT_S", "600")),
                      max(0.0, _remaining() * 0.5))
    deadline = time.time() + wait_budget
    attempt = 0
    while True:
        attempt += 1
        left = deadline - time.time()
        if left <= 0:
            return False
        state = _probe_tpu(timeout_s=min(180.0, max(30.0, left)))
        if state == "tpu":
            return True
        if state == "absent":
            # clean init with no TPU device: CPU-only box (CI smoke) —
            # retrying cannot produce a TPU
            return False
        left = deadline - time.time()
        if left <= 5:
            return False
        pause = min(30.0 * attempt, left)
        print(f"# TPU probe {attempt} failed; retrying in {pause:.0f}s "
              f"({left:.0f}s left)", file=sys.stderr)
        time.sleep(pause)


def _parse_json_lines(text: str) -> list:
    lines = []
    for ln in (text or "").strip().splitlines():
        if ln.startswith("{"):
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    return lines


def _subprocess_lines(args, timeout_s: float,
                      env: dict | None = None) -> tuple[list, int]:
    """Run a child bench stage; return (its stdout JSON lines, returncode).
    Unlike _subprocess_metric this keeps EVERY line (the --g1 child emits
    the 2^24 aux line AND the main line).  On timeout the child's PARTIAL
    stdout is salvaged — the child flushes the main metric as soon as it
    is measured, so a timeout in a later aux stage no longer loses it."""
    try:
        r = subprocess.run([sys.executable] + args, capture_output=True,
                           text=True, timeout=timeout_s, env=env,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        return _parse_json_lines(r.stdout), r.returncode
    except subprocess.TimeoutExpired as e:
        out = e.stdout
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        return _parse_json_lines(out), -1


def main() -> None:
    """Orchestrator: probes the TPU, then runs every device stage in its
    OWN subprocess, serially — the round-4 lesson: a parent that holds
    the (single, tunneled) TPU client while a child stage runs depresses
    the child's measurement ~3.6x (measured: G2 2^16 6,951 pts/s under a
    live parent client vs 24,840 standalone).  The parent itself never
    initializes the TPU backend on the healthy path."""
    tpu_up = _wait_for_tpu()
    if tpu_up:
        main_line = {"metric": "alt_bn128_g1_msm_points_per_sec_2e20",
                     "value": 0.0, "unit": "points/sec", "vs_baseline": 0.0,
                     "error": "g1 child produced no main line"}
        aux_lines = []
        g1_rc = 0
        if _remaining() > 120:
            # the child inherits the parent's REMAINING budget (minus the
            # shutdown margin), not the full BENCH_BUDGET_S — its internal
            # guards otherwise ignore time already spent waiting for the
            # TPU; and it flushes the main metric before the 2^24 aux
            # stage, so even a hard timeout keeps the measured number
            timeout = max(120.0, _remaining() - 300)
            lines, g1_rc = _subprocess_lines(
                ["bench.py", "--g1"], timeout_s=timeout,
                env={**os.environ,
                     "BENCH_BUDGET_S": str(max(90.0, timeout - 30.0))})
            for d in lines:
                m = d.get("metric", "")
                # the main metric by PREFIX: a degraded CPU-fallback child
                # emits ..._2e12, which must still be recognized as main
                if (m.startswith("alt_bn128_g1_msm_points_per_sec")
                        and not m.endswith("_2e24")):
                    main_line = d
                else:
                    aux_lines.append(d)
            if g1_rc == -1 and "error" not in main_line:
                aux_lines.append({"metric": "bench_g1_child",
                                  "value": 0.0,
                                  "error": "g1 child timed out after the "
                                           "main metric; aux 2^24 lost"})
                g1_rc = 0
        if _remaining() > 240:
            aux_lines.append(_subprocess_metric(
                ["profile/bench_g2.py"],
                timeout_s=min(_remaining() - 120, 720),
                metric="alt_bn128_g2_msm_points_per_sec_2e16"))
        if _remaining() > 300:
            aux_lines.append(_subprocess_metric(
                ["profile/bench_g2.py", "18"],
                timeout_s=min(_remaining() - 120, 600),
                metric="alt_bn128_g2_msm_points_per_sec_2e18"))
        if _remaining() > 180:
            rl = _subprocess_metric(
                ["profile/roofline.py", "18", "cios"],
                timeout_s=min(_remaining() - 60, 480),
                metric="field_mul_roofline_ratio")
            if "ratio" in rl:
                rl = {"metric": "field_mul_roofline_ratio",
                      "value": rl["ratio"], "unit": "x",
                      "target": "<= 1.3", "detail": rl}
            aux_lines.append(rl)
        for line in aux_lines:
            print(json.dumps(line))
        print(json.dumps(main_line))
        if g1_rc != 0 or "error" in main_line:
            sys.exit(1)
        return
    _device_stages(tpu_up=False)


def _device_stages(tpu_up: bool, child: bool = False) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if not tpu_up:
        # TPU tunnel down after the full retry window: run the CPU
        # fallback so the bench still emits a parseable metric line, but
        # mark it unmistakably degraded (see main_line below).
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from libff_tpu.curves.device import device_curve
    from libff_tpu.curves.group import AffinePoint
    from libff_tpu.msm.pippenger import msm_pippenger

    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        # backend died between probe and init: last-resort CPU fallback
        jax.config.update("jax_platforms", "cpu")
        platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    log2n = 20 if on_tpu else 12

    dc = device_curve("alt_bn128")
    g1 = dc.g1
    n = 1 << log2n

    limbs_np, x_np, y_np, ks_mod = _inputs(dc, log2n)
    limbs = jnp.asarray(limbs_np)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    inf = jnp.zeros((n,), dtype=jnp.bool_)

    def msm_step(s, x, y, i, sft):
        # vary scalars per iteration: rotate limb 0 (still valid inputs)
        s = s.at[0].set((s[0] + sft) & 0xFFFF)
        return msm_pippenger(g1, s, AffinePoint(x, y, i), 254)

    fn = jax.jit(msm_step)

    # ---- MAIN metric, computed FIRST: full-size bit-exact check against
    # the structured oracle (sft=0), then honest timing ---------------------
    out = fn(limbs, x, y, inf, jnp.uint32(0))
    want = _oracle(dc, ks_mod)
    if not _check(dc, out, want):
        print(json.dumps({"metric": f"alt_bn128_g1_msm_points_per_sec_2e{log2n}",
                          "value": 0.0, "unit": "points/sec",
                          "vs_baseline": 0.0,
                          "error": "full-size result mismatch vs oracle"}))
        sys.exit(1)

    iters = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(limbs, x, y, inf, jnp.uint32(i))
        _ = np.asarray(out.z).sum()  # tiny device->host fence
    dt = (time.perf_counter() - t0) / iters
    pps = n / dt
    main_line = {
        "metric": f"alt_bn128_g1_msm_points_per_sec_2e{log2n}",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / BASELINE_G1_2E20_PPS, 4),
    }
    if not on_tpu:
        # CPU fallback / CI smoke run: make the degradation unmissable —
        # this is NOT the official TPU measurement.
        main_line["platform"] = platform
        main_line["degraded"] = True
        main_line["error"] = ("TPU backend unavailable after retry window; "
                              "CPU fallback at 2^12 — not a TPU number")
    if child:
        # flush NOW: the orchestrator re-orders lines, so a timeout in the
        # 2^24 aux stage below can no longer lose the measured main metric
        print(json.dumps(main_line), flush=True)
    aux_lines = []

    # ---- aux metrics (TPU only), each under a budget guard ----------------
    # 2^24 chunked run: reuses the 2^20-compiled program (2^20-point
    # chunks sliced on device) — no new compilation, so it runs in-process.
    if on_tpu and _remaining() > 420:
        try:
            log2b = 24
            nb = 1 << log2b
            limbs24, x24, y24, ks24 = _inputs(dc, log2b)
            # device-resident inputs, uploaded ONCE: per-iteration
            # host->device transfers through the tunneled backend would
            # dominate the measurement otherwise (~3.2 GB)
            limbs24_d = jax.device_put(jnp.asarray(limbs24))
            x24_d = jax.device_put(jnp.asarray(x24))
            y24_d = jax.device_put(jnp.asarray(y24))
            del limbs24, x24, y24

            def msm_24(sft):
                """Chunked MSM (streaming.py schedule): fixed-order sum of
                per-chunk partials through the SAME compiled 2^20 program
                as the main metric."""
                total = None
                for c0 in range(0, nb, n):
                    part = fn(limbs24_d[:, c0:c0 + n], x24_d[:, c0:c0 + n],
                              y24_d[:, c0:c0 + n], inf, jnp.uint32(sft))
                    total = part if total is None else g1.add(total, part)
                return total

            out24 = msm_24(0)
            ok24 = _check(dc, out24, _oracle(dc, ks24))
            t0 = time.perf_counter()
            reps24 = 2
            for i in range(1, reps24 + 1):
                out24 = msm_24(i)
                _ = np.asarray(out24.z).sum()
            dt24 = (time.perf_counter() - t0) / reps24
            aux_lines.append({
                "metric": "alt_bn128_g1_msm_points_per_sec_2e24",
                "value": round(nb / dt24, 1), "unit": "points/sec",
                "bit_exact_vs_oracle": bool(ok24),
                "vs_baseline": round(nb / dt24 / BASELINE_G1_2E20_PPS, 4)})
            del limbs24_d, x24_d, y24_d
        except Exception as e:  # aux metric must not sink the main one
            aux_lines.append({"metric": "alt_bn128_g1_msm_points_per_sec_2e24",
                              "value": 0.0, "unit": "points/sec",
                              "error": f"{type(e).__name__}: {e}"[:200]})

    # (G2 and roofline stages run from the ORCHESTRATOR, after this
    # child exits, so no live TPU client depresses their measurements)

    for line in aux_lines:
        print(json.dumps(line))
    # ---- MAIN metric: last JSON line (the child already flushed it once;
    # the orchestrator deduplicates by metric name) -------------------------
    if not child:
        print(json.dumps(main_line))


if __name__ == "__main__":
    if "--g1" in sys.argv:
        _device_stages(tpu_up=True, child=True)  # parent already probed
    else:
        main()
