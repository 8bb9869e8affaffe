"""Benchmark: probability-flow log-prob evaluations/sec on real TPU.

The north-star metric (BASELINE.json): probability-flow ODE log-likelihood
throughput with the Hutchinson trace estimator at rtol=1e-5, on the
reference workload (2-D GMM, VESDE, MLP[128,128,128] score net — the
configuration of demo_diffusion.ipynb).  The baseline rate is the
reference's Hutchinson timing: 50,000 points in 15.79 s = 3,166 evals/s
(BASELINE.md; measured there at atol=rtol=1e-4 on CPU — we benchmark at the
*tighter* 1e-5 target and still compare against that number, which is
conservative in our disfavour).

Protocol: load the committed demo-grade flagship checkpoint
(benchmarks/flagship_ckpt.npz — staged-schedule + EMA training, ~0.15-0.2%
density error; see benchmarks/make_flagship_ckpt.py) so the solve
integrates a realistic trained vector field without spending the
measurement window training over the TPU tunnel, then time the compiled,
batch-sharded log-prob on a 1M-point batch (the 50k reference set tiled
20x — throughput saturates around 1M rows on a v5e core), slope-timed.
The solve uses the Lund-stabilized PI step controller
(options={"controller": "pi"}), which on this field is both faster
(~11% fewer RHS evals) and more accurate than the torchdiffeq-identical
default controller (see BENCHMARKS.md).

BUDGET DISCIPLINE — the driver runs this under a kill timeout, and the
TPU tunnel has multi-hour flapping outages (observed 2026-08-17 and
2026-08-20; round 2's artifact was rc=124 because the preflight rode out
a 10.5-min outage and the measurement was then killed mid-flight).
Preflight + measurement therefore share ONE wall-clock budget
(BENCH_TOTAL_BUDGET_S, default 780 s from process start):

  * the preflight may spend at most (budget - reserve) riding an outage;
  * after preflight the remaining time picks the measurement ladder —
    full (numerics check + 50k slope + 1M slope), reduced (shorter 1M
    slope), or minimal (50k slope only, numerics check skipped with a
    loud stderr note);
  * a cheap safety measurement runs FIRST so a valid number exists
    early (single-chip: a 50k-row slope; multi-device: each timed
    dispatch arms the backstop as it lands), and a SIGTERM handler
    prints the best result captured so far — the driver's `timeout`
    sends SIGTERM before SIGKILL, so even a mid-upgrade kill ships a
    measured number instead of rc=124.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "evals/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

_T_START = time.monotonic()

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_EVALS_PER_SEC = 3166.0  # reference Hutchinson rate (BASELINE.md)
CKPT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "benchmarks", "flagship_ckpt.npz"
)

# Best measurement captured so far: set by main() as soon as any valid
# slope exists, printed by the SIGTERM backstop if the driver kills us.
_BEST_RESULT: dict | None = None


def _env_int(name: str, default: int) -> int:
    """Env-var int with a warning fallback (a malformed value like '20m'
    must not crash the bench with a bare traceback)."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        print(
            f"bench: ignoring malformed {name}={raw!r} (want an integer "
            f"number of seconds); using default {default}",
            file=sys.stderr,
        )
        return default


def _result(rate: float, note: str = "") -> dict:
    if note:
        print(f"bench: {note}", file=sys.stderr)
    return {
        "metric": "probflow_logprob_evals_per_sec_hutchinson_rtol1e-5",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / BASELINE_EVALS_PER_SEC, 2),
    }


_EMITTED = False


def _emit(result: dict) -> None:
    global _EMITTED
    print(json.dumps(result))
    sys.stdout.flush()
    _EMITTED = True


def _install_sigterm_backstop() -> None:
    """On SIGTERM (the driver's `timeout` sends it before SIGKILL), print
    the best measurement captured so far and exit 0 — a measured number
    from the cheap early slope beats rc=124 with no output.  Without a
    captured number, exit 3 with a diagnosis.

    Handler discipline: if the result was already printed (a SIGTERM
    during teardown), exit WITHOUT printing again — stdout must carry
    exactly one JSON line.  Diagnostics use os.write, not print: the
    signal can land mid-way through one of the bench's own buffered
    stderr writes, where print() would raise a reentrant-call error and
    lose the diagnosis."""
    import signal

    def handler(signum, frame):
        if _EMITTED:
            os._exit(0)
        if _BEST_RESULT is not None:
            # json.dumps + os.write: safe against buffered-IO reentrancy
            os.write(1, (json.dumps(_BEST_RESULT) + "\n").encode())
            os._exit(0)
        os.write(
            2,
            (
                "bench: SIGTERM before any measurement completed "
                f"({time.monotonic() - _T_START:.0f}s elapsed) — raise "
                "the driver window or BENCH_TOTAL_BUDGET_S\n"
            ).encode(),
        )
        os._exit(3)

    try:
        signal.signal(signal.SIGTERM, handler)
    except (ValueError, OSError):  # non-main thread / exotic platform
        pass


def _enable_compile_cache() -> None:
    """Persistent compilation cache via config.update — the env-var route
    is dead in this sandbox (sitecustomize imports jax at interpreter
    startup, snapshotting env-derived defaults before we run; see
    tests/conftest.py for the full story)."""
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_bench_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never a failure
        print(f"bench: compile cache unavailable ({e})", file=sys.stderr)


def build_trained_model(key, steps: int = 400, batch: int = 4096,
                        from_checkpoint: bool = False):
    """Flagship model + standardized 50k eval rows.

    ``from_checkpoint=True`` loads the committed demo-grade checkpoint
    when present (the driver bench path — no training over the tunnel
    inside the kill window); the default trains the historical quick
    protocol (``steps`` jitted DSM steps), which existing test fixtures
    rely on for a deterministic cheaply-built field.
    """
    import dataclasses

    from flowfusion_tpu.models.nets import ScoreMLPConfig, init_score_mlp
    from flowfusion_tpu.models.score import ScoreModel
    from flowfusion_tpu.ops.sde import VESDE
    from flowfusion_tpu.utils.data import DEMO_GMM, standardization_stats

    k_net, k_data, k_train = jax.random.split(key, 3)
    cfg = ScoreMLPConfig(n_dimensions=2, units=(128, 128, 128))
    model = ScoreModel(params=init_score_mlp(k_net, cfg), net=cfg, sde=VESDE())
    x_raw = DEMO_GMM.sample(k_data, 50_000)

    if from_checkpoint and os.path.exists(CKPT_PATH):
        from flowfusion_tpu.utils.checkpoint import load_npz, read_npz_extra

        model = load_npz(CKPT_PATH, model)
        extra = read_npz_extra(CKPT_PATH)
        shift = jnp.asarray(extra["shift"], jnp.float32)
        scale = jnp.asarray(extra["scale"], jnp.float32)
        print(
            "bench: loaded flagship checkpoint "
            f"(density err {extra.get('density_rel_error_exact_1e-4', float('nan')):.2%}, "
            f"trained {extra.get('date', '?')} on "
            f"{extra.get('trained_on_backend', '?')})",
            file=sys.stderr,
        )
        return model, (x_raw - shift) / scale, (shift, scale)

    import optax

    shift, scale = standardization_stats(x_raw)
    x = (x_raw - shift) / scale

    tx = optax.adam(1e-3)
    opt_state = tx.init(model.params)

    def step(carry, k):
        params, opt_state = carry
        kb, kl = jax.random.split(k)
        idx = jax.random.randint(kb, (batch,), 0, x.shape[0])

        def loss_fn(p):
            m = dataclasses.replace(model, params=p)
            return m.loss_fn(kl, x[idx])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    keys = jax.random.split(k_train, steps)
    (params, _), losses = jax.lax.scan(step, (model.params, opt_state), keys)
    return dataclasses.replace(model, params=params), x, (shift, scale)


def tpu_numerics_check(model, x):
    """On-device fused-kernel numerics regression guard (runs on whatever
    backend the bench runs on — the real TPU in driver rounds).

    Guards the Pallas precision trap (BENCHMARKS.md "Accuracy"): inside
    Pallas, f32 `jnp.dot` defaults to a single bf16 MXU pass (~1e-3
    relative error); the parity kernels must request HIGHEST.  A silent
    regression to bf16 shows up as ~1e-3 RHS deviation and inflated step
    counts — orders of magnitude beyond these bounds (measured healthy
    values: ~3e-7 RHS deviation, identical step counts).

    Raises RuntimeError, so a precision regression fails the bench loudly
    instead of shipping a wrong number.  Diagnostics go to stderr (stdout
    carries exactly one JSON line).
    """
    import dataclasses

    m_fused = dataclasses.replace(
        model, trace_mode="hutchinson", use_fused_kernel=True
    )
    m_plain = dataclasses.replace(m_fused, use_fused_kernel=False)
    m_3pass = dataclasses.replace(m_fused, kernel_compute_dtype="highf32")
    xs = x[:2048]
    k = jax.random.PRNGKey(7)

    # single fused-vs-plain RHS eval (drift + Hutchinson divergence)
    from flowfusion_tpu.kernels.fused_mlp import fused_drift
    from flowfusion_tpu.ops import trace as trace_lib

    e = trace_lib.make_probes("hutchinson", k, xs)[0]
    c0, c1 = model._fused_coeffs(0.5)
    drift_f, div_f = fused_drift(
        model.params, model.net, jnp.asarray(0.5), xs, e=e, c0=c0, c1=c1,
    )

    def plain_rhs(xx):
        return m_plain.ode_drift(0.5, xx)

    drift_p, div_p = trace_lib.hutchinson_divergence(plain_rhs, xs, e)
    scale = float(jnp.max(jnp.abs(drift_p))) + 1e-12
    rhs_dev = float(jnp.max(jnp.abs(drift_f - drift_p))) / scale
    div_dev = float(jnp.max(jnp.abs(div_f - div_p))) / (
        float(jnp.max(jnp.abs(div_p))) + 1e-12
    )

    # 3-pass (highf32, the bench mode) deviation vs the plain RHS: the
    # dropped lo*lo split-dot term sits at ~2^-18 relative, and the
    # throughput modes' tanh-form sigmoid (see kernels/fused_mlp.py
    # _act_pair_fn) adds ~1e-5 — together still ~10x under the
    # bf16-trap signature (~1e-3) these bounds exist to catch.
    # Measured on the committed demo-grade flagship field (2026-08-20):
    # rhs_dev3 5.1e-5, div_dev3 1.3e-4, mean|dlogp| 1.9e-4 — larger than
    # the old quick-trained field's ~2e-5/...~7e-5 (sharper trained
    # score => bigger activations), but identical step counts and ~5x
    # under the field's own 9.8e-4 rtol=1e-5 truncation floor
    # (BENCHMARKS.md "Measured strict-parity frontier").  Bounds sit at
    # ~2x the measured values: loose enough for field-to-field drift,
    # still an order under the trap signature.
    drift_3, div_3 = fused_drift(
        model.params, model.net, jnp.asarray(0.5), xs, e=e, c0=c0, c1=c1,
        compute_dtype="highf32",
    )
    rhs_dev3 = float(jnp.max(jnp.abs(drift_3 - drift_p))) / scale
    div_dev3 = float(jnp.max(jnp.abs(div_3 - div_p))) / (
        float(jnp.max(jnp.abs(div_p))) + 1e-12
    )

    # short solves: identical math => identical step counts (for all of
    # plain XLA, the HIGHEST kernel, and the 3-pass kernel)
    solve = jax.jit(
        lambda m, xx, kk: m.log_prob(xx, key=kk, atol=1e-5, rtol=1e-5)
    )
    lp_f, st_f = solve(m_fused, xs, k)
    lp_p, st_p = solve(m_plain, xs, k)
    lp_3, st_3 = solve(m_3pass, xs, k)
    nfe_f, nfe_p = int(st_f.n_func_evals), int(st_p.n_func_evals)
    nfe_3 = int(st_3.n_func_evals)
    dlp = float(jnp.mean(jnp.abs(lp_f - lp_p)))
    dlp3 = float(jnp.mean(jnp.abs(lp_3 - lp_p)))

    print(
        f"tpu_numerics_check: rhs_dev {rhs_dev:.2e} div_dev {div_dev:.2e} "
        f"nfe fused/plain/3pass {nfe_f}/{nfe_p}/{nfe_3} "
        f"mean|dlogp| {dlp:.2e} | 3pass rhs_dev {rhs_dev3:.2e} "
        f"div_dev {div_dev3:.2e} mean|dlogp| {dlp3:.2e}",
        file=sys.stderr,
    )
    # Plain raises, not asserts: the guard must survive python -O /
    # PYTHONOPTIMIZE (asserts compile away and a silent bf16 regression
    # would ship a wrong headline number as healthy).
    def _check(ok: bool, msg: str) -> None:
        if not ok:
            raise RuntimeError(f"tpu_numerics_check: {msg}")

    _check(rhs_dev <= 1e-5, f"fused RHS deviates {rhs_dev:.2e} (bf16 trap?)")
    _check(div_dev <= 1e-4, f"fused divergence deviates {div_dev:.2e}")
    _check(nfe_f == nfe_p, f"step counts diverge: fused {nfe_f} plain {nfe_p}")
    _check(dlp <= 1e-4, f"fused log_prob deviates {dlp:.2e}")
    _check(rhs_dev3 <= 1.2e-4, f"3pass RHS deviates {rhs_dev3:.2e} (bf16 trap?)")
    _check(div_dev3 <= 3e-4, f"3pass divergence deviates {div_dev3:.2e}")
    _check(nfe_3 == nfe_p, f"step counts diverge: 3pass {nfe_3} plain {nfe_p}")
    _check(dlp3 <= 5e-4, f"3pass log_prob deviates {dlp3:.2e}")


def _device_preflight(timeout_s: int | None = None,
                      total_budget_s: int | None = None) -> None:
    """Fail fast (with a diagnosis) if the device path is wedged.

    The axon relay has been observed to hang indefinitely — even an 8x8
    matmul never returns (2026-08-17 outage).  A healthy backend finishes
    the first tiny op (backend init + compile included) in well under two
    minutes (measured: ~50 s cold); if a probe doesn't return within
    ``timeout_s`` it is retried with a pause until ``total_budget_s`` is
    spent (observed outages are often transient — e.g. a competing client
    holding the single-tenancy tunnel), then the bench exits nonzero with
    a clear message instead of letting the driver's whole time budget
    burn on a hang.

    ``timeout_s`` defaults to ``BENCH_PROBE_TIMEOUT_S`` (env) or 120 s —
    generous enough that a healthy-but-cold first device init (observed
    ~50 s) is never misclassified as an outage.  ``total_budget_s`` is
    the caller-computed share of the bench's ONE overall budget (main()
    reserves measurement time off BENCH_TOTAL_BUDGET_S); the legacy
    ``BENCH_PREFLIGHT_BUDGET_S`` env var still caps it if set lower.

    Runs in a subprocess: the hang sits inside a blocking native RPC, so
    an in-process SIGALRM handler would never get to run — the probe must
    be killable from outside.
    """
    import subprocess
    import time as _time

    if timeout_s is None:
        timeout_s = _env_int("BENCH_PROBE_TIMEOUT_S", 120)
    if total_budget_s is None:
        total_budget_s = _env_int("BENCH_PREFLIGHT_BUDGET_S", 1200)
    else:
        total_budget_s = min(
            total_budget_s, _env_int("BENCH_PREFLIGHT_BUDGET_S", total_budget_s)
        )
    # A budget below one probe length degenerates to a single short probe.
    # Shrink the PROBE, never grow the budget: bumping the budget up to
    # timeout_s + 5 would silently spend main()'s measurement reserve —
    # exactly the no-number-before-SIGTERM failure the one-budget
    # discipline exists to prevent on tight BENCH_TOTAL_BUDGET_S.
    if total_budget_s < timeout_s + 5:
        timeout_s = min(timeout_s, max(20, int(total_budget_s) - 5))
        total_budget_s = timeout_s + 5

    # honour JAX_PLATFORMS in the child explicitly: this sandbox's
    # sitecustomize force-prefers the axon platform over the env var, and
    # the probe must test the same backend the parent will bench on.
    probe = (
        "import os, jax;"
        "p = os.environ.get('JAX_PLATFORMS');"
        "p and jax.config.update('jax_platforms', p);"
        "import jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((8, 8)) @ jnp.ones((8, 8));"
        "print(float(np.asarray(x)[0, 0]))"
    )
    deadline = _time.monotonic() + total_budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", probe],
                timeout=timeout_s,
                check=True,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE,
            )
            break
        except (
            subprocess.TimeoutExpired,
            subprocess.CalledProcessError,
        ) as e:
            # Fast failures (connection refused, rc != 0) are retried just
            # like hangs: transient relay outages surface both ways, and
            # the whole point of the window is to ride them out.
            if isinstance(e, subprocess.CalledProcessError):
                tail = (
                    (e.stderr or b"")
                    .decode(errors="replace")
                    .strip()
                    .splitlines()
                )
                detail = f"probe failed fast (rc={e.returncode}): " + " | ".join(
                    tail[-3:]
                )
            else:
                detail = f"probe timed out after {timeout_s}s"
            if _time.monotonic() + timeout_s + 12 > deadline:
                print(
                    f"bench preflight: device backend unhealthy across "
                    f"{attempt} probes over ~{total_budget_s}s "
                    f"(last: {detail}) — relay/tunnel outage, not a "
                    "framework failure; rerun when the device path recovers",
                    file=sys.stderr,
                )
                sys.exit(3)
            print(
                f"bench preflight: {detail}; retrying (transient relay "
                "outages recover)",
                file=sys.stderr,
            )
            # Short pause: the single-tenancy tunnel frees up in brief
            # windows during flapping outages (observed 2026-08-20 — one
            # probe succeeded mid-outage); a tight retry cadence catches
            # them, and a healthy backend answers the probe in seconds.
            _time.sleep(10)
    print("bench preflight: backend responsive", file=sys.stderr)


def main():
    global _BEST_RESULT
    import dataclasses

    from flowfusion_tpu.parallel.sharding import make_mesh, shard_batch

    _install_sigterm_backstop()

    # ONE overall budget from process start; everything after the
    # preflight adapts to what is left of it.
    total_budget = _env_int("BENCH_TOTAL_BUDGET_S", 780)
    deadline = _T_START + total_budget

    def remaining() -> float:
        return deadline - time.monotonic()

    # Honour JAX_PLATFORMS in THIS process too (sitecustomize force-prefers
    # axon over the env var), so the parent benches the same backend the
    # preflight child just probed.
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    _enable_compile_cache()

    # Reserve enough for a minimal measurement (checkpoint load + one 50k
    # slope ≈ 2 compiles + seconds of runtime); the preflight gets the rest.
    MIN_MEASURE_S = 150
    _device_preflight(total_budget_s=int(max(remaining() - MIN_MEASURE_S, 0)))

    key = jax.random.PRNGKey(0)
    model, x, _ = build_trained_model(key, from_checkpoint=True)

    if remaining() >= 240:
        tpu_numerics_check(model, x)
    else:
        print(
            f"bench: SKIPPING tpu_numerics_check — only {remaining():.0f}s "
            "of budget left after preflight (outage ride-out); the printed "
            "number is measured but unguarded this run",
            file=sys.stderr,
        )

    # Fastest verified TPU config at rtol=1e-5: the V4 fused Pallas RHS
    # in 'highf32' (manual 3-pass bf16 split-dot + tanh-form sigmoid) —
    # step counts identical to both the plain and the HIGHEST-kernel
    # paths, mean |dlogp| ~7e-5 vs plain XLA (far below the ~5e-3
    # truncation floor of any rtol=1e-5 solve; see BENCHMARKS.md and
    # tpu_numerics_check above, which asserts all of this every run).
    model = dataclasses.replace(
        model, trace_mode="hutchinson", use_fused_kernel=True,
        kernel_compute_dtype="highf32",
    )

    n_dev = len(jax.devices())
    mesh = make_mesh()

    def logprob_fn(m, xx, k):
        lp, stats = m.log_prob(
            xx, key=k, atol=1e-5, rtol=1e-5, options={"controller": "pi"}
        )
        return lp, stats.n_func_evals

    if n_dev > 1:
        # multi-device: shard the batch over the mesh and time single
        # dispatches (the solve is long enough that dispatch overhead is
        # in the noise at this size)
        x_big = jnp.tile(x, (20, 1))
        n = x_big.shape[0]
        jfn = jax.jit(logprob_fn)
        lp, nfe = jfn(model, shard_batch(x_big, mesh), jax.random.PRNGKey(1))
        jax.block_until_ready(lp)
        times = []
        for i in range(3):
            xv = shard_batch(x_big + (i + 1) * 1e-6, mesh)
            t0 = time.perf_counter()
            lp, nfe = jfn(model, xv, jax.random.PRNGKey(100 + i))
            jax.block_until_ready(lp)
            np.asarray(lp[:1])
            times.append(time.perf_counter() - t0)
            # arm the SIGTERM backstop as soon as one timed solve exists
            _BEST_RESULT = _result(n / min(times))
        _emit(_BEST_RESULT)
        return

    # single chip: slope over a lax.scan'd repeat count so the relay's
    # fixed dispatch+fetch overhead (window-dependent 1.5-120 ms; can
    # also return before execution — block_until_ready is not a true
    # barrier here) cancels out and the number approximates pure
    # device time.  Every solve in every rep gets distinct data (the
    # relay caches identical executable+argument pairs and XLA could
    # CSE identical scan inputs) at sub-tolerance 1e-6 offsets.
    # The slope machinery (incl. the doubled-repeat retry when jitter
    # makes a slope non-positive) and the cache-proof input-stack
    # builder are shared with the suite — ONE copy of each.
    from benchmarks.bench_suite import repeat_slope, stack_of

    def per_solve(xx, kk):
        lp, _ = logprob_fn(model, xx, kk)
        return lp

    # Cheap safety slope FIRST (50k rows, short scan): from here on a
    # valid measured number exists for the SIGTERM backstop.  A failure
    # here must not kill the run — the 1M path below is independent.
    # Plausibility floor: a 50k-row rtol=1e-5 Hutchinson solve costs
    # >=150 fused RHS dispatches and the fastest credible highf32 rate
    # is ~2M rows/s, so a marginal under ~20 ms (>2.5e6 evals/s) is
    # relay jitter swamping the short k2=2 slope, not a speedup
    # (observed: 7.5 ms "6.6M evals/s" and 15.9 ms "3.2M evals/s"
    # slopes in otherwise healthy ~1.86M runs) — retry once with a
    # longer scan, else skip the capture rather than arm the SIGTERM
    # backstop with a wrong number.  Shrink-only guard on the BACKSTOP:
    # the printed headline always comes from the 1M slope when it runs.
    def _safety_slope(k2, reps):
        try:
            return repeat_slope(per_solve, stack_of(x, 100), k2=k2, reps=reps)
        except Exception as e:
            print(f"bench: 50k safety slope failed ({e}); continuing",
                  file=sys.stderr)
            return -1.0

    t50 = _safety_slope(2, 2)
    if 0 < t50 <= 0.02:
        print(
            f"bench: 50k safety slope implausible ({t50*1e3:.1f} ms); "
            "retrying with a longer scan",
            file=sys.stderr,
        )
        t50 = _safety_slope(4, 2)
    if t50 > 0.02:
        _BEST_RESULT = _result(
            x.shape[0] / t50,
            f"50k-row safety slope captured ({x.shape[0]/t50:,.0f} evals/s, "
            f"{remaining():.0f}s of budget left)",
        )
    elif t50 > 0:
        print(
            f"bench: 50k safety slope still implausible ({t50*1e3:.1f} ms) "
            "— not captured",
            file=sys.stderr,
        )

    # Full-size measurement if the budget allows: 1M rows saturate the
    # chip (identical work per point, better HBM utilization per
    # dispatch) — this is the headline configuration.
    if remaining() >= 120 or _BEST_RESULT is None:
        x_big = jnp.tile(x, (20, 1))
        n = x_big.shape[0]
        reps = 3 if remaining() >= 300 else 2
        try:
            best = repeat_slope(per_solve, stack_of(x_big, 100), k2=3, reps=reps)
        except Exception as e:
            if _BEST_RESULT is None:
                raise
            best = None
            print(
                f"bench: 1M-row slope failed ({e}); keeping the 50k "
                "safety number",
                file=sys.stderr,
            )
        if best is None:
            pass  # exception path above: the safety number stands
        elif not (best > 0.05):
            # implausible marginal time (relay jitter swamped the slope
            # even after the doubled-repeat retry): fall back to the
            # safety number rather than shipping garbage or dying
            if _BEST_RESULT is None:
                raise RuntimeError(
                    f"marginal solve time {best*1e3:.1f} ms for {n} rows — "
                    "implausible and no safety slope available; rerun"
                )
            print(
                f"bench: 1M-row slope implausible ({best*1e3:.1f} ms); "
                "keeping the 50k safety number",
                file=sys.stderr,
            )
        else:
            _BEST_RESULT = _result(n / best)
    else:
        print(
            f"bench: skipping the 1M-row slope ({remaining():.0f}s left) — "
            "reporting the 50k safety slope",
            file=sys.stderr,
        )

    # Strict re-verify (round-5 VERDICT #1): during a tunnel-outage round
    # the only perf evidence is the committed strict_1m.json — when a
    # recovered window has budget left after the headline, re-measure the
    # two strict-mode rows at HEAD in the SAME driver-captured run so one
    # rc=0 re-certifies both the headline and the strict claims.  Extra
    # JSON keys ride along; the driver's schema only needs metric/value.
    if _BEST_RESULT is not None and remaining() >= 180:
        try:
            strict = {}
            committed = {}
            s1m = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "benchmarks", "strict_1m.json",
            )
            if os.path.exists(s1m):
                with open(s1m) as f:
                    committed = {
                        k: v.get("rate")
                        for k, v in json.load(f).get("results", {}).items()
                    }
            x_big = jnp.tile(x, (20, 1))
            n = x_big.shape[0]
            for row, trace in (
                ("strict-exact/dopri5-1.5e-6", "exact"),
                ("strict/dopri5-1.5e-6", "hutchinson"),
            ):
                if remaining() < 90:
                    break
                ms = dataclasses.replace(model, trace_mode=trace)
                t = repeat_slope(
                    lambda xx, kk, m=ms: m.log_prob(
                        xx, key=kk, atol=1.5e-6, rtol=1.5e-6,
                        options={"controller": "pi"},
                    )[0],
                    stack_of(x_big, 500), k2=2, reps=2,
                )
                if t > 0.05:
                    strict[row] = {
                        "rate": round(n / t, 1),
                        "committed": committed.get(row),
                    }
                    print(
                        f"bench strict re-verify {row}: {n/t:,.0f}/s "
                        f"(committed {committed.get(row)})",
                        file=sys.stderr,
                    )
            if strict:
                _BEST_RESULT = {**_BEST_RESULT, "strict_reverify": strict}
        except Exception as e:  # never let the re-verify cost the headline
            print(f"bench: strict re-verify failed ({e}); headline stands",
                  file=sys.stderr)

    _emit(_BEST_RESULT)


if __name__ == "__main__":
    main()
