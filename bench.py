"""Benchmark driver: batched ACOPF SQP throughput on the current backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric (BASELINE.json): SQP iterations/s per chip on batched ACOPF.
``vs_baseline`` is the measured speedup of the batched TPU-native solve over
solving the same instances one-at-a-time (the reference's serial, one-QP-at-
a-time execution model, sqp_trust_region.jl:124 — the reference itself
publishes no numbers, BASELINE.md).

Environment knobs:
  SQP_BENCH_CASE    bus count (5/14/30/118 = vendored MATPOWER data; 9 =
                    built-in; multiples of 30 = case30 replicas; else
                    synthetic)                          (default 30)
  SQP_BENCH_BATCH   instance batch size                 (default 32)
  SQP_BENCH_DTYPE   float64 | float32                   (default float64;
                    the KKT factorization runs in float32 via mixed_ir)
  SQP_BENCH_PREC    direct | mixed_ir | mixed_plane | mixed_polish
                                                        (default mixed_ir)
  SQP_BENCH_SHIFT   eigh | power | gershgorin           (default eigh)
  SQP_BENCH_STRUCTURED  1 = block-structured (BBD) KKT path
  SQP_BENCH_WORKER  1 = run the measurement in-process (bypass the
                    supervisor child process / fallback ladder)
"""

import json
import os
import subprocess
import sys
import time


def _supervise():
    """Run the measurement in a child process; fall back to the proven-safe
    configuration if the fast one dies.

    The axon TPU tunnel kills a faulting program with a generic
    "UNAVAILABLE: TPU device error" that takes the whole process down and can
    leave the in-process TPU client unusable — recovery has to happen across
    a process boundary.  Measured on v5e (round 2): mixed_plane at batch 32
    faults deterministically while the same program at batch 1 and
    mixed_ir+eigh at batch 32 both pass, so a config-level fallback ladder is
    the difference between a bench number and no bench number.
    """
    safe = {"SQP_BENCH_PREC": "mixed_ir", "SQP_BENCH_SHIFT": "eigh",
            "SQP_BENCH_STRUCTURED": "0", "SQP_BENCH_CASE": "30"}
    ladders = [{}]
    # only append the fallback rung when it actually changes the config —
    # otherwise a genuine (non-config) failure would be re-run verbatim
    if any(os.environ.get(k, v) != v for k, v in safe.items()):
        ladders.append(safe)
    for i, overrides in enumerate(ladders):
        env = dict(os.environ, SQP_BENCH_WORKER="1", **overrides)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env)
        if r.returncode == 0:
            return 0
        print((f"bench attempt {i} failed (rc={r.returncode}); falling back"
               if i + 1 < len(ladders)
               else f"bench failed (rc={r.returncode})"),
              file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__" and os.environ.get("SQP_BENCH_WORKER") != "1":
    sys.exit(_supervise())

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from sqpsolver_tpu import Parameters  # noqa: E402
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios  # noqa: E402
from sqpsolver_tpu.models.power import case9, synthetic_case  # noqa: E402
from sqpsolver_tpu.parallel.batch import (  # noqa: E402
    batch_data,
    make_batch_solver,
    make_chunked_batch_solver,
    summarize_batch,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    platform = jax.devices()[0].platform
    nbus = int(os.environ.get("SQP_BENCH_CASE", "30"))
    batch = int(os.environ.get("SQP_BENCH_BATCH", "32"))
    structured = os.environ.get("SQP_BENCH_STRUCTURED", "0") == "1"
    default_dtype = "float64"
    dtype = os.environ.get("SQP_BENCH_DTYPE", default_dtype)

    # real vendored MATPOWER data where available (case5/9/14/30 — VERDICT r1
    # item 3); multiples of 30 are interconnected replicas of the validated
    # case30 (real physics at case118/case300 scale, models/power.py
    # replicate_case); other sizes use the seeded synthetic generator
    if nbus in (5, 14, 30, 118):
        from sqpsolver_tpu.models.matpower import load_case

        case = load_case(f"case{nbus}")
    elif nbus == 9:
        case = case9()
    elif nbus % 30 == 0:
        from sqpsolver_tpu.models.matpower import load_case
        from sqpsolver_tpu.models.power import replicate_case

        case = replicate_case(load_case("case30"), nbus // 30)
    else:
        case = synthetic_case(nbus, seed=1)
    nlp = acopf_polar(case)
    log(f"backend={platform} case={case.name} n={nlp.n} m={nlp.m} "
        f"batch={batch} dtype={dtype} structured={structured}")

    params = Parameters(
        max_iter=int(os.environ.get("SQP_BENCH_MAXIT", "40")),
        OutputFlag=0,
        tol_infeas=1.0e-6,
        tol_residual=1.0e-4,
        qp_max_iter=30,
        dtype=dtype,
        # measured on-chip (v5e, real case30 b32, round 2): mixed_ir 50.2
        # iter/s vs mixed_plane 46.9 — the plane's per-QP-iteration advantage
        # (2.7x at case118 sizes, scripts/profile_qp118.py) does not carry
        # down to 143-dim KKT systems.  hessian_shift="power" (the Lanczos
        # bound) FAULTS the axon device at batch 32 (deterministic, passes at
        # batch 1 — see scripts/tpu_smoke.py); "eigh" runs everywhere.
        kkt_precision=os.environ.get("SQP_BENCH_PREC", "mixed_ir"),
        # "ladder" (round 4): NO global eigenvalue shift — the KKT
        # factorization's delta ladder does minimal inertia correction, the
        # reference's Ipopt strategy.  The global shift was the hidden
        # throughput killer at case118: a ~9x over-shift damped every late
        # step (67 SQP iters vs 7 with ladder, and ladder lands exactly on
        # the published optimum).  "eigh" stays the generic-NLP default in
        # Parameters (small nonconvex HS problems need a true
        # convexification).
        hessian_shift=os.environ.get("SQP_BENCH_SHIFT", "ladder"),
        kkt_ir_steps=int(os.environ.get("SQP_BENCH_IR", "2")),
        # rescue OFF by default on the bench: the f64 stall-rescue phase
        # factors in EMULATED f64 on TPU, and under batched max-over-lanes
        # semantics one rescue-bound lane drags every lane through those
        # trips (measured: case30 b32 ladder 1.9 s/batched-iter with rescue
        # vs 28 iter/s serial; CPU validates 32/32 convergence without it —
        # a stalled QP takes the TR-halving retry path, PARITY.md #13)
        qp_rescue=os.environ.get("SQP_BENCH_RESCUE", "0") == "1",
        schur_cap=int(os.environ.get("SQP_BENCH_SCHUR_CAP", "-1")),
        kkt_structured=structured,
        # ACOPF starts are linear-feasible (ref-angle row at 0): skip the
        # projection QP trace entirely — one fewer IPM instantiation of
        # remote-compile time
        init_projection="off",
    )
    import jax.numpy as jnp

    jdtype = jnp.float64 if dtype == "float64" else jnp.float32

    # chunked execution (default on for the axon/TPU backend): the tunnel
    # kills any single device execution at 60 s (parallel.batch.
    # make_chunked_batch_solver docstring) — large batches and case118+
    # never finish in one call.  Chunking costs ~ms/chunk of host round-trip.
    chunked_env = os.environ.get("SQP_BENCH_CHUNKED", "")
    if chunked_env == "":
        # auto: chunk only where a monolithic batched run could cross the
        # 60 s watchdog (measured: case30 b32 dense runs ~6 s monolithic —
        # chunking's ~0.2-0.3 s axon round-trip per chunk would only slow
        # it; case118/big-batch/structured runs all crossed 60 s).
        chunked = platform != "cpu" and (
            nbus >= 118 or batch > 32 or structured
        )
    else:
        chunked = chunked_env == "1"
    log(f"chunked={chunked}")

    # device-batch cap: a COLD batched SQP iteration at case30 b256 costs
    # ~15 s on v5e, so b1024 would cross the 60 s watchdog inside ONE
    # iteration; slices share a compiled program and the chip is
    # throughput-bound at these sizes (batch.make_chunked_batch_solver).
    # Structured case118 cold iterations are ~4-8x dearer than dense —
    # default the cap lower there.
    rescue_on = os.environ.get("SQP_BENCH_RESCUE", "0") == "1"
    sub_batch = int(
        os.environ.get(
            "SQP_BENCH_SUBBATCH",
            # rescue-on runs use the SAME size-keyed width rule as the
            # rescue fallback (batch._fb_width — keyed on nlp.n, not bus
            # count, so case30 replicas at 60-90 buses get a narrow slab
            # too): a single rescue-storm SQP iteration (one QP, dozens of
            # f64-emulated-factor trips) at case118 W=8 measured 44-60+ s —
            # the watchdog-atomic unit; W=2/3 trip an XLA MSA compiler
            # crash on degenerate dims, so the floor is 4
            ("8" if nlp.n < 160 else "4") if rescue_on
            else ("8" if structured else "128"),
        )
    )

    # micro-stepped rescue (VERDICT r4 item 2): at case118 scale one
    # rescue/restoration QP (dozens of f64-emulated factor trips) exceeds
    # the 60 s watchdog even at slab width 4 — the fallback twin advances
    # in-flight QPs at most this many f64 trips per device call.  0 = off.
    micro_trips = int(
        os.environ.get(
            "SQP_BENCH_MICRO",
            "4" if (not structured and nlp.n >= 160) else "0",
        )
    )
    if micro_trips:
        log(f"micro_trips={micro_trips}")

    def build_solver():
        if chunked:
            return make_chunked_batch_solver(
                nlp, params, sub_batch=sub_batch, log=log,
                rescue_fallback=not params.qp_rescue,
                micro_trips=micro_trips,
            )
        return make_batch_solver(nlp, params)

    solver = build_solver()
    # spread 0.03: every scenario stays inside case30's feasible region
    # (0.05 pushes 1-2 of 32 past the generation limits into local
    # infeasibility — a correct status-2 answer, but noise in a throughput
    # benchmark meant to measure converged solves)
    theta = load_scenarios(case, batch, seed=7, spread=0.03)
    data = batch_data(nlp, batch, theta=theta, dtype=jdtype)

    # warm-up / compile
    t0 = time.time()
    out = solver(data)
    jax.block_until_ready(out.x)
    t_first = time.time() - t0
    log(f"compile+first-run: {t_first:.1f}s")
    summ = summarize_batch(out)
    log(f"batched summary: {summ}")

    # timed batched runs: up to 3 reps, but stop after the first once the
    # measured wall makes further reps a poor use of the budget (a dense
    # case118 two-pass rescue solve runs ~30 min per rep — three reps of it
    # would starve the serial baseline and the driver's time budget).
    # SQP_BENCH_TIME_WARMUP=1 uses the warm-up run itself as the (single)
    # timed sample — valid ONLY with a fully warm persistent compile cache,
    # where "compile"+first-run is host tracing (seconds) plus the run.
    if os.environ.get("SQP_BENCH_TIME_WARMUP") == "1":
        t_batched = t_first
        log("timed reps: warmup-timed (assumes warm compile cache)")
    else:
        max_reps = int(os.environ.get("SQP_BENCH_REPS", "3"))
        t0 = time.time()
        reps = 0
        for _ in range(max_reps):
            out = solver(data)
            jax.block_until_ready(out.x)
            reps += 1
            if time.time() - t0 > 150.0:
                break
        t_batched = (time.time() - t0) / reps
        log(f"timed reps: {reps}")
    total_iters = int(np.asarray(out.iterations).sum())
    batched_rate = total_iters / t_batched
    # solves/s is the honest cross-config metric: iteration economics vary
    # by algorithm config (the ladder shift solves case118 in 7 iterations
    # where the eigh shift takes 67 — iter/s alone would reward the slower
    # config), so time-to-solution per converged instance decides.
    n_ok = int(np.isin(np.asarray(out.status), [0, 1, 6]).sum())
    solve_rate = n_ok / t_batched
    log(f"batched: {total_iters} SQP iters in {t_batched:.3f}s "
        f"-> {batched_rate:.1f} iter/s; {n_ok} solves -> "
        f"{solve_rate:.2f} solves/s")

    # serial baseline: one instance at a time (the reference's execution
    # model).  Statistical honesty (VERDICT r4 item 4): >= 8 instances,
    # repeated, per-rep spread reported — the r4 headline rested on a
    # single 4-instance draw whose serial rate swung 2x between runs.
    #
    # Path selection by size:
    #  * below case118 scale: MONOLITHIC rescue-off program.  A single-lane
    #    solve is far under the 60 s watchdog and converges without the f64
    #    rescue at these sizes; the chunked host loop would handicap the
    #    baseline (measured: serial case30 24.2 -> 15.3 iter/s chunked),
    #    and rescue-on pins the chunk limit at 1 (~0.2-0.3 s of axon
    #    round-trip per single SQP iteration).
    #  * case118+: rescue-on AND chunked, like the batched path.  Rescue-off
    #    serial at this scale measures failures, not solves (the f32-only
    #    QPs stall every lane; the reference always factors in full
    #    f64/ma57), and a monolithic rescue-on lane can cross the watchdog.
    # structured exemption: the BBD path with the ladder shift converges
    # rescue-free at case118 (BASELINE.md r4: 7 iters, 93 trips, published
    # optimum on CPU) — forcing its serial baseline through the f64 rescue
    # twin would only slow the baseline we are trying to beat fairly
    serial_needs_rescue = (
        nbus >= 118 and not params.qp_rescue and not structured
    )
    serial_params = (
        params.replace(qp_rescue=True) if serial_needs_rescue else params
    )
    serial_chunked = chunked and (nbus >= 118 or params.qp_rescue)
    if serial_chunked:
        serial_solver = make_chunked_batch_solver(
            nlp, serial_params, micro_trips=micro_trips
        )
    else:
        serial_solver = make_batch_solver(nlp, serial_params)  # b=1 slices
    n_serial = (
        int(os.environ.get("SQP_BENCH_SERIAL_N", "0")) or min(8, batch)
    )
    reps_serial = int(os.environ.get("SQP_BENCH_SERIAL_REPS", "2"))
    one = jax.tree.map(lambda a: a[:1], data)
    o = serial_solver(one)
    jax.block_until_ready(o.x)  # compile
    iters_serial = 0
    solves_serial = 0
    t_serial = 0.0
    rep_rates = []
    serial_status = []
    for rep in range(reps_serial):
        t0 = time.time()
        it_rep = 0
        lanes_rep = 0
        for i in range(n_serial):
            one = jax.tree.map(lambda a: a[i : i + 1], data)
            o = serial_solver(one)
            jax.block_until_ready(o.x)
            it_rep += int(np.asarray(o.iterations).sum())
            lanes_rep += 1
            if rep == 0:
                serial_status.append(int(np.asarray(o.status)[0]))
            # budget guard: heavy configs (case118 rescue lanes run ~2 min
            # each) cap the baseline at >=4 lanes x 1 rep instead of
            # starving the run; the spread column then reflects what was
            # actually affordable
            if time.time() - t0 > 600.0 and lanes_rep >= 4:
                break
        dt = time.time() - t0
        t_serial += dt
        iters_serial += it_rep
        solves_serial += lanes_rep
        rep_rates.append(it_rep / dt)
        if rep == 0:
            n_serial = lanes_rep  # later reps mirror what rep 0 afforded
        if t_serial > 600.0:
            reps_serial = rep + 1
            break
    serial_rate = iters_serial / t_serial
    serial_solve_rate = solves_serial / t_serial
    spread = (
        (max(rep_rates) - min(rep_rates)) / serial_rate
        if len(rep_rates) > 1
        else 0.0
    )
    log(f"serial: {iters_serial} SQP iters in {t_serial:.3f}s "
        f"({n_serial} lanes x {reps_serial} reps) "
        f"-> {serial_rate:.1f} iter/s; {serial_solve_rate:.2f} solves/s  "
        f"rep rates={['%.1f' % r for r in rep_rates]} "
        f"spread={spread:.1%}  status={serial_status}")
    if not all(s in (0, 1, 6) for s in serial_status):
        log("WARNING: serial baseline lanes did not converge - "
            "vs_baseline is not meaningful")

    vs = batched_rate / serial_rate if serial_rate > 0 else 0.0

    # ---- MFU accounting (VERDICT r2 item 7): analytic FLOPs / wall / peak --
    from sqpsolver_tpu.algorithms.common import schur_cap_for
    from sqpsolver_tpu.utils import flops as fl

    qp_iters_total = int(np.asarray(out.qp_iters_total).sum())
    bbd_dims = None
    shift_eff = params.hessian_shift
    if structured:
        from sqpsolver_tpu.ops.kkt_bbd import part_schur_cap
        from sqpsolver_tpu.structure import build_block_structure

        gl = np.asarray(nlp.g_l, np.float64)
        gu = np.asarray(nlp.g_u, np.float64)
        bs = build_block_structure(
            nlp.n, nlp.m, nlp.structure, np.isfinite(gl) & (gl == gu),
            n_parts=(params.kkt_parts or None),
        )
        n_schur = bs.P * part_schur_cap(bs)
        bbd_dims = (bs.P, bs.nd, bs.ns, bs.mr, n_schur)
        if shift_eff not in ("ladder", "gershgorin"):
            # any eigenvalue-estimating mode dispatches to the matvec-only
            # Lanczos bound on the structured path (sqp_tr._convexify_impl)
            shift_eff = "power"
        log(f"bbd dims: P={bs.P} nd={bs.nd} ns={bs.ns} mr={bs.mr} "
            f"m_eq={bs.m_eq} n_schur={n_schur}")
    fb = fl.total_flops(
        n=nlp.n, m=nlp.m,
        sqp_iters_total=total_iters, qp_iters_total=qp_iters_total,
        hessian_shift=shift_eff,
        # BbdOperator floors its inner refinement at max(2, kkt_ir_steps)
        ir_steps=(max(2, params.kkt_ir_steps) if structured
                  else params.kkt_ir_steps),
        schur_cap=schur_cap_for(params, nlp), bbd_dims=bbd_dims,
        shift_iters=params.hessian_shift_iters,
    )
    peak = fl.chip_peak_bf16(jax.devices()[0]) if platform != "cpu" else 0.0
    achieved = fb["total"] / t_batched
    mfu = achieved / peak if peak else 0.0
    log(f"analytic flops/run: {fb['total']:.3e} "
        f"({qp_iters_total} IPM trips, {total_iters} SQP iters); "
        f"breakdown: " + ", ".join(
            f"{k}={v / fb['total']:.0%}" for k, v in fb.items()
            if k != "total"))
    log(f"achieved {achieved / 1e12:.4f} TFLOP/s -> "
        f"mfu_bf16_peak={mfu:.5f} "
        f"mfu_f32_eff={mfu * fl.F32_PASSES:.5f}")

    print(
        json.dumps(
            {
                "metric": "batched_acopf_sqp_iters_per_sec",
                "value": round(batched_rate, 2),
                "unit": "SQP-iter/s",
                "vs_baseline": round(vs, 2),
                "solves_per_sec": round(solve_rate, 3),
                "n_converged": n_ok,
                "vs_baseline_solves": round(
                    solve_rate / serial_solve_rate, 2
                ) if serial_solve_rate > 0 else 0.0,
                "mfu": round(mfu, 6),
                "mfu_f32_eff": round(mfu * fl.F32_PASSES, 6),
                "analytic_tflops_per_s": round(achieved / 1e12, 4),
                "case": case.name,
                "batch": batch,
                "structured": structured,
            }
        )
    )


if __name__ == "__main__":
    main()
