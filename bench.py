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
import time

import jax
import jax.numpy as jnp

TARGET_PER_CHIP = 100_000 / 8.0  # v5p-16 == 8 chips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--horizon", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--model", default="quadrotor",
                    choices=["quadrotor", "mass_spring", "centroidal"],
                    help="BASELINE.json config family to bench")
    ap.add_argument("--solver", default="auto",
                    choices=["auto", "seq", "pdp", "assoc", "dense", "pallas"])
    ap.add_argument("--resident", action="store_true",
                    help="pallas only: keep stage data lanes-resident "
                         "(one-time layout prep excluded, as in ADMM/MPC "
                         "steady state)")
    args = ap.parse_args()

    backend = jax.default_backend()
    on_cpu = backend == "cpu"
    B = args.batch if args.batch is not None else (32 if on_cpu else 4096)
    N = args.horizon

    if args.model == "quadrotor":
        from __graft_entry__ import _quadrotor_batch

        problem, its, x0 = _quadrotor_batch(batch=B, N=N)
        dims = "nx=12, nu=4"
    else:
        import dataclasses

        import numpy as np

        from pdp_lqr_tpu.problem import init_iterates

        if args.model == "mass_spring":
            from pdp_lqr_tpu.models import mass_spring_chain

            base = mass_spring_chain(n_masses=20, N=N, dtype=jnp.float32)
        else:
            from pdp_lqr_tpu.models import centroidal

            base, _ = centroidal(N=N, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        problem = jax.tree.map(tile, base)
        problem = dataclasses.replace(
            problem,
            c=problem.c + jnp.asarray(
                rng.normal(size=problem.c.shape) * 0.001, jnp.float32
            ),
        )
        its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(problem)
        x0 = jnp.asarray(
            rng.normal(size=(B, base.nx)).astype(np.float32) * 0.1
        )
        dims = f"nx={base.nx}, nu={base.nu}"

    solver_name = args.solver
    if solver_name == "auto":
        # Fused Pallas kernels need lane-aligned batches on hardware.
        solver_name = "pallas" if (not on_cpu and B % 128 == 0) else "dense"

    step_args = None
    if solver_name == "pallas" and args.resident:
        from pdp_lqr_tpu.ops import pallas_riccati

        prep0 = pallas_riccati.prepare_lanes(problem, its, x0, 1e-6)
        step_args, nu_static = prep0[:-1], prep0[-1]

        def step(*arrays):
            return pallas_riccati.solve_prepared(
                arrays + (nu_static,), interpret=on_cpu
            )
    elif solver_name == "pallas":
        from pdp_lqr_tpu.ops import pallas_riccati

        def step(problem, its, x0):
            return pallas_riccati.solve_lanes(
                problem, its, x0, 1e-6, interpret=on_cpu
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
    label = solver_name + ("+resident" if args.resident else "")
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
