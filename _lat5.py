import time, jax, jax.numpy as jnp
from pdp_lqr_tpu.models import quadrotor
from pdp_lqr_tpu.solvers import admm

_fence = jax.jit(lambda w: jnp.all(jnp.isfinite(w)))
def _time(fn, *args, reps=20):
    out = fn(*args); assert bool(_fence(out))
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    bool(_fence(out))
    return (time.perf_counter() - t0) / reps

problem, _ = quadrotor(N=64, constrained=True, dtype=jnp.float32)
x0 = jnp.zeros(12, jnp.float32)
for backend in ("seq", "dense"):
    def st(iters):
        return admm.ADMMSettings(max_iter=iters, rho_update_interval=iters,
                                 adaptive_rho=False, eps_abs=1e-4,
                                 eps_rel=1e-4, backend=backend)
    f1 = jax.jit(lambda p, x: admm.solve(p, x, (), st(20))[0])
    f2 = jax.jit(lambda p, x: admm.solve(p, x, (), st(40))[0])
    tK, t2K = _time(f1, problem, x0), _time(f2, problem, x0)
    print(f"{backend}: {(t2K-tK)/20*1e6:.1f} us/iter", flush=True)
