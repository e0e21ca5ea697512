"""Data-parallel fused solves: shard_map over "batch" x Pallas kernels.

The scaling configuration for serving: problem instances shard across
every chip of the mesh (pure data parallelism — zero collectives), and
each chip runs the fused batch-in-lanes kernels of ops/pallas_riccati
on its local shard.  Combines with the "time"-axis PDP sharding
(parallel/pdp_sharded.py) only when single-solve latency at very long
horizons matters more than throughput; for solves/s this path is
optimal — ICI carries nothing.

Local shard size must satisfy the kernels' lane alignment
(B/n_devices % 128 == 0 on hardware).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pdp_lqr_tpu.ops import pallas_riccati as pr
from pdp_lqr_tpu.problem import ADMMIterates, LQRProblem


def solve(mesh: Mesh, problem: LQRProblem, it: ADMMIterates, x0,
          sigma: float, *, interpret: bool = False):
    """Batched inner solve, batch axis sharded over every mesh device.

    problem/it: batched pytrees (leading axis B, divisible by the mesh
    device count); x0 (B, nx).  Returns ws (B, N+1, nz) sharded the
    same way.
    """
    axes = mesh.axis_names

    def body(p, i, x):
        return pr.solve_lanes(p, i, x, sigma, interpret=interpret)

    spec = P(axes)  # shard leading batch dim over all axes jointly
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(problem, it, x0)
