"""Benchmark / example problem families.

These mirror the reference's example driver (examples/lqr_example.cpp)
and the BASELINE.json benchmark configs: double integrator, quadrotor
MPC (with optional box + thrust-cone constraints), mass-spring-damper
chain, centroidal MPC with friction cones, and random LQ instances for
randomized parity testing.
"""

from pdp_lqr_tpu.models.double_integrator import double_integrator
from pdp_lqr_tpu.models.quadrotor import quadrotor, QUADROTOR_X0
from pdp_lqr_tpu.models.mass_spring import mass_spring_chain
from pdp_lqr_tpu.models.random_lq import random_lq
from pdp_lqr_tpu.models.centroidal import centroidal
from pdp_lqr_tpu.models.rocket import rocket, rocket_x0

__all__ = [
    "double_integrator",
    "quadrotor",
    "QUADROTOR_X0",
    "mass_spring_chain",
    "random_lq",
    "centroidal",
    "rocket",
    "rocket_x0",
]
