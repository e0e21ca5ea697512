"""ctypes bindings for the native C++ batch engine (native/clqr_native.cpp).

The shared object is always compiled from source with g++ (no external
deps, a few seconds) into a cache directory keyed on a hash of the
source, so a checkout never ships or loads a prebuilt binary; zero-
egress environments are fine since nothing is downloaded.  If no
compiler is available the module degrades gracefully: ``available()``
returns False and callers fall back to the NumPy oracle.

Role: compiled independent parity witness + multithreaded CPU fallback
engine (see the C++ file's header).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "clqr_native.cpp"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return Path(base) / "pdp_lqr_tpu"


def _build() -> Optional[Path]:
    """Compile the engine into a source-hash-keyed cache path.

    Keying on content (not mtime) means a fresh checkout rebuilds
    rather than trusting any stale artifact, and an edited source
    invalidates automatically.  No -march=native: the cached .so may
    outlive the machine that built it.
    """
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = _cache_dir() / f"libclqr_native-{digest}.so"
    if so.exists():
        return so
    try:
        so.parent.mkdir(parents=True, exist_ok=True)
        tmp = so.with_suffix(f".tmp{os.getpid()}.so")
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared",
             "-fPIC", "-pthread", str(_SRC), "-o", str(tmp)],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so)  # atomic: concurrent builders race safely
        return so
    except (OSError, subprocess.SubprocessError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SRC.exists():
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.clqr_solve_batch.restype = ctypes.c_int
    lib.clqr_solve_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        dp, dp, dp, dp, dp, dp, dp, dp, dp,
        ctypes.c_double, ctypes.c_int, dp,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def solve_batch(problem, it, x0, sigma: float, n_threads: int = 0):
    """Batched inner solve on the CPU engine.

    problem/it: batched pytrees with leading axis B (as accepted by the
    JAX backends); x0 (B, nx).  Returns ws (B, N+1, nz) float64.

    The C engine consumes h already shifted by the proximal term
    (h - sigma * w, reference update_problem_data lqr_solver.hpp:41-56)
    and g = z - y/rho; both are computed here.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable (no g++?)")

    arr = lambda x: np.ascontiguousarray(np.asarray(x, np.float64))
    A = arr(problem.A)
    B, N, nx, _ = A.shape
    Bm = arr(problem.B)
    nu = Bm.shape[-1]
    nz = nx + nu
    c = arr(problem.c)
    H = arr(problem.H)
    w_it = arr(it.w)
    h = arr(problem.h) - sigma * w_it
    h[:, -1, :nu] = 0.0  # terminal stage has no controls
    D = arr(problem.D)
    nc = D.shape[-2]
    rho = arr(it.rho)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_rho = np.where(rho > 0, 1.0 / np.where(rho > 0, rho, 1.0), 0.0)
    g = arr(it.z) - inv_rho * arr(it.y)
    g = np.ascontiguousarray(g)
    h = np.ascontiguousarray(h)
    x0 = arr(x0)

    ws = np.zeros((B, N + 1, nz))
    dp = ctypes.POINTER(ctypes.c_double)
    as_p = lambda a: a.ctypes.data_as(dp)
    rc = lib.clqr_solve_batch(
        B, N, nx, nu, nc,
        as_p(A), as_p(Bm), as_p(c), as_p(H), as_p(h),
        as_p(D), as_p(rho), as_p(g), as_p(x0),
        ctypes.c_double(sigma), n_threads, as_p(ws),
    )
    if rc != 0:
        raise RuntimeError(f"clqr_solve_batch failed with code {rc}")
    return ws
