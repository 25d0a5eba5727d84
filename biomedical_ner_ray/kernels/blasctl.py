"""Pin the in-process BLAS to one thread for bit-deterministic numpy.

OpenBLAS parallelizes GEMM reductions, so the float64 sums that come
out of ``np.dot`` depend on the thread count the host environment
happens to set (``OMP_NUM_THREADS`` et al.). For most of the engine
that is irrelevant — exchanges, hashes and integer kernels are exact —
but gradient-descent TRAINING compounds those last-ulp differences
over thousands of matmuls into genuinely different checkpoints
(measured: the same combi fit converges at epoch 34 under 1 thread vs
epoch 22 under 32, with held-out precision 0.967 vs 0.999). Any
artifact whose VALUE is contract-checked must therefore be built under
a fixed reduction order.

``single_threaded_blas()`` pins the already-loaded OpenBLAS to one
thread via its own C API (``openblas_set_num_threads``) and restores
the previous setting on exit. Inside Ray workers this is a no-op (Ray
pins ``OMP_NUM_THREADS=1`` per worker); on an arbitrary driver it is
the difference between a reproducible artifact and a
thread-count-flavored one. If the loaded BLAS is not OpenBLAS (or
exposes no thread API) the context degrades to a no-op — the engine
still runs, it just loses the bit-determinism guarantee on that host.
"""

from __future__ import annotations

import ctypes
from contextlib import contextmanager

_HANDLES: list[tuple] | None = None


def _openblas_handles() -> list[tuple]:
    """(set_fn, get_fn) pairs for every OpenBLAS mapped into the
    process (numpy may load the 64-bit-int suffixed build, scipy a
    plain one — pin all of them). Resolved once, cached."""
    global _HANDLES
    if _HANDLES is not None:
        return _HANDLES
    import numpy  # noqa: F401  — ensures the BLAS .so is mapped

    paths: set[str] = set()
    try:
        with open("/proc/self/maps") as f:
            for line in f:
                part = line.rsplit(" ", 1)[-1].strip()
                if "openblas" in part.lower() and part.endswith(".so"):
                    paths.add(part)
    except OSError:
        pass
    handles = []
    for path in sorted(paths):
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        for suffix in ("64_", ""):
            set_fn = getattr(lib, f"openblas_set_num_threads{suffix}", None)
            get_fn = getattr(lib, f"openblas_get_num_threads{suffix}", None)
            if set_fn is not None and get_fn is not None:
                get_fn.restype = ctypes.c_int
                handles.append((set_fn, get_fn))
                break
    _HANDLES = handles
    return handles


@contextmanager
def single_threaded_blas():
    """Pin every loaded OpenBLAS to 1 thread; restore on exit."""
    handles = _openblas_handles()
    prev = [get_fn() for _set_fn, get_fn in handles]
    for set_fn, _get_fn in handles:
        set_fn(1)
    try:
        yield
    finally:
        for (set_fn, _get_fn), n in zip(handles, prev):
            set_fn(max(int(n), 1))
