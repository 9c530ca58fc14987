"""Global numeric configuration for meshfem_tpu.

The reference framework (MeshFEM) computes everything in ``double``
(``Types.hh:8``: ``using Real = double``).  On TPU, float64 is emulated and
slow, while float32 + float64 residual accumulation (iterative refinement)
recovers double-precision accuracy at float32 speed.  We therefore make the
working dtype configurable:

* ``real_dtype()``      -- dtype for mesh geometry / assembled operators.
* ``solve_dtype()``     -- dtype used inside iterative solvers.
* ``accum_dtype()``     -- dtype for reductions (dot products, residual norms).

x64 is enabled at import time (FEM accuracy targets of 1e-8 relative error
require double precision paths); set ``MESHFEM_TPU_X64=0`` to opt out before
importing meshfem_tpu.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_X64 = os.environ.get("MESHFEM_TPU_X64", "1") != "0"
if _X64:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the remote TPU toolchain takes minutes to
# compile large kernels; caching makes every later process hit in ~40 ms.
_CACHE = os.environ.get("MESHFEM_TPU_COMPILE_CACHE",
                        os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache"))
if _CACHE and _CACHE != "0":
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(_CACHE))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_REAL = jnp.float64 if _X64 else jnp.float32
_INDEX = jnp.int32


def real_dtype():
    """Default floating dtype for geometry and assembly (f64 like the reference)."""
    return _REAL


def index_dtype():
    """Default integer dtype for connectivity arrays."""
    return _INDEX


def accum_dtype():
    """Dtype for scalar reductions inside solvers."""
    return jnp.float64 if _X64 else jnp.float32


def set_real_dtype(dtype) -> None:
    global _REAL
    _REAL = jnp.dtype(dtype)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)
