"""permon_tpu — TPU-native QP / FETI domain-decomposition solver framework.

A from-scratch reimplementation of the capabilities of PERMON
(Parallel Efficient Robust Modular Object Numerical; reference at
/root/reference — QP solvers MPRGP/SMALXE/PCPG, QP transform chain,
TFETI domain decomposition) designed for TPU:

- compute path: JAX / XLA / Pallas; everything in the iteration hot loop is
  jitted, static-shaped, and device-resident,
- parallelism: ``jax.sharding`` meshes + ``shard_map`` (subdomain data
  decomposition, link-distributed dual space, replicated coarse solves),
- operators are immutable pytree dataclasses composed functionally instead of
  a PETSc-style vtable object system,
- setup-time graph construction (gluing assembly, index manipulation) runs on
  host in numpy, mirroring the reference's PetscSF setup phase
  (reference: src/qp/impls/feti/qpfeti.c).

Float64 is enabled on import (PERMON is a double-precision library and the
KKT parity oracles require it); set the environment variable
``PERMON_TPU_X64=0`` before first import to opt out.
"""

import os as _os

if _os.environ.get("PERMON_TPU_X64", "1") != "0":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)


def enable_compilation_cache(cache_dir=None) -> bool:
    """Point jax's persistent compilation cache at a repo-local directory —
    the large-path executables compile in minutes over the axon tunnel (the
    1M-dof fast-path executable alone is ~half of a 75 s cold re-solve, and
    first solves were observed at 400-2200 s); caching makes that a one-time
    cost per configuration across processes.

    Activated lazily (not at import) because it must inspect the initialized
    backend: the CPU backend's AOT cache is skipped — its serialized
    executables are keyed loosely enough that entries compiled under
    different XLA_FLAGS reload with machine-feature mismatch warnings.
    Called automatically by the large-path solvers; PERMON_TPU_CACHE=0 opts
    out, PERMON_TPU_CACHE_DIR redirects.  Returns True when active."""
    import jax as _jax

    if _os.environ.get("PERMON_TPU_CACHE", "1") == "0":
        return False
    try:
        plat = _jax.devices()[0].platform
    except Exception:
        return False
    if plat == "cpu":
        return False
    cache_dir = cache_dir or _os.environ.get(
        "PERMON_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything with noticeable compile time, not just the >1 s
        # default threshold's survivors
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        return False
    return True

from .core.linop import (
    LinearOperator,
    Dense,
    Diagonal,
    Ell,
    Identity,
    OneRow,
    Penalized,
    Product,
    Scaled,
    Sum,
    Timer,
    Transpose,
    aslinearoperator,
)
from .core.dia import Dia
from .core.matutils import make_operator
from .core.eig import max_eigenvalue
from .core.convergence import ConvergedReason, Tolerances
from .core.precision import MixedPrecision, with_precision
from .core.detred import set_deterministic
from .core import vec
from .qp.qp import QP
from .solvers.driver import make_solver, solve
from .solvers.mprgp import MPRGPOptions, mprgp
from .sys.options import Options, solve_from_options
from . import viewers

__all__ = [
    "LinearOperator",
    "Dense",
    "Diagonal",
    "Ell",
    "Identity",
    "OneRow",
    "Penalized",
    "Product",
    "Scaled",
    "Sum",
    "Timer",
    "Transpose",
    "aslinearoperator",
    "Dia",
    "make_operator",
    "max_eigenvalue",
    "ConvergedReason",
    "Tolerances",
    "MixedPrecision",
    "with_precision",
    "set_deterministic",
    "vec",
    "QP",
    "solve",
    "make_solver",
    "MPRGPOptions",
    "mprgp",
    "Options",
    "solve_from_options",
    "enable_compilation_cache",
]
