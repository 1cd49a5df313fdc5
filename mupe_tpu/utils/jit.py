"""Central `jax.jit` wrapper carrying TPU compiler options.

XLA:TPU caps per-kernel scoped-VMEM stacks at 16 MB by default — the
binding constraint on every Pallas tile size in `ops/fused_encoder.py`
(round 4 measured: single-net bwd @tile 1024 needs 25.5 MB and was
rejected, forcing split launches at tile 640).  The cap is NOT the
hardware's (v5e has 128 MB VMEM/core); it is a compiler default, and it
can be raised per-program via the proto-backed debug option
`xla_tpu_scoped_vmem_limit_kib`, which the axon relay forwards to the
remote compiler.

`mupe_jit` is `jax.jit` plus that option on TPU backends, controlled by
``MUPE_SCOPED_VMEM_KIB`` (0 disables the override).  Non-TPU backends
never receive the flag (their flag parsers reject unknown options).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax

SCOPED_VMEM_KIB = int(os.environ.get("MUPE_SCOPED_VMEM_KIB", "0"))
# The PPO update program hosts the big Pallas bwd launches whose stacks
# exceed the 16 MB default (the correct grid-77 launch at the production
# bwd tile 640 needs 16.28 MB); the ROLLOUT program, by contrast, is all
# small XLA-fused kernels and measurably REGRESSES under a large scoped
# limit (raising it globally to 64 MB cost ~8% e2e, r5 sweep 1).  So the
# limit is per-role: update programs get MUPE_VMEM_KIB_UPDATE, everything
# else the global MUPE_SCOPED_VMEM_KIB (0 = compiler default).
UPDATE_VMEM_KIB = int(os.environ.get("MUPE_VMEM_KIB_UPDATE", "27648"))


def tpu_compiler_options(role: Optional[str] = None) -> Optional[dict]:
    """Compiler options for the current backend (None off-TPU)."""
    kib = UPDATE_VMEM_KIB if role == "update" else SCOPED_VMEM_KIB
    if kib > 0 and jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": kib}
    return None


def mupe_jit(fun: Any = None, role: Optional[str] = None, **kwargs) -> Any:
    """Drop-in `jax.jit` replacement attaching the TPU compiler options.

    Usable both as `@mupe_jit` and `mupe_jit(f, out_shardings=...)`.
    `role="update"` selects the update-program scoped-VMEM limit.
    """
    opts = tpu_compiler_options(role)
    if opts is not None and "compiler_options" not in kwargs:
        kwargs["compiler_options"] = opts
    if fun is None:
        return lambda f: jax.jit(f, **kwargs)
    return jax.jit(fun, **kwargs)
