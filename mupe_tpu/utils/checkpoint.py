"""Checkpoint / resume via orbax.

Fixes the reference's gaps (SURVEY §5.4): the reference saves only
{TP, critic, actor_params, value_normalizer} and silently rebuilds the
optimizer on load (learning/mappo.py:477-491).  Here the checkpoint carries
the complete `MAPPOState` (params + optimizer states + value normalizer +
TP) plus the env curriculum scalars and the AEG buffer when present.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str | Path, step: int, payload: Any) -> None:
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / f"step_{step}", payload, force=True)


def load_checkpoint(path: str | Path, target: Optional[Any] = None) -> Any:
    """Load the latest `step_*` checkpoint under `path` (or `path` itself)."""
    path = Path(path).absolute()
    if path.name.startswith("step_"):
        latest = path
    else:
        steps = sorted(
            path.glob("step_*"), key=lambda p: int(p.name.split("_")[1])
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        latest = steps[-1]
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(latest, item=target)
        return ckptr.restore(latest)
