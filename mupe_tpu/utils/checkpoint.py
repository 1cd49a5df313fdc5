"""Checkpoint / resume via orbax.

Fixes the reference's gaps (SURVEY §5.4): the reference saves only
{TP, critic, actor_params, value_normalizer} and silently rebuilds the
optimizer on load (learning/mappo.py:477-491).  Here two artifacts are
written per save (harness.train):

  * ``step_N`` — the complete learner state (`MAPPOState`: params +
    optimizer states + value normalizer + TP), the `model_dir` warm-start
    target;
  * ``full/step_N`` — the entire iteration carry: learner state, env state
    including curriculum scalars (``v_prey``, ``update_epoch``), the AEG
    `GenBufferState` and the PRNG key — the `resume_dir` target for exact
    resume (train → save → load → bit-identical continuation).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _mask_empty(tree: Any) -> Any:
    """Replace zero-size leaves with 1-element placeholders — orbax refuses
    zero-size arrays (e.g. Hover's latency ring buffer with latency off).
    `load_checkpoint` restores the target's own zero-size leaves."""
    import numpy as np

    def mask(x):
        if hasattr(x, "size") and x.size == 0:
            return np.zeros((1,), np.asarray(x).dtype)
        return x

    return jax.tree_util.tree_map(mask, tree)


def save_checkpoint(path: str | Path, step: int, payload: Any) -> None:
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    if jax.process_count() == 1:
        # host copy → orbax writes plain numpy, no device coordination
        payload = jax.device_get(payload)
    # multi-host: all ranks call save with the same path and the global
    # (replicated) arrays; orbax's primary host does the writing
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / f"step_{step}", _mask_empty(payload), force=True)


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
            restored = ckptr.restore(latest, item=_mask_empty(target))
            keep = lambda t, r: t if (hasattr(t, "size") and t.size == 0) else r
            return jax.tree_util.tree_map(keep, target, restored)
        return ckptr.restore(latest)
