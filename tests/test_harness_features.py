"""Harness observability features: in-training eval, NaN guard, profiling
flag plumbing (VERDICT r1 items 6 and 9)."""
import csv
import glob

import jax.numpy as jnp
import numpy as np

from mupe_tpu.harness import train
from mupe_tpu.utils.debug import guard_train_iter


def test_in_training_eval_rows(tmp_path):
    train(
        [
            "env.num_envs=8",
            "env.max_episode_length=8",
            "algo.train_every=8",
            "algo.num_minibatches=2",
            "max_iters=2",
            "eval_interval=1",
            "log_interval=1",
            "save_interval=-1",
            f"run_dir={tmp_path}",
            "run_name=evalrun",
        ],
        default_task="Hover",
    )
    rows = list(csv.DictReader(open(tmp_path / "evalrun" / "metrics.csv")))
    eval_rows = [r for r in rows if r.get("eval/pos_error")]
    assert eval_rows, "no eval/... rows in the run CSV"
    assert np.isfinite(float(eval_rows[-1]["eval/pos_error"]))


def test_guard_train_iter_nan_recovery():
    calls = {"n": 0}

    def bad_iter(carry):
        calls["n"] += 1
        if calls["n"] == 2:  # inject a NaN update on the second call
            return carry + 1.0, {"policy_loss": jnp.nan}, {}
        return carry + 1.0, {"policy_loss": jnp.asarray(0.5)}, {}

    guarded = guard_train_iter(bad_iter)
    carry = jnp.asarray(0.0)
    carry, m, s = guarded(carry)
    assert float(carry) == 1.0
    carry, m, s = guarded(carry)  # NaN injected → carry must NOT advance
    assert float(carry) == 1.0
    assert float(s["nan_skipped"]) == 1.0
    carry, m, s = guarded(carry)
    assert float(carry) == 2.0
