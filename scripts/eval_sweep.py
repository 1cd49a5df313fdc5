#!/usr/bin/env python
"""Evaluate a checkpoint on all four fixed scenarios
(reference protocol: README.md:147-149 — wall, narrow_gap, random, passage).

Usage: python scripts/eval_sweep.py model_dir=runs/<run>/checkpoints [env.num_envs=N]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from mupe_tpu.envs.scenarios import EVAL_SCENARIOS
from mupe_tpu.harness import evaluate

if __name__ == "__main__":
    base = [a for a in sys.argv[1:] if not a.startswith("env.scenario_flag")]
    out_path = None
    for a in list(base):
        if a.startswith("out="):
            out_path = a.split("=", 1)[1]
            base.remove(a)
    results = {}
    for flag in EVAL_SCENARIOS:
        print(f"--- scenario: {flag}")
        res = evaluate(
            base
            + [
                f"env.scenario_flag={flag}",
                "env.use_random_cylinder=false",
                "env.use_eval=true",
                # the passage layout places 6 cylinders; obs (3-nearest)
                # and TP input (use_obstacles_tp off) are unaffected, so
                # trained checkpoints stay compatible
                "env.max_cylinders=6",
            ]
        )
        results[flag] = {
            k: res[k]
            for k in ("success", "first_capture_step",
                      "first_capture_step_p25", "first_capture_step_p50",
                      "first_capture_step_p75", "episodes", "collision",
                      "target_predicted_error", "detect_reward")
            if k in res
        }
    print(json.dumps(results, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
