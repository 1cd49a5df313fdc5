#!/usr/bin/env python
"""Deterministic evaluation on a fixed scenario (reference: scripts/eval.py).

Usage: python scripts/eval.py env.scenario_flag=wall env.use_random_cylinder=false model_dir=runs/.../checkpoints
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from mupe_tpu.harness import evaluate

if __name__ == "__main__":
    evaluate(sys.argv[1:])
