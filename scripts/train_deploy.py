#!/usr/bin/env python
"""Stage-2 deployment refinement with the smoothness-coefficient ramp
(reference: scripts/train_deploy.py; start from a stage-1 checkpoint via model_dir=...)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from mupe_tpu.harness import train

if __name__ == "__main__":
    train(sys.argv[1:], default_task="HideAndSeek", deploy_stage=True)
