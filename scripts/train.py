#!/usr/bin/env python
"""Train MAPPO/PPO on a task (reference: scripts/train.py).

Usage: python scripts/train.py task=Hover env.num_envs=1024 algo.train_every=32 max_iters=100
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from mupe_tpu.harness import train

if __name__ == "__main__":
    train(sys.argv[1:], default_task="HideAndSeek")
