#!/usr/bin/env python
"""Train with the Adaptive Environment Generator (reference: scripts/train_generator.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from mupe_tpu.harness import train

if __name__ == "__main__":
    train(sys.argv[1:], default_task="HideAndSeek_envgen")
