#!/usr/bin/env python
"""Train with the Adaptive Environment Generator (reference: scripts/train_generator.py)."""
import sys

from mupe_tpu.harness import train

if __name__ == "__main__":
    train(sys.argv[1:], default_task="HideAndSeek_envgen")
