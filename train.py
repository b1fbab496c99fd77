#!/usr/bin/env python
"""Top-level trainer entry point (mirrors the reference train.py CLI)."""
from massive_marl_tpu.cli.train import train

if __name__ == "__main__":
    train()
