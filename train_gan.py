#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/train_gan.py)."""
from mcgm_tpu.cli.train import main

if __name__ == "__main__":
    main(model_name="mcgan")
