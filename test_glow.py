#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/test_glow.py)."""
from mcgm_tpu.cli.test_model import main

if __name__ == "__main__":
    main(model_name="mcglow")
