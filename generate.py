#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/generate.py)."""
from mcgm_tpu.cli.sample import main

if __name__ == "__main__":
    main("generate")
