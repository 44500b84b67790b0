#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/transit.py)."""
from mcgm_tpu.cli.sample import main

if __name__ == "__main__":
    main("transit")
