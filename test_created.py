#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/test_created.py)."""
from mcgm_tpu.cli.test_generated import main

if __name__ == "__main__":
    main("created")
