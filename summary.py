#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/summary.py)."""
from mcgm_tpu.cli.summary import main

if __name__ == "__main__":
    main()
