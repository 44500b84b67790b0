#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/process.py):
aggregate result pickles into processed_result.json and emit vis.sh."""
import sys

from mcgm_tpu.report.process import make_vis, process

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "./output"
    make_vis(process(out), out)
