#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference src/make_learning_curve.py)."""
import sys

from mcgm_tpu.report.learning_curve import plot_curves

if __name__ == "__main__":
    plot_curves(sys.argv[1] if len(sys.argv) > 1 else "./output")
