#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference metrics_tf/fid_tf.py):
``python fid_tf.py npy <tag>`` (use ``python -m mcgm_tpu.cli.score_tf stats
npy <real-dump-tag>`` first to build the real-side stats npz)."""
from mcgm_tpu.cli.score_tf import main

if __name__ == "__main__":
    import sys

    main("fid", sys.argv[1:])
