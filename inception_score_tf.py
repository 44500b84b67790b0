#!/usr/bin/env python
"""Reference-compatible CLI shim (analog of reference
metrics_tf/inception_score_tf.py): ``python inception_score_tf.py npy <tag>``."""
from mcgm_tpu.cli.score_tf import main

if __name__ == "__main__":
    import sys

    main("is", sys.argv[1:])
