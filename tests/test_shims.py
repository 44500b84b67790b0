"""Reference CLI surface parity: every runnable top-level script in the
reference has a same-named entry point at the repo root (reference src/
listing; src/test.py is dead commented-out code and is intentionally
skipped, src/data.py / logger.py / utils.py / config.py are libraries)."""

import os
import py_compile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SCRIPTS = [
    "train_classifier.py", "train_vae.py", "train_vqvae.py", "train_gan.py",
    "train_glow.py", "train_pixelcnn.py",
    "test_classifier.py", "test_vae.py", "test_vqvae.py", "test_glow.py",
    "test_pixelcnn.py", "test_generated.py", "test_created.py",
    "generate.py", "transit.py", "create.py",
    "make.py", "make_test.py", "make_learning_curve.py",
    "process.py", "summary.py",
    # metrics_tf tier (reference src/metrics_tf/): the official frozen-
    # TF-graph scorers, same `npy <tag>` invocation
    "inception_score_tf.py", "fid_tf.py",
]


def test_root_shim_surface_complete():
    for script in REFERENCE_SCRIPTS:
        path = os.path.join(ROOT, script)
        assert os.path.exists(path), f"missing root shim {script}"
        py_compile.compile(path, doraise=True)
