"""mcgm_tpu — a TPU-native JAX framework for Multimodal-Controller generative models.

A from-scratch rebuild of the capabilities of
`diaoenmao/Multimodal-Controller-for-Generative-Models` (reference mounted at
/root/reference), designed TPU-first:

- compute path: jax / XLA / Pallas kernels, NHWC layouts, bf16-friendly
- parallelism: `jax.sharding.Mesh` + jit with NamedSharding (SPMD data parallel
  over ICI), replacing the reference's single-process torch DataParallel
  (reference src/train_vae.py:72-73)
- models: {c,mc} x {vae, gan, glow, pixelcnn} + vqvae + classifier
  (reference src/models/)
- workflows: generate / transit / create (reference generate.py, transit.py,
  create.py)
- metrics: Loss/IS/FID/DBI/Accuracy/MSE/BCE/NLL/PSNR on-device
  (reference src/metrics/metrics.py)

The importable package is `mcgm_tpu`; the repository also exposes it under the
literal directory name `multimodal-controller-for-generative-models_tpu` via a
symlink.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
