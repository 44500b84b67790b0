from .controller import MultimodalController, make_codebook, mc_gate  # noqa: F401
from .vq import VectorQuantizerEMA  # noqa: F401
