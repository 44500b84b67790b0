"""Model factories.

Analog of reference src/models/__init__.py: zero-config-arg constructors that
read the processed config (reference factories read the global ``cfg``; here
the cfg dict is passed explicitly). ``cfg['classes_size']`` must be set by the
data layer (see ``mcgm_tpu.data``) before building conditional models.
"""

from __future__ import annotations

from .vae import CVAE, MCVAE  # noqa: F401
from .vqvae import VQVAE  # noqa: F401
from .classifier import Classifier  # noqa: F401
from .gan import CGAN, MCGAN  # noqa: F401
from .glow import CGlow, MCGlow  # noqa: F401
from .pixelcnn import CPixelCNN, MCPixelCNN  # noqa: F401


def build_model(cfg: dict, model_name: str | None = None):
    name = model_name or cfg["model_name"]
    shape = tuple(cfg["data_shape"])  # HWC
    num_mode = cfg["classes_size"]
    rate = cfg.get("controller_rate", 0.5)
    cifar_style = cfg["data_name"] in ("CIFAR10", "CIFAR100")
    if name == "mcvae":
        p = cfg["vae"]
        return MCVAE(shape, tuple(p["hidden_size"]), p["latent_size"],
                     p["num_res_block"], num_mode, rate)
    if name == "cvae":
        p = cfg["vae"]
        return CVAE(shape, tuple(p["hidden_size"]), p["latent_size"],
                    p["num_res_block"], num_mode, p["embedding_size"])
    if name == "vqvae":
        p = cfg["vqvae"]
        return VQVAE(shape, tuple(p["hidden_size"]), p["num_res_block"],
                     p["embedding_size"], p["num_embedding"], p["vq_commit"])
    if name == "classifier":
        p = cfg["classifier"]
        return Classifier(shape, tuple(p["hidden_size"]), num_mode)
    if name == "mcgan":
        p = cfg["gan"]
        return MCGAN(shape, p["latent_size"], tuple(p["generator_hidden_size"]),
                     tuple(p["discriminator_hidden_size"]), num_mode, rate, cifar_style)
    if name == "cgan":
        p = cfg["gan"]
        return CGAN(shape, p["latent_size"], tuple(p["generator_hidden_size"]),
                    tuple(p["discriminator_hidden_size"]), num_mode,
                    p["embedding_size"], cifar_style)
    if name == "mcglow":
        p = cfg["glow"]
        return MCGlow(shape, p["hidden_size"], p["K"], p["L"], p["affine"],
                      p["conv_lu"], num_mode, rate,
                      scan_flows=p.get("scan_flows", True),
                      scan_unroll=p.get("scan_unroll", 1),
                      remat_flows=p.get("remat_flows", True),
                      scan_chunk=p.get("scan_chunk", 1),
                      reversible_flows=p.get("reversible_flows", False),
                      pipe_axis=p.get("pipe_axis"),
                      pipe_microbatches=p.get("pipe_microbatches", 0))
    if name == "cglow":
        p = cfg["glow"]
        return CGlow(shape, p["hidden_size"], p["K"], p["L"], p["affine"],
                     p["conv_lu"], num_mode,
                     scan_flows=p.get("scan_flows", True),
                     scan_unroll=p.get("scan_unroll", 1),
                     remat_flows=p.get("remat_flows", True),
                     scan_chunk=p.get("scan_chunk", 1),
                     reversible_flows=p.get("reversible_flows", False),
                     pipe_axis=p.get("pipe_axis"),
                     pipe_microbatches=p.get("pipe_microbatches", 0))
    if name == "mcpixelcnn":
        p = cfg["pixelcnn"]
        return MCPixelCNN(p["num_embedding"], p["hidden_size"], p["num_layer"],
                          num_mode, rate)
    if name == "cpixelcnn":
        p = cfg["pixelcnn"]
        return CPixelCNN(p["num_embedding"], p["hidden_size"], p["num_layer"], num_mode)
    raise ValueError(f"Not valid model name: {name}")
