"""Config system tests (reference src/config.py + utils.py:104-192)."""

import pytest

from mcgm_tpu.cli._common import parse_cfg
from mcgm_tpu.config import (apply_control_name, load_config, make_model_tag,
                             process_control)


def test_control_name_zip_and_tag():
    cfg = load_config()
    cfg["data_name"] = "CIFAR10"
    cfg["model_name"] = "mcgan"
    cfg = apply_control_name(cfg, "0.5")
    assert cfg["control"] == {"controller_rate": "0.5"}
    assert make_model_tag(cfg, 3) == "3_CIFAR10_label_mcgan_0.5"


def test_control_name_none_clears():
    cfg = load_config()
    cfg["model_name"] = "cgan"
    cfg = apply_control_name(cfg, "None")
    assert cfg["control"] == {}
    assert make_model_tag(cfg, 0) == "0_CIFAR10_label_cgan"


def test_process_control_derives_hyperparams():
    cfg = load_config()
    cfg["data_name"] = "CIFAR10"
    cfg["model_name"] = "mcgan"
    cfg = apply_control_name(cfg, "0.5")
    cfg = process_control(cfg)
    assert cfg["controller_rate"] == 0.5
    assert cfg["data_shape"] == [32, 32, 3]
    assert cfg["generate_per_mode"] == 1000
    assert cfg["gan"]["generator_hidden_size"] == [256] * 4
    assert cfg["gan"]["discriminator_hidden_size"] == [128] * 4
    assert cfg["batch_size"] == {"train": 128, "test": 512}
    assert cfg["vqvae"]["num_embedding"] == 512


def test_process_control_non_cifar_gan_widths():
    cfg = apply_control_name(load_config(), "0.5")
    cfg.update(data_name="Omniglot", model_name="mcgan")
    cfg = process_control(cfg)
    assert cfg["data_shape"] == [32, 32, 1]
    assert cfg["generate_per_mode"] == 20
    assert cfg["gan"]["generator_hidden_size"] == [512, 256, 128, 64]


def test_process_control_invalid_dataset():
    cfg = load_config()
    cfg["data_name"] = "NopeNet"
    with pytest.raises(ValueError):
        process_control(cfg)


def test_parse_cfg_overrides_and_control():
    cfg = parse_cfg(["--data_name", "COIL100", "--model_name", "mcvae",
                     "--control_name", "0.5", "--init_seed", "4",
                     "--batch_size", "{train: 8, test: 8}"])
    assert cfg["data_name"] == "COIL100"
    assert cfg["init_seed"] == 4
    assert cfg["batch_size"] == {"train": 8, "test": 8}
    assert cfg["control"] == {"controller_rate": "0.5"}


def test_parse_cfg_enables_persistent_compile_cache(tmp_path, monkeypatch):
    """cfg['compile_cache_dir'] turns on JAX's disk compilation cache at
    CLI startup (the reference protocol runs every experiment as its own
    OS process; the cache makes job N's compiles near-free); empty string
    leaves the config untouched (disable knob)."""
    import jax

    # plain backend (no remote-compile axon): cache allowed
    monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
    monkeypatch.delenv("MCGM_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "cc")
    parse_cfg(["--model_name", "cvae", "--control_name", "None",
               "--compile_cache_dir", d])
    assert jax.config.jax_compilation_cache_dir == d
    parse_cfg(["--model_name", "cvae", "--control_name", "None",
               "--compile_cache_dir", ""])
    assert jax.config.jax_compilation_cache_dir == d  # unchanged, not reset


def test_compile_cache_fenced_under_remote_compile_axon(tmp_path, monkeypatch):
    """Under the remote-compile axon backend the persistent cache deadlocks
    the client (round-3 BENCH rc=124), so enable_compile_cache must refuse
    there — unless MCGM_COMPILE_CACHE=1 explicitly forces it, and
    MCGM_COMPILE_CACHE=0 force-disables everywhere."""
    from mcgm_tpu.compile_cache import compile_cache_allowed

    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    monkeypatch.delenv("MCGM_COMPILE_CACHE", raising=False)
    assert not compile_cache_allowed()
    monkeypatch.setenv("MCGM_COMPILE_CACHE", "1")
    assert compile_cache_allowed()
    monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
    monkeypatch.setenv("MCGM_COMPILE_CACHE", "0")
    assert not compile_cache_allowed()
    monkeypatch.delenv("MCGM_COMPILE_CACHE", raising=False)
    assert compile_cache_allowed()

    # the guarded enable is a no-op under the fenced backend: config unchanged
    import jax

    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    from mcgm_tpu.compile_cache import enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    assert enable_compile_cache(str(tmp_path / "nope")) is False
    assert jax.config.jax_compilation_cache_dir == before


def test_extended_datasets_in_control():
    for name, ch in (("EMNIST", 1), ("SVHN", 3), ("FashionMNIST", 1)):
        cfg = apply_control_name(load_config(), "0.5")
        cfg.update(data_name=name, model_name="mcvae")
        cfg = process_control(cfg)
        assert cfg["data_shape"] == [32, 32, ch]


def test_derive_model_params_guard():
    """Explicit model dicts survive re-derivation when the flag is off."""
    cfg = apply_control_name(load_config(), "0.5")
    cfg.update(data_name="CIFAR10", model_name="mcvae",
               derive_model_params=False)
    cfg["vae"] = {"hidden_size": [4], "latent_size": 2, "num_res_block": 0,
                  "embedding_size": 2}
    out = process_control(cfg)
    assert out["vae"]["hidden_size"] == [4]
    out2 = process_control(out)  # idempotent under repeated derivation
    assert out2["vae"]["hidden_size"] == [4]


def test_glow_depth_by_resolution():
    cfg = apply_control_name(load_config(), "0.5")
    cfg.update(data_name="CelebA-HQ", model_name="mcglow")
    cfg = process_control(cfg)
    assert cfg["glow"]["L"] == 5
    assert cfg["batch_size"] == {"train": 32, "test": 128}
