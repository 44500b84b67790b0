"""High-mode-count cells — the reference's headline regime.

The paper's showcase results are COIL100 (100 modes) and Omniglot (1,623
modes — reference datasets/omniglot.py:78-83, utils.py:107-126). These tests
exercise that regime offline via the K-mode Synthetic variants
(``Synthetic100`` / ``Synthetic1623``): codebook construction and dedupe at
1,623 modes, MC gating with a [1623, C] codebook, training, generate /
create / transit, and DBI at >=100 modes. Chip-scale timings live in
docs/artifacts/high_modes_1623.json (tools/measure_high_modes.py).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_tiny_cfg
from mcgm_tpu.config import (apply_control_name, load_config,
                             process_control)
from mcgm_tpu.data.datasets import fetch_dataset
from mcgm_tpu.ops.controller import make_codebook, mc_gate, one_hot

K = jax.random.PRNGKey(0)


def test_synthetic_k_dataset_and_config():
    ds = fetch_dataset("Synthetic100", verbose=False)
    assert ds["train"].num_classes == 100
    cc = ds["train"].classes_counts
    assert cc.min() >= 1  # every mode represented (balanced labels)
    assert ds["train"].img.shape[1:] == (32, 32, 3)
    # base patterns are class-distinct: mean image per class differs
    tr = ds["train"]
    m0 = tr.img[tr.labels == 0].mean(0)
    m1 = tr.img[tr.labels == 1].mean(0)
    assert np.abs(m0.astype(float) - m1.astype(float)).mean() > 1.0

    cfg = load_config()
    cfg = apply_control_name(cfg, "0.5")
    cfg.update(data_name="Synthetic1623", model_name="mcgan")
    cfg = process_control(cfg)
    assert cfg["generate_per_mode"] == 20   # Omniglot regime
    cfg2 = load_config()
    cfg2 = apply_control_name(cfg2, "0.5")
    cfg2.update(data_name="Synthetic100", model_name="mcgan")
    cfg2 = process_control(cfg2)
    assert cfg2["generate_per_mode"] == 100  # COIL100 regime


def test_synthetic1623_balanced_and_shaped():
    ds = fetch_dataset("Synthetic1623", verbose=False)
    assert ds["train"].num_classes == 1623
    cc = ds["train"].classes_counts
    assert cc.min() == cc.max() == 8  # 8 samples per mode, all modes
    assert ds["test"].classes_counts.min() >= 1


def test_codebook_1623_modes_unique():
    """Dedupe at the Omniglot mode count: 1,623 unique Bernoulli masks over
    512 channels (the production glow/gan hidden width)."""
    cb = np.asarray(make_codebook(0, 1623, 512, 0.5))
    assert cb.shape == (1623, 512)
    assert set(np.unique(cb)) <= {0.0, 1.0}
    assert len({row.tobytes() for row in cb.astype(np.uint8)}) == 1623
    # rate stays ~0.5 (dedupe must not bias the masks)
    assert 0.45 < cb.mean() < 0.55


def test_mc_gate_1623_codebook():
    cb = make_codebook(1, 1623, 64, 0.5)
    x = jax.random.normal(K, (4, 8, 8, 64))
    ind = one_hot(jnp.array([0, 1, 1000, 1622]), 1623)
    y = mc_gate(x, ind, cb)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y[3]),
                               np.asarray(x[3] * cb[1622]), rtol=1e-6)


@pytest.fixture(scope="module")
def trained_100(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("hm"))
    cfg = make_tiny_cfg("mcvae", data_name="Synthetic100", tmp_dir=tmp,
                        num_epochs=1, save_npy=True, save_per_mode=2)
    cfg["generate_per_mode"] = 2
    from mcgm_tpu.train.loop import Experiment

    exp = Experiment(cfg)
    logger = exp.run()
    assert np.isfinite(logger.history["train/Loss"][-1])
    return exp.cfg, exp.tag, tmp


def test_train_and_generate_100_modes(trained_100):
    cfg, tag, tmp = trained_100
    assert cfg["classes_size"] == 100
    from mcgm_tpu.workflows import generate, load_sampler

    sampler = load_sampler(cfg, tag)
    out = generate(sampler, tag, rng=K)
    assert out.shape == (100 * cfg["generate_per_mode"], 3, 32, 32)
    assert os.path.exists(os.path.join(tmp, "npy", f"generated_{tag}.npy"))


def test_create_transit_100_modes(trained_100):
    """create/transit codebook surgery at 100 modes (the 10/50/100-mode
    grids of the reference's create protocol reach 100 here)."""
    cfg, tag, tmp = trained_100
    from mcgm_tpu.workflows import (create_workflow, load_sampler,
                                    transit_workflow)

    sampler = load_sampler(cfg, tag)
    created = create_workflow(sampler, tag, rng=K)
    assert created.shape[0] == 100 * cfg["generate_per_mode"]
    grids = transit_workflow(sampler, tag, rng=K)
    assert 10 in grids


def test_dbi_100_modes(trained_100):
    cfg, tag, tmp = trained_100
    from mcgm_tpu.evals.metrics import dbi

    # class-keyed features: 100 well-separated clusters => tiny DBI
    rng = np.random.default_rng(0)
    centers = rng.normal(0, 50, (100, 32))
    feats = np.concatenate([centers[i] + rng.normal(0, 0.1, (5, 32))
                            for i in range(100)])
    labels = np.repeat(np.arange(100), 5)
    dbi_val = float(dbi(feats, labels))
    assert 0 < dbi_val < 0.1
