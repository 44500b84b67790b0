"""generate / transit / create workflow tests on a tiny trained model."""

import os

import numpy as np
import jax
import pytest

from conftest import make_tiny_cfg
from mcgm_tpu.train.loop import Experiment
from mcgm_tpu.workflows import (create_workflow, generate, load_sampler,
                                transit_workflow)

K = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("wf"))
    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp, num_epochs=1,
                        save_npy=True, save_per_mode=2)
    cfg["generate_per_mode"] = 3
    exp = Experiment(cfg)
    exp.run()
    return exp.cfg, exp.tag, tmp


def test_generate_npy_and_grid(trained):
    cfg, tag, tmp = trained
    sampler = load_sampler(cfg, tag)
    out = generate(sampler, tag, rng=K)
    assert out.shape == (cfg["classes_size"] * cfg["generate_per_mode"],
                         3, 32, 32)  # NCHW dump for reference parity
    assert out.min() >= 0 and out.max() <= 255
    assert os.path.exists(os.path.join(tmp, "npy", f"generated_{tag}.npy"))
    assert os.path.exists(os.path.join(tmp, "vis", f"generated_{tag}.png"))


def test_transit_grids(trained):
    cfg, tag, tmp = trained
    sampler = load_sampler(cfg, tag)
    grids = transit_workflow(sampler, tag, rng=K)
    assert 10 in grids
    # (save_per_mode + 1) alpha rows x 10 modes
    assert grids[10].shape[0] == (cfg["save_per_mode"] + 1) * 10
    assert os.path.exists(os.path.join(tmp, "vis", f"transited_{tag}_10.png"))


def test_create_npy(trained):
    cfg, tag, tmp = trained
    sampler = load_sampler(cfg, tag)
    out = create_workflow(sampler, tag, rng=K)
    assert out.shape[0] == cfg["classes_size"] * cfg["generate_per_mode"]
    assert os.path.exists(os.path.join(tmp, "npy", f"created_{tag}.npy"))


def test_create_vis_with_new_mode_counts(trained):
    cfg, tag, tmp = trained
    cfg = dict(cfg)
    cfg["save_npy"] = False
    sampler = load_sampler(cfg, tag)
    create_workflow(sampler, tag, rng=K)
    assert os.path.exists(os.path.join(tmp, "vis", f"created_{tag}_50.png"))


def test_transit_alpha_zero_collapses_modes(trained):
    """At alpha=0 all modes equal the root → identical images per column."""
    cfg, tag, tmp = trained
    sampler = load_sampler(cfg, tag)
    from mcgm_tpu.models.manipulate import transit

    s0 = sampler.with_variables(transit(sampler.variables, 0, 0.0))
    C = np.arange(5)
    z = sampler.sample_z(5, K)
    z = jax.numpy.tile(z[0:1], (5, 1))  # same z for all modes
    imgs = s0.sample_with_z(C, z)
    for i in range(1, 5):
        assert np.allclose(imgs[i], imgs[0], atol=1e-5)


def test_scoring_chain_end_to_end(trained):
    """Full reference scoring pipeline on the tiny trained model: train the
    classifier feature model, score the generate/create npy dumps through
    the real CLI functions (IS/FID on classifier features + DBI), and
    re-evaluate the model from its _best checkpoint (test_vae analog)."""
    cfg, tag, tmp = trained
    # feature model (classifier fallback: zero-egress env, no inception)
    ccfg = make_tiny_cfg("classifier", tmp_dir=tmp, num_epochs=1,
                        control_name="None")
    Experiment(ccfg).run()

    from mcgm_tpu.cli.test_generated import score_created, score_generated

    scfg = dict(cfg)
    scfg["is_splits"] = 1
    ev = score_generated(scfg, tag)
    assert np.isfinite(ev["InceptionScore"]) and np.isfinite(ev["FID"])
    assert os.path.exists(os.path.join(tmp, "result",
                                       f"is_generated_{tag}.npy"))
    dbi_val = score_created(scfg, tag)
    assert np.isfinite(dbi_val)

    from mcgm_tpu.cli.test_model import evaluate_best

    logger = evaluate_best(dict(cfg), cfg["init_seed"])
    assert np.isfinite(logger.mean["test/Loss"])
    assert os.path.exists(os.path.join(tmp, "result", f"{tag}.pkl"))


def test_make_stats_dump_and_precomputed_fid(trained):
    """metrics_tf side-tools analog: dump the real train set as an npy,
    precompute the FID real-side Gaussian, then score through the
    precomputed-stats fast path (reference fid_tf.py:355-357)."""
    cfg, tag, tmp = trained
    from mcgm_tpu.io.checkpoint import load_checkpoint

    ccfg = make_tiny_cfg("classifier", tmp_dir=tmp, num_epochs=1,
                         control_name="None")
    from mcgm_tpu.config import make_model_tag

    if load_checkpoint(ccfg, make_model_tag(ccfg, 0), "best") is None:
        Experiment(ccfg).run()

    from mcgm_tpu.cli.make_stats import dump_real, make_fid_stats
    from mcgm_tpu.cli.test_generated import score_generated

    dump_real(dict(cfg))
    assert os.path.exists(
        os.path.join(tmp, "npy", f"generated_0_{cfg['data_name']}.npy"))
    make_fid_stats(dict(cfg))
    stats = os.path.join(tmp, "fid_stats",
                         f"fid_stats_{cfg['data_name']}_train.npz")
    assert os.path.exists(stats)
    scfg = dict(cfg)
    scfg["is_splits"] = 1
    ev = score_generated(scfg, tag)  # takes the precomputed-stats branch
    assert np.isfinite(ev["FID"])
