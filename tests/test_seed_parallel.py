"""Seed-parallel training (train/seed_parallel.py): the vmapped multi-seed
run must be a drop-in replacement for ``num_experiments`` sequential
Experiments — same final state per seed, same logged histories, same
per-seed checkpoint artifacts (the reference's seeds-as-separate-GPU-jobs
protocol, reference make.py:27, 55-60)."""

import os

import numpy as np
import jax
import pytest

from conftest import make_tiny_cfg
from mcgm_tpu.train.loop import Experiment, run_experiments
from mcgm_tpu.train.seed_parallel import SeedParallelExperiment


def _slice_tree(tree, j):
    return jax.tree_util.tree_map(lambda a: np.asarray(a)[j], tree)


def _assert_tree_close(a, b, label, atol=1e-5, rtol=1e-5):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [jax.tree_util.keystr(p) for p, _ in la] == \
           [jax.tree_util.keystr(p) for p, _ in lb], label
    for (p, x), (_, y) in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol,
            err_msg=f"{label}{jax.tree_util.keystr(p)}")


def _run_sequential(model_name, tmp, seeds, epochs=2, **over):
    exps = []
    for s in seeds:
        cfg = make_tiny_cfg(model_name, tmp_dir=tmp, num_epochs=epochs,
                            init_seed=s, **over)
        exp = Experiment(cfg, seed=s)
        exp.run()
        exps.append(exp)
    return exps


def _run_parallel(model_name, tmp, seeds, epochs=2, **over):
    cfg = make_tiny_cfg(model_name, tmp_dir=tmp, num_epochs=epochs,
                        init_seed=seeds[0],
                        num_experiments=len(seeds), **over)
    exp = SeedParallelExperiment(cfg, seeds=seeds)
    exp.run()
    return exp


# vmap batches the same ops the sequential run issues one seed at a time;
# the only deltas are fp-level (XLA picks different conv/matmul algorithms
# for the batched shapes), then amplified by Adam's 1/sqrt(nu) near init —
# the same tolerance rationale as the DP-vs-single tests in
# test_parallel.py (measured: ≤8e-4 after 2 tiny-cfg epochs). Any semantic
# bug (cross-seed coupling, wrong per-seed rng/data order) diverges by
# O(1) immediately.
TOL = dict(atol=2e-3, rtol=5e-3)


@pytest.mark.parametrize("model_name", ["mcvae", "vqvae"])
def test_seed_parallel_matches_sequential(model_name, tmp_path):
    """vae (BN + reparam rng chain) and vqvae (BN + VQ-EMA state): per-seed
    final params/state/opt_state and logged histories equal sequential."""
    seeds = [0, 1, 2]
    over = {"control_name": "None"} if model_name == "vqvae" else {}
    seq = _run_sequential(model_name, str(tmp_path / "seq"), seeds, **over)
    par = _run_parallel(model_name, str(tmp_path / "par"), seeds, **over)
    for j, exp in enumerate(seq):
        _assert_tree_close(exp.ts.params, _slice_tree(par.ts.params, j),
                           f"seed{seeds[j]}/params", **TOL)
        _assert_tree_close(exp.ts.state, _slice_tree(par.ts.state, j),
                           f"seed{seeds[j]}/state", **TOL)
        _assert_tree_close(exp.ts.opt_state, _slice_tree(par.ts.opt_state, j),
                           f"seed{seeds[j]}/opt_state", **TOL)
        for key, hist in exp.logger.history.items():
            if not hist or not isinstance(hist[0], (int, float)):
                continue
            np.testing.assert_allclose(
                par.loggers[j].history[key], hist, atol=1e-3, rtol=1e-3,
                err_msg=f"seed{seeds[j]} history {key}")


def test_seed_parallel_multi_dispatch_path(tmp_path):
    """steps_per_dispatch > 1: the scanned k-step dispatch composes with the
    seed vmap ([k, S, B, ...] stacked batches) on both train and eval."""
    seeds = [0, 1]
    kw = dict(steps_per_dispatch=2, limit_train_batches=4,
              limit_eval_batches=2)
    seq = _run_sequential("mcvae", str(tmp_path / "seq"), seeds,
                          epochs=1, **kw)
    par = _run_parallel("mcvae", str(tmp_path / "par"), seeds,
                        epochs=1, **kw)
    for j, exp in enumerate(seq):
        _assert_tree_close(exp.ts.params, _slice_tree(par.ts.params, j),
                           f"seed{seeds[j]}/params", **TOL)
        np.testing.assert_allclose(
            par.loggers[j].history["test/BCE"],
            exp.logger.history["test/BCE"], atol=1e-3, rtol=1e-3)


def test_seed_parallel_glow_ddi(tmp_path):
    """Glow: per-seed data-dependent ActNorm init runs on the unstacked
    members before stacking — final state matches sequential runs."""
    seeds = [0, 1]
    kw = dict(num_init_batches=2)
    seq = _run_sequential("mcglow", str(tmp_path / "seq"), seeds,
                          epochs=1, **kw)
    par = _run_parallel("mcglow", str(tmp_path / "par"), seeds,
                        epochs=1, **kw)
    for j, exp in enumerate(seq):
        _assert_tree_close(exp.ts.params, _slice_tree(par.ts.params, j),
                           f"seed{seeds[j]}/params", **TOL)
        _assert_tree_close(exp.ts.state, _slice_tree(par.ts.state, j),
                           f"seed{seeds[j]}/state", **TOL)


def test_seed_parallel_pixelcnn_per_seed_frozen_ae(tmp_path):
    """PixelCNN: each seed's batches encode through THAT seed's frozen
    vqvae checkpoint (stacked AE variables under the vmapped encode)."""
    seeds = [0, 1]
    seq_dir, par_dir = str(tmp_path / "seq"), str(tmp_path / "par")
    # per-seed frozen AEs (reference train_pixelcnn.py:44-45) in each
    # output tree — AE checkpoints resolve relative to output_dir
    for d in (seq_dir, par_dir):
        _run_sequential("vqvae", d, seeds, epochs=1, control_name="None")
    seq = _run_sequential("mcpixelcnn", seq_dir, seeds, epochs=1)
    par = _run_parallel("mcpixelcnn", par_dir, seeds, epochs=1)
    for j, exp in enumerate(seq):
        _assert_tree_close(exp.ts.params, _slice_tree(par.ts.params, j),
                           f"seed{seeds[j]}/params", **TOL)
        np.testing.assert_allclose(
            par.loggers[j].history["test/NLL"],
            exp.logger.history["test/NLL"], atol=1e-3, rtol=1e-3)


def test_seed_parallel_artifacts_and_resume(tmp_path):
    """run_experiments routing: per-seed reference-tag checkpoints + _best
    files land; resume_mode=1 continues every seed's history."""
    tmp = str(tmp_path)
    seeds = [0, 1]
    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp, num_epochs=2,
                        num_experiments=2, seed_parallel=True)
    loggers = run_experiments(cfg)
    assert len(loggers) == 2
    tags = [f"{s}_Synthetic_label_mcvae_0.5" for s in seeds]
    for t in tags:
        assert os.path.exists(os.path.join(tmp, "model", f"{t}_checkpoint.pkl"))
        assert os.path.exists(os.path.join(tmp, "model", f"{t}_best.pkl"))
    n0 = [len(lg.history["train/Loss"]) for lg in loggers]
    cfg2 = make_tiny_cfg("mcvae", tmp_dir=tmp, num_epochs=4,
                         num_experiments=2, seed_parallel=True,
                         resume_mode=1)
    loggers2 = run_experiments(cfg2)
    for j, lg in enumerate(loggers2):
        assert len(lg.history["train/Loss"]) == n0[j] + 2


def test_seed_parallel_resume_matches_uninterrupted(tmp_path):
    """2 epochs + resume for 2 more == 4 uninterrupted epochs, per seed."""
    seeds = [0, 1]
    full = _run_parallel("mcvae", str(tmp_path / "full"), seeds, epochs=4)
    part = _run_parallel("mcvae", str(tmp_path / "part"), seeds, epochs=2)
    cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path / "part"),
                        num_epochs=4, num_experiments=2, resume_mode=1)
    resumed = SeedParallelExperiment(cfg, seeds=seeds)
    resumed.run()
    for j in range(len(seeds)):
        _assert_tree_close(_slice_tree(full.ts.params, j),
                           _slice_tree(resumed.ts.params, j),
                           f"seed{seeds[j]}/params", atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(
            resumed.loggers[j].history["train/Loss"],
            full.loggers[j].history["train/Loss"], atol=1e-5, rtol=1e-5)
    # per-seed eval key chains ride in the checkpoints (eval_rng): the
    # resumed stacked chain equals the uninterrupted run's
    assert np.array_equal(np.asarray(resumed.rng), np.asarray(full.rng))


def test_seed_parallel_over_seed_mesh_matches_sequential(tmp_path):
    """world_size > 1 shards the SEED axis over a ('seed',) mesh — one seed
    group per device, zero collectives (the SPMD form of the reference's
    CUDA_VISIBLE_DEVICES round-robin, make.py:55-60). 4 seeds over 4 virtual
    devices must equal 4 sequential single-device runs, and the stacked
    state must actually be seed-sharded."""
    from jax.sharding import PartitionSpec
    from mcgm_tpu.parallel import make_seed_mesh

    seeds = [0, 1, 2, 3]
    seq = _run_sequential("mcvae", str(tmp_path / "seq"), seeds, epochs=1)
    cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path / "par"), num_epochs=1,
                        num_experiments=4)
    par = SeedParallelExperiment(cfg, seeds=seeds, mesh=make_seed_mesh(4))
    par.run()
    leaf = jax.tree_util.tree_leaves(par.ts.params)[0]
    assert leaf.sharding.spec == PartitionSpec("seed")
    for j, exp in enumerate(seq):
        _assert_tree_close(exp.ts.params, _slice_tree(par.ts.params, j),
                           f"seed{seeds[j]}/params", **TOL)
        _assert_tree_close(exp.ts.state, _slice_tree(par.ts.state, j),
                           f"seed{seeds[j]}/state", **TOL)


def test_seed_parallel_group_caps():
    """Per-family vmapped-group caps (round-3 verdict #4): pixelcnn and
    vqvae regress past S=4 (measured, docs/artifacts/seed_parallel_bench
    .json), so the 12-seed reference protocol splits into 3 groups of 4;
    uncapped families stay one group; cfg['seed_parallel_max'] overrides;
    with a seed mesh the cap rounds down to a mesh multiple."""
    from mcgm_tpu.train.seed_parallel import seed_parallel_groups

    twelve = list(range(12))
    assert seed_parallel_groups("pixelcnn", twelve) == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    assert seed_parallel_groups("vqvae", twelve) == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    # classifier / vae / glow: measured to keep gaining through S=12
    for fam in ("classifier", "vae", "glow"):
        assert seed_parallel_groups(fam, twelve) == [twelve]
    # at or under the cap: single group
    assert seed_parallel_groups("pixelcnn", [0, 1, 2, 3]) == [[0, 1, 2, 3]]
    # leftover group smaller than the cap (run sequentially if size 1)
    assert seed_parallel_groups("vqvae", list(range(5))) == [
        [0, 1, 2, 3], [4]]
    # explicit override beats the measured cap; negative = uncapped
    assert seed_parallel_groups("pixelcnn", twelve, max_override=12) == [
        twelve]
    assert seed_parallel_groups("pixelcnn", twelve, max_override=-1) == [
        twelve]
    assert seed_parallel_groups("vae", list(range(4)), max_override=2) == [
        [0, 1], [2, 3]]
    # seed mesh: cap rounds down to a multiple of world_size
    assert seed_parallel_groups("pixelcnn", twelve, world_size=3) == [
        [0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    with pytest.raises(ValueError, match="cannot host"):
        seed_parallel_groups("pixelcnn", twelve, world_size=8)


def test_seed_parallel_grouped_run_matches_sequential(tmp_path):
    """run_experiments with a group cap executes the sweep as sequential
    vmapped groups whose per-seed results equal plain sequential runs —
    the capped path is transparent, not a different training procedure."""
    seeds = [0, 1, 2]
    seq = _run_sequential("mcvae", str(tmp_path / "seq"), seeds, epochs=1)
    cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path / "grp"), num_epochs=1,
                        num_experiments=3, seed_parallel=True,
                        seed_parallel_max=2)
    loggers = run_experiments(cfg)  # groups [0,1] (vmapped) + [2] (plain)
    assert len(loggers) == 3
    for j, exp in enumerate(seq):
        for key, hist in exp.logger.history.items():
            if not hist or not isinstance(hist[0], (int, float)):
                continue
            np.testing.assert_allclose(
                loggers[j].history[key], hist, atol=2e-3, rtol=5e-3,
                err_msg=f"seed{seeds[j]} history {key}")
    # every seed's reference-tag artifacts land regardless of its group
    for s in seeds:
        t = f"{s}_Synthetic_label_mcvae_0.5"
        assert os.path.exists(
            os.path.join(str(tmp_path / "grp"), "model", f"{t}_best.pkl"))


def test_seed_parallel_rejects_unsupported():
    cfg = make_tiny_cfg("mcgan", num_experiments=2)
    with pytest.raises(ValueError, match="GAN"):
        SeedParallelExperiment(cfg, seeds=[0, 1])
    cfg = make_tiny_cfg("mcvae", num_experiments=2, save_every_steps=2)
    with pytest.raises(ValueError, match="save_every_steps"):
        SeedParallelExperiment(cfg, seeds=[0, 1])
    # 2 seeds cannot shard over 4 devices
    cfg = make_tiny_cfg("mcvae", num_experiments=2, seed_parallel=True,
                        world_size=4)
    with pytest.raises(ValueError, match="divisible by"):
        run_experiments(cfg)
    # seed mesh excludes model/pipe/spatial layouts
    cfg = make_tiny_cfg("mcvae", num_experiments=4, seed_parallel=True,
                        world_size=4, model_size=2)
    with pytest.raises(ValueError, match="plain world_size"):
        run_experiments(cfg)
    cfg = make_tiny_cfg("mcvae", num_experiments=1)
    with pytest.raises(ValueError, match="num_experiments"):
        SeedParallelExperiment(cfg, seeds=[0])
