"""End-to-end training smoke tests for every family + resume semantics."""

import os

import numpy as np
import pytest

from conftest import make_tiny_cfg
from mcgm_tpu.train.loop import Experiment


def _run(model_name, tmp, epochs=1, **over):
    cfg = make_tiny_cfg(model_name, tmp_dir=tmp, num_epochs=epochs, **over)
    exp = Experiment(cfg)
    logger = exp.run()
    return exp, logger


def test_train_mcvae(tmp_output):
    exp, logger = _run("mcvae", tmp_output)
    assert np.isfinite(logger.history["train/Loss"][-1])
    assert os.path.exists(os.path.join(tmp_output, "model",
                                       f"{exp.tag}_best.pkl"))


def test_train_vqvae_then_pixelcnn(tmp_output):
    # vqvae trains unconditioned: control 'None' → tag without rate suffix
    # (reference make.py:51-54), which is what ae_tag resolution expects
    exp_ae, _ = _run("vqvae", tmp_output, control_name="None")
    exp, logger = _run("mcpixelcnn", tmp_output)
    assert np.isfinite(logger.history["train/NLL"][-1])


def test_pixelcnn_without_ae_raises(tmp_output):
    with pytest.raises(FileNotFoundError):
        _run("mcpixelcnn", os.path.join(tmp_output, "empty"))


def test_train_gan(tmp_output):
    # d_iter=2 keeps the production step structure (scanned D updates + G
    # update) while halving the single-core compile time of this test
    exp, logger = _run("mcgan", tmp_output, d_iter=2)
    assert np.isfinite(logger.history["train/Loss_D"][-1])
    assert np.isfinite(logger.history["train/Loss_G"][-1])


def test_train_glow_runs_ddi(tmp_output):
    cfg = make_tiny_cfg("mcglow", tmp_dir=tmp_output, num_epochs=1)
    cfg["num_init_batches"] = 2
    exp = Experiment(cfg)
    logger = exp.run()
    assert np.isfinite(logger.history["train/Loss"][-1])


def test_train_glow_reversible_experiment(tmp_output):
    """The reversible-backprop flow stack (ops/reversible.py) through the
    full production Experiment: DDI (scan path) + custom-VJP train steps +
    checkpointing compose."""
    cfg = make_tiny_cfg("mcglow", tmp_dir=tmp_output, num_epochs=1)
    cfg["num_init_batches"] = 2
    cfg["glow"] = dict(cfg["glow"], scan_flows=True, K=2, L=2,
                       reversible_flows=True)
    exp = Experiment(cfg)
    logger = exp.run()
    assert np.isfinite(logger.history["train/Loss"][-1])


def test_train_classifier_accuracy_improves(tmp_output):
    exp, logger = _run("classifier", tmp_output, epochs=3,
                       limit_train_batches=None, limit_eval_batches=None)
    acc = logger.history["test/Accuracy"]
    assert acc[-1] > 15.0  # 10 classes, synthetic blobs are separable


def test_resume_mode_1_continues(tmp_output):
    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=2)
    exp1 = Experiment(cfg)
    exp1.run()
    hist1 = len(exp1.logger.history["train/Loss"])
    cfg2 = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=4,
                         resume_mode=1)
    exp2 = Experiment(cfg2)
    exp2.run()
    # epochs 3 and 4 appended to the restored history
    assert len(exp2.logger.history["train/Loss"]) == hist1 + 2
    # resumed metrics must NOT blend with the checkpoint epoch's stale
    # running means (the checkpoint pickles the logger pre-reset; round-3
    # crash/resume equality run caught the first resumed epoch averaging
    # itself with the checkpointed epoch): an uninterrupted 4-epoch run
    # logs the same per-epoch values
    cfg3 = make_tiny_cfg("mcvae", tmp_dir=tmp_output + "/uninterrupted",
                         num_epochs=4)
    exp3 = Experiment(cfg3)
    exp3.run()
    for k in ("train/Loss", "test/Loss"):
        a = [round(v, 5) for v in exp3.logger.history[k]]
        b = [round(v, 5) for v in exp2.logger.history[k]]
        assert a == b, (k, a, b)
    # the host eval key chain rides in the checkpoint (payload "eval_rng"),
    # so eval-time SAMPLING metrics are bit-continuous across a resume too:
    # the resumed run's final chain equals the uninterrupted run's
    assert np.array_equal(np.asarray(exp2.rng), np.asarray(exp3.rng))


def test_resume_mode_2_warm_start(tmp_output):
    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=1)
    Experiment(cfg).run()
    cfg2 = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=1,
                         resume_mode=2)
    exp2 = Experiment(cfg2)
    exp2.run()
    assert len(exp2.logger.history["train/Loss"]) == 1  # fresh logger


def test_profile_dir_produces_trace(tmp_output):
    """cfg['profile_dir'] wires jax.profiler into the epoch loop (§5.1)."""
    import glob

    prof = os.path.join(tmp_output, "prof")
    _run("classifier", tmp_output, profile_dir=prof, profile_warmup=1,
         profile_steps=2)
    assert glob.glob(os.path.join(prof, "**", "*.xplane.pb"), recursive=True)


def test_scheduler_reduces_lr_on_plateau(tmp_output):
    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=1)
    exp = Experiment(cfg)
    exp.setup()
    exp.scheduler.cfg["patience"] = 0
    lr0 = exp.scheduler.lr
    exp.scheduler.step(1.0)
    exp.scheduler.step(1.0)  # no improvement → reduce
    assert exp.scheduler.lr < lr0


def test_async_checkpointer_survives_donation(tmp_output):
    """The writer thread must see a snapshot that outlives the train step's
    buffer donation (regression: 'Array has been deleted' / corrupted reads
    when the next epoch's donated step consumed the live TrainState while
    the writer was still fetching it)."""
    import jax
    import jax.numpy as jnp

    from mcgm_tpu.io.checkpoint import AsyncCheckpointer, load_checkpoint

    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output)
    x = jnp.arange(16, dtype=jnp.float32)
    jax.block_until_ready(x)
    ck = AsyncCheckpointer()
    ck.submit(cfg, "donation_test", {"model_dict": {"w": x}, "epoch": 1})
    # donate x away immediately — the classic race window
    burn = jax.jit(lambda t: t * 2, donate_argnums=0)
    y = burn(x)
    jax.block_until_ready(y)
    ck.wait()
    ckpt = load_checkpoint(cfg, "donation_test")
    assert np.array_equal(ckpt["model_dict"]["w"],
                          np.arange(16, dtype=np.float32))


def test_async_checkpointer_surfaces_writer_errors(tmp_output):
    """A failed write (full disk, unpicklable payload) must raise on the
    main thread at the next wait()/submit(), not die silently in the
    writer thread leaving stale checkpoints (code-review finding)."""
    import pytest

    from mcgm_tpu.io import checkpoint as ck

    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output)
    c = ck.AsyncCheckpointer()

    def boom(*a, **k):
        raise IOError("disk full")

    orig = ck.save_checkpoint
    ck.save_checkpoint = boom
    try:
        c.submit(cfg, "errtest", {"epoch": 1})
        with pytest.raises(RuntimeError, match="async checkpoint"):
            c.wait()
    finally:
        ck.save_checkpoint = orig
    # error is consumed: the next cycle works again
    c.submit(cfg, "errtest", {"epoch": 2})
    c.wait()


def test_save_is_atomic(tmp_path):
    """save() must never leave a truncated file at the destination: the
    write goes to .tmp and is os.replace'd (code-review finding: the async
    writer can be killed mid-write at interpreter exit)."""
    from mcgm_tpu.utils import load, save

    p = str(tmp_path / "x.pkl")
    save({"a": 1}, p)
    assert load(p) == {"a": 1}
    assert not os.path.exists(p + ".tmp")
    # numpy mode keeps np.save's suffix convention
    pn = str(tmp_path / "y")
    save(np.arange(3), pn, mode="numpy")
    assert np.array_equal(load(pn + ".npy", mode="numpy"), np.arange(3))


def test_steps_per_dispatch_matches_single(tmp_output):
    """k steps fused into one lax.scan dispatch must reproduce k sequential
    dispatches exactly (same rng chain, same batch order, same metrics)."""
    cfg1 = make_tiny_cfg("mcvae", tmp_dir=os.path.join(tmp_output, "a"),
                         limit_train_batches=4, steps_per_dispatch=1)
    exp1 = Experiment(cfg1)
    log1 = exp1.run()
    cfg2 = make_tiny_cfg("mcvae", tmp_dir=os.path.join(tmp_output, "b"),
                         limit_train_batches=4, steps_per_dispatch=2)
    exp2 = Experiment(cfg2)
    log2 = exp2.run()
    h1 = log1.history["train/Loss"]
    h2 = log2.history["train/Loss"]
    assert len(h1) == len(h2)
    np.testing.assert_allclose(h1, h2, rtol=1e-6)


def test_eval_multi_dispatch_matches_single(tmp_output):
    """Fused eval dispatch must reproduce the sequential eval exactly
    (same rng key chain carried through the scan)."""
    h = {}
    for k in (1, 2):
        cfg = make_tiny_cfg("mcvae", tmp_dir=os.path.join(tmp_output, str(k)),
                            limit_train_batches=2, limit_eval_batches=4,
                            steps_per_dispatch=k)
        exp = Experiment(cfg)
        log = exp.run()
        h[k] = (log.history["test/Loss"], log.history["test/BCE"])
    np.testing.assert_allclose(h[1][0], h[2][0], rtol=1e-6)
    np.testing.assert_allclose(h[1][1], h[2][1], rtol=1e-6)


def test_dispatch_groups_handle_ragged_final_batch():
    """A smaller final batch must flush into its own group instead of being
    stacked with full-size batches (code-review finding: jnp.stack crashed
    at the end of every epoch when batch-count % k == 0 but N % bs != 0)."""
    import jax.numpy as jnp

    exp = object.__new__(Experiment)
    exp._steps_per_dispatch = 4
    exp.family = "vae"

    def mk(bs):
        return {"img": jnp.zeros((bs, 4)), "label": jnp.zeros((bs,), jnp.int32),
                "n": bs}

    loader = [mk(16), mk(16), mk(16), mk(8)]  # 4 batches, k=4, last ragged
    groups = list(exp._iter_dispatch_groups(loader, None))
    assert [len(g) for g, _ in groups] == [3, 1]
    assert [sum(ns) for _, ns in groups] == [48, 8]
    # and a clean multiple still forms full groups
    loader = [mk(16)] * 4 + [mk(8)]
    groups = list(exp._iter_dispatch_groups(loader, None))
    assert [len(g) for g, _ in groups] == [4, 1]


def test_gan_eval_fused_matches_host_path(tmp_output):
    """The fused on-device GAN eval (generate + features + moments in one
    dispatch per chunk, VERDICT r3 task 3) must produce the same IS/FID as
    the host path (sync images to host, re-extract features, np.cov)."""
    import jax.numpy as jnp

    from mcgm_tpu.evals.metrics import (batched_feature_probs,
                                        frechet_distance, inception_score)

    # classifier trains uncontrolled (reference make.py:51-54): tag
    # 0_Synthetic_label_classifier_best, which classifier_tag() resolves
    _run("classifier", tmp_output, control_name="None")
    exp, logger = _run("mcgan", tmp_output, d_iter=2)
    is_fused = logger.history["test/InceptionScore"][-1]
    fid_fused = logger.history["test/FID"][-1]
    assert np.isfinite(is_fused) and np.isfinite(fid_fused)
    assert exp._last_eval_seconds > 0

    cfg = exp.cfg
    C = np.tile(np.arange(cfg["classes_size"]), cfg["generate_per_mode"])
    variables = exp._model_variables()
    chunk = cfg["batch_size"]["test"]
    imgs = []
    for i in range(0, len(C), chunk):
        Ci = jnp.asarray(C[i:i + chunk], jnp.int32)
        zi = exp.fixed_z[i:i + chunk]
        imgs.append(np.asarray(exp.generate_fn(variables, Ci, zi)))
    generated = np.concatenate(imgs)
    feats, probs = batched_feature_probs(exp.feature_fn, generated)
    is_host = inception_score(probs, 1)
    mu1, sigma1 = exp.real_stats
    fid_host = frechet_distance(mu1, sigma1, feats.mean(0).astype(np.float64),
                                np.cov(feats.astype(np.float64), rowvar=False))
    assert abs(is_host - is_fused) < 1e-4, (is_host, is_fused)
    assert abs(fid_host - fid_fused) < max(1e-3 * abs(fid_host), 1e-3), \
        (fid_host, fid_fused)

    # cfg['is_splits'] must flow into the in-loop fused eval (same seed →
    # identical training → identical probs; only the split count changes)
    _, logger2 = _run("mcgan", tmp_output, d_iter=2, is_splits=2)
    is_fused_s2 = logger2.history["test/InceptionScore"][-1]
    assert abs(is_fused_s2 - inception_score(probs, 2)) < 1e-4, \
        (is_fused_s2, inception_score(probs, 2))


def test_glow_resume_mode_1_exact(tmp_output):
    """Glow resume must NOT re-run ActNorm data-dependent init (the
    checkpointed params already carry it; _load_model_variables clears
    _ddi_pending) and must land exactly where an uninterrupted run does —
    params AND per-epoch metrics."""
    import jax

    cfg = make_tiny_cfg("mcglow", tmp_dir=tmp_output, num_epochs=2)
    Experiment(cfg).run()
    cfg2 = make_tiny_cfg("mcglow", tmp_dir=tmp_output, num_epochs=4,
                         resume_mode=1)
    exp2 = Experiment(cfg2)
    exp2.run()
    cfg3 = make_tiny_cfg("mcglow", tmp_dir=tmp_output + "/uninterrupted",
                         num_epochs=4)
    exp3 = Experiment(cfg3)
    exp3.run()
    # train history exact: the train rng rides the checkpointed TrainState
    a = [round(v, 5) for v in exp3.logger.history["train/Loss"]]
    b = [round(v, 5) for v in exp2.logger.history["train/Loss"]]
    assert a == b, (a, b)
    # eval draws dequantization noise from the HOST rng stream, which is not
    # checkpointed (the reference saves no RNG state either) — noise-level
    # tolerance, not bit equality
    for x, y in zip(exp3.logger.history["test/Loss"],
                    exp2.logger.history["test/Loss"]):
        assert abs(x - y) < 1e-3, (x, y)
    # final params exactly equal — DDI must NOT re-run on resume
    for (p, x), (_, y) in zip(
            jax.tree_util.tree_leaves_with_path(exp3.ts.params),
            jax.tree_util.tree_leaves_with_path(exp2.ts.params)):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=jax.tree_util.keystr(p))


def test_train_tensorboard_backend_writes_events(tmp_output):
    pytest.importorskip("torch.utils.tensorboard")
    import glob

    _run("mcvae", tmp_output, log_backend="both")
    runs = glob.glob(os.path.join(tmp_output, "runs", "train_*"))
    assert runs, "no run dir created"
    assert any("tfevents" in f for f in os.listdir(runs[0]))
    assert os.path.exists(os.path.join(runs[0], "scalars.jsonl"))


def test_family_overrides_isolated_between_experiments(tmp_output):
    """Mutating one Experiment's cfg in place must not leak into the next:
    apply_family_overrides deep-copies its override values (a shallow update
    aliased metric_name into the module-global _OVERRIDES, so an edit like
    the one below contaminated every later GAN Experiment in the process —
    the mid-epoch resume test caught it as a phantom DBI metric)."""
    cfg1 = make_tiny_cfg("mcgan", tmp_dir=tmp_output)
    exp1 = Experiment(cfg1)
    exp1.cfg["metric_name"]["test"].append("DBI")
    exp2 = Experiment(make_tiny_cfg("mcgan", tmp_dir=tmp_output))
    assert exp2.cfg["metric_name"]["test"] == ["InceptionScore", "FID"]


def test_gan_eval_rejects_unsupported_metric(tmp_output):
    """The fused in-loop GAN eval scores IS/FID only (the reference's GAN
    protocol); any other configured test metric must fail fast with
    guidance, not crash in the moments path or print 0.0 silently."""
    cfg = make_tiny_cfg("mcgan", tmp_dir=tmp_output, num_epochs=1)
    exp = Experiment(cfg)
    exp.cfg["metric_name"]["test"] = ["InceptionScore", "FID", "DBI"]
    with pytest.raises(ValueError, match="InceptionScore/FID only"):
        exp.run()


def test_sigterm_preemption_stops_at_epoch_boundary_and_resumes(tmp_output):
    """Cloud-TPU preemption contract: SIGTERM mid-run stops the loop at the
    next epoch boundary (that epoch's checkpoint already written), the
    process survives (cooperative handler, no KeyboardInterrupt-style
    unwind), and resume_mode=1 continues to the target exactly as if
    uninterrupted."""
    import os
    import signal

    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=5)
    exp = Experiment(cfg)
    orig_test_epoch = Experiment.test_epoch

    def test_epoch_and_preempt(self, epoch):
        orig_test_epoch(self, epoch)
        if epoch == 2:  # grace-window signal arrives mid-run
            os.kill(os.getpid(), signal.SIGTERM)

    try:
        Experiment.test_epoch = test_epoch_and_preempt
        logger = exp.run()
    finally:
        Experiment.test_epoch = orig_test_epoch
    assert len(logger.history["train/Loss"]) == 2  # stopped after epoch 2
    # the handler was restored (a later SIGTERM must not be swallowed)
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL,
                                                signal.default_int_handler,
                                                signal.Handlers.SIG_DFL)

    cfg2 = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=5,
                         resume_mode=1)
    logger2 = Experiment(cfg2).run()
    assert len(logger2.history["train/Loss"]) == 5  # epochs 3..5 appended


def test_dispatch_watchdog_trips_on_wedged_fetch(tmp_output):
    """A wedged device/tunnel makes a blocking fetch hang forever (the
    epoch-154 wedge in docs/artifacts/convergence_200ep_mcgan.json); the
    dispatch watchdog must trip after cfg['dispatch_timeout'] seconds and
    invoke the exit path (logger flushed, bounded writer join, exit code
    3). The exit hook is injected so the trip is observable in-process."""
    import time as _time

    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=1,
                        dispatch_timeout=1)
    exp = Experiment(cfg)
    trips = []
    exp._wedge_exit = lambda code: trips.append(code)
    orig = Experiment._blocking_fetch

    def slow_fetch(self, buffered, names):
        _time.sleep(2.5)  # longer than the 1s budget -> watchdog fires
        return orig(self, buffered, names)

    try:
        Experiment._blocking_fetch = slow_fetch
        exp.run()
    finally:
        Experiment._blocking_fetch = orig
    assert trips and all(c == 3 for c in trips)

    # negative budget disables the watchdog entirely
    cfg2 = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=1,
                         dispatch_timeout=-1)
    exp2 = Experiment(cfg2)
    trips2 = []
    exp2._wedge_exit = lambda code: trips2.append(code)
    try:
        Experiment._blocking_fetch = slow_fetch
        exp2.run()
    finally:
        Experiment._blocking_fetch = orig
    assert not trips2


def test_dispatch_watchdog_tolerates_slow_checkpoint_writer(tmp_output):
    """A SLOW host-side checkpoint write (pickle+disk on a contended core)
    is not a device wedge: the writer join happens OUTSIDE the watchdog
    guard, so a write that far exceeds the budget must NOT trip it.
    Regression: guarding the join killed healthy 12-seed glow sweeps whose
    per-epoch checkpoint payloads out-wrote the budget floor."""
    import time as _time

    from mcgm_tpu.io import checkpoint as ck

    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=2,
                        dispatch_timeout=2)
    exp = Experiment(cfg)
    trips = []
    exp._wedge_exit = lambda code: trips.append(code)
    orig = ck.save_checkpoint

    def slow_save(*a, **k):
        _time.sleep(5)  # >> the 2s budget; epoch 2's submit joins this
        return orig(*a, **k)

    try:
        ck.save_checkpoint = slow_save
        exp.run()
    finally:
        ck.save_checkpoint = orig
    assert not trips, f"watchdog tripped on a slow host write: {trips}"


def test_dispatch_watchdog_exit_leaves_resumable_checkpoint(tmp_output):
    """Full exit path in a real subprocess: fetches start hanging forever
    once epoch 1's checkpoint is on disk — the run must exit nonzero (code
    3) via the watchdog instead of eating the whole job timeout, and the
    checkpoint left behind must resume_mode=1 cleanly to completion."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(tmp_output, "wedge")
    ckpt = os.path.join(out_dir, "model",
                        "0_Synthetic_label_mcvae_0.5_checkpoint.pkl")
    script = os.path.join(tmp_output, "wedge_run.py")
    with open(script, "w") as f:
        f.write(f"""
import os, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from conftest import make_tiny_cfg
from mcgm_tpu.train.loop import Experiment

orig = Experiment._blocking_fetch

def wedged(self, buffered, names):
    if os.path.exists({ckpt!r}):
        time.sleep(3600)   # the tunnel never answers again
    return orig(self, buffered, names)

Experiment._blocking_fetch = wedged
cfg = make_tiny_cfg("mcvae", tmp_dir={out_dir!r}, num_epochs=3,
                    dispatch_timeout=2)
Experiment(cfg).run()
print("UNREACHABLE: run completed despite wedge")
""")
    proc = subprocess.run([sys.executable, script], capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 3, (proc.returncode, proc.stdout[-2000:],
                                  proc.stderr[-2000:])
    assert "dispatch watchdog" in proc.stdout
    assert "UNREACHABLE" not in proc.stdout
    # the checkpoint on disk is epoch 1's, intact and resumable
    from mcgm_tpu.utils import load

    payload = load(ckpt)
    assert payload["epoch"] == 2  # resume re-enters at epoch 2
    cfg2 = make_tiny_cfg("mcvae", tmp_dir=out_dir, num_epochs=3,
                         resume_mode=1, dispatch_timeout=-1)
    logger = Experiment(cfg2).run()
    assert len(logger.history["train/Loss"]) == 3


def test_mid_epoch_checkpoint_resume_bit_equal(tmp_output):
    """save_every_steps>0 + a crash between mid-epoch checkpoints: resuming
    with resume_mode=1 re-enters the unfinished epoch at the saved step and
    lands on EXACTLY the uninterrupted run's final params and logged
    history (deterministic loader order per (seed, epoch), checkpointed
    train rng and partial logger means)."""
    import jax

    # uninterrupted reference
    cfg_a = make_tiny_cfg("mcvae", tmp_dir=tmp_output + "/a", num_epochs=2,
                          save_every_steps=2, steps_per_dispatch=1)
    logger_a = Experiment(cfg_a).run()

    # crashed run: die right after the mid-epoch checkpoint of epoch 2
    class Crash(RuntimeError):
        pass

    cfg_b = make_tiny_cfg("mcvae", tmp_dir=tmp_output + "/b", num_epochs=2,
                          save_every_steps=2, steps_per_dispatch=1)
    exp_b = Experiment(cfg_b)
    orig = Experiment._checkpoint

    def crashing(self, epoch, copy_to_best=False, mid_step=None):
        orig(self, epoch, copy_to_best=copy_to_best, mid_step=mid_step)
        if epoch == 2 and mid_step:
            raise Crash()

    try:
        Experiment._checkpoint = crashing
        with pytest.raises(Crash):
            exp_b.run()
    finally:
        Experiment._checkpoint = orig

    cfg_b2 = make_tiny_cfg("mcvae", tmp_dir=tmp_output + "/b", num_epochs=2,
                           save_every_steps=2, steps_per_dispatch=1,
                           resume_mode=1)
    exp_b2 = Experiment(cfg_b2)
    logger_b = exp_b2.run()

    # logged history identical (incl. the resumed epoch's blended means)
    for k in logger_a.history:
        if k.endswith("info"):
            continue
        np.testing.assert_array_equal(
            np.asarray(logger_a.history[k]), np.asarray(logger_b.history[k]),
            err_msg=k)
    # final model/opt state bit-equal
    from mcgm_tpu.io.checkpoint import load_checkpoint

    ck_a = load_checkpoint(cfg_a, Experiment(cfg_a).tag, "checkpoint")
    ck_b = load_checkpoint(cfg_b2, exp_b2.tag, "checkpoint")
    assert ck_a["epoch"] == ck_b["epoch"] == 3
    assert "mid_epoch_step" not in ck_b
    la = jax.tree_util.tree_leaves_with_path(ck_a["model_dict"])
    lb = {jax.tree_util.keystr(p): v for p, v
          in jax.tree_util.tree_leaves_with_path(ck_b["model_dict"])}
    assert len(la) == len(lb)
    for p, va in la:
        np.testing.assert_array_equal(np.asarray(va),
                                      np.asarray(lb[jax.tree_util.keystr(p)]),
                                      err_msg=jax.tree_util.keystr(p))


def test_sigterm_mid_epoch_with_step_checkpoints_resumes_bit_equal(tmp_output):
    """With save_every_steps on, SIGTERM stops INSIDE the epoch at the next
    dispatch-group boundary (one-group grace window), writing a mid-epoch
    checkpoint; resume_mode=1 re-enters at that exact step and the final
    state equals an uninterrupted run bit-for-bit."""
    import os
    import signal

    import jax

    kw = dict(num_epochs=2, save_every_steps=1, steps_per_dispatch=1)
    cfg_a = make_tiny_cfg("mcvae", tmp_dir=tmp_output + "/a", **kw)
    logger_a = Experiment(cfg_a).run()

    cfg_b = make_tiny_cfg("mcvae", tmp_dir=tmp_output + "/b", **kw)
    exp_b = Experiment(cfg_b)
    orig_prep = Experiment._prep_batch
    calls = {"n": 0}

    def prep_and_signal(self, batch):
        calls["n"] += 1
        # epoch-1 consumes 4 TRAIN preps + 3 EVAL preps (the eval loop also
        # goes through _prep_batch); call 9 is epoch-2 train step 2
        if calls["n"] == 9:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_prep(self, batch)

    try:
        Experiment._prep_batch = prep_and_signal
        logger_mid = exp_b.run()
    finally:
        Experiment._prep_batch = orig_prep
    # stopped mid-epoch 2: only epoch 1 is in history
    assert len(logger_mid.history["train/Loss"]) == 1
    # and it was the MID-EPOCH preempt branch, not the epoch boundary:
    from mcgm_tpu.io.checkpoint import load_checkpoint as _lc

    ck_mid = _lc(cfg_b, exp_b.tag, "checkpoint")
    assert ck_mid["epoch"] == 2 and ck_mid["mid_epoch_step"] == 2

    cfg_b2 = make_tiny_cfg("mcvae", tmp_dir=tmp_output + "/b", resume_mode=1,
                           **kw)
    exp_b2 = Experiment(cfg_b2)
    logger_b = exp_b2.run()
    for k in logger_a.history:
        if k.endswith("info"):
            continue
        np.testing.assert_array_equal(
            np.asarray(logger_a.history[k]), np.asarray(logger_b.history[k]),
            err_msg=k)
    from mcgm_tpu.io.checkpoint import load_checkpoint

    ck_a = load_checkpoint(cfg_a, Experiment(cfg_a).tag, "checkpoint")
    ck_b = load_checkpoint(cfg_b2, exp_b2.tag, "checkpoint")
    assert ck_a["epoch"] == ck_b["epoch"] == 3
    la = jax.tree_util.tree_leaves_with_path(ck_a["model_dict"])
    lb = {jax.tree_util.keystr(p): v for p, v
          in jax.tree_util.tree_leaves_with_path(ck_b["model_dict"])}
    for p, va in la:
        np.testing.assert_array_equal(np.asarray(va),
                                      np.asarray(lb[jax.tree_util.keystr(p)]),
                                      err_msg=jax.tree_util.keystr(p))


def test_mid_epoch_resume_gan_family_bit_equal(tmp_output):
    """Step-level resume for the sharpest stateful family: the fused 5:1 GAN
    step carries dual optimizer states, spectral-norm power-iteration state,
    and BN batch stats — a crash after a mid-epoch checkpoint must still
    resume to the uninterrupted run's exact final state."""
    import jax

    kw = dict(num_epochs=2, save_every_steps=2, steps_per_dispatch=1,
              d_iter=2)
    cfg_a = make_tiny_cfg("mcgan", tmp_dir=tmp_output + "/a", **kw)
    logger_a = Experiment(cfg_a).run()

    class Crash(RuntimeError):
        pass

    cfg_b = make_tiny_cfg("mcgan", tmp_dir=tmp_output + "/b", **kw)
    exp_b = Experiment(cfg_b)
    orig = Experiment._checkpoint

    def crashing(self, epoch, copy_to_best=False, mid_step=None):
        orig(self, epoch, copy_to_best=copy_to_best, mid_step=mid_step)
        if epoch == 2 and mid_step:
            raise Crash()

    try:
        Experiment._checkpoint = crashing
        with pytest.raises(Crash):
            exp_b.run()
    finally:
        Experiment._checkpoint = orig

    cfg_b2 = make_tiny_cfg("mcgan", tmp_dir=tmp_output + "/b", resume_mode=1,
                           **kw)
    exp_b2 = Experiment(cfg_b2)
    logger_b = exp_b2.run()
    for k in logger_a.history:
        if k.endswith("info"):
            continue
        np.testing.assert_array_equal(
            np.asarray(logger_a.history[k]), np.asarray(logger_b.history[k]),
            err_msg=k)
    from mcgm_tpu.io.checkpoint import load_checkpoint

    ck_a = load_checkpoint(cfg_a, Experiment(cfg_a).tag, "checkpoint")
    ck_b = load_checkpoint(cfg_b2, exp_b2.tag, "checkpoint")
    assert ck_a["epoch"] == ck_b["epoch"] == 3
    for part in ("model_dict", "optimizer_dict"):
        la = jax.tree_util.tree_leaves_with_path(ck_a[part])
        lb = {jax.tree_util.keystr(p): v for p, v
              in jax.tree_util.tree_leaves_with_path(ck_b[part])}
        assert len(la) == len(lb)
        for p, va in la:
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(lb[jax.tree_util.keystr(p)]),
                err_msg=f"{part}{jax.tree_util.keystr(p)}")


@pytest.mark.parametrize("model_name,extra", [
    ("mcglow", {"num_init_batches": 2}),  # DDI must not re-run on resume
    ("vqvae", {}),                        # VQ-EMA state rides model_dict
])
def test_mid_epoch_resume_stateful_families_bit_equal(tmp_output, model_name,
                                                      extra):
    """Step-level resume across the remaining stateful families: glow
    (data-dependent ActNorm init + noise rng chain) and vqvae (EMA codebook
    state) resume from a mid-epoch checkpoint to the uninterrupted run's
    exact final state."""
    import jax

    # NOTE: no kw["glow"] here — make_tiny_cfg overwrites cfg["glow"]
    # wholesale after applying overrides, so the conftest tiny glow config
    # (K=2, L=3, unscanned) is what actually runs
    kw = dict(num_epochs=2, save_every_steps=2, steps_per_dispatch=1, **extra)
    cfg_a = make_tiny_cfg(model_name, tmp_dir=tmp_output + "/a", **kw)
    logger_a = Experiment(cfg_a).run()

    class Crash(RuntimeError):
        pass

    cfg_b = make_tiny_cfg(model_name, tmp_dir=tmp_output + "/b", **kw)
    exp_b = Experiment(cfg_b)
    orig = Experiment._checkpoint

    def crashing(self, epoch, copy_to_best=False, mid_step=None):
        orig(self, epoch, copy_to_best=copy_to_best, mid_step=mid_step)
        if epoch == 2 and mid_step:
            raise Crash()

    try:
        Experiment._checkpoint = crashing
        with pytest.raises(Crash):
            exp_b.run()
    finally:
        Experiment._checkpoint = orig

    cfg_b2 = make_tiny_cfg(model_name, tmp_dir=tmp_output + "/b",
                           resume_mode=1, **kw)
    exp_b2 = Experiment(cfg_b2)
    logger_b = exp_b2.run()
    np.testing.assert_array_equal(
        np.asarray(logger_a.history["train/Loss"]),
        np.asarray(logger_b.history["train/Loss"]))
    from mcgm_tpu.io.checkpoint import load_checkpoint

    ck_a = load_checkpoint(cfg_a, exp_b2.tag, "checkpoint")
    ck_b = load_checkpoint(cfg_b2, exp_b2.tag, "checkpoint")
    assert ck_a["epoch"] == ck_b["epoch"] == 3
    la = jax.tree_util.tree_leaves_with_path(ck_a["model_dict"])
    lb = {jax.tree_util.keystr(p): v for p, v
          in jax.tree_util.tree_leaves_with_path(ck_b["model_dict"])}
    assert len(la) == len(lb)
    for p, va in la:
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(lb[jax.tree_util.keystr(p)]),
            err_msg=jax.tree_util.keystr(p))


def test_diverged_epoch_never_wins_best(tmp_output):
    """A NaN pivot metric (glow's all-NaN eval loss) must never be copied to
    ``_best`` nor stored as the running pivot (VERDICT r4 weak #1): epoch 2
    (the only finite epoch) must own _best at the end."""
    from mcgm_tpu.io.checkpoint import load_checkpoint

    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=3)
    exp = Experiment(cfg)
    orig_test_epoch = Experiment.test_epoch

    def nan_on_1_and_3(self, epoch):
        orig_test_epoch(self, epoch)
        if epoch != 2:
            self.logger.mean["test/BCE"] = float("nan")

    try:
        Experiment.test_epoch = nan_on_1_and_3
        exp.run()
    finally:
        Experiment.test_epoch = orig_test_epoch
    best = load_checkpoint(exp.cfg, exp.tag, "best")
    assert best is not None and best["epoch"] == 3  # written after epoch 2


def test_fully_diverged_run_writes_no_best(tmp_output):
    """Every epoch non-finite ⇒ no ``_best`` ever (matching the reference,
    where NaN never beats the initial pivot); the per-epoch checkpoint still
    exists for resume."""
    from mcgm_tpu.io.checkpoint import load_checkpoint

    cfg = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=2)
    exp = Experiment(cfg)
    orig_test_epoch = Experiment.test_epoch

    def always_nan(self, epoch):
        orig_test_epoch(self, epoch)
        self.logger.mean["test/BCE"] = float("nan")

    try:
        Experiment.test_epoch = always_nan
        exp.run()
    finally:
        Experiment.test_epoch = orig_test_epoch
    assert load_checkpoint(exp.cfg, exp.tag, "best") is None
    assert load_checkpoint(exp.cfg, exp.tag, "checkpoint") is not None
    # NaN epochs also never seed the pivot on resume: a finite epoch 3 must
    # immediately win _best
    cfg3 = make_tiny_cfg("mcvae", tmp_dir=tmp_output, num_epochs=3,
                         resume_mode=1)
    exp3 = Experiment(cfg3)
    exp3.run()
    best = load_checkpoint(exp3.cfg, exp3.tag, "best")
    assert best is not None and best["epoch"] == 4


def test_skip_nonfinite_updates_guard():
    """state.make_train_step(skip_nonfinite=True): a non-finite gradient
    drops the whole update (params/opt/state untouched, skipped=1) instead
    of letting clip_by_global_norm's NaN norm poison every parameter — the
    round-5 cglow bf16 divergence mechanism. Finite steps are bit-identical
    to the unguarded step."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (TrainState, make_train_step,
                                      split_variables)

    class M(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            y = nn.Dense(4)(batch["img"])
            return {"loss": jnp.mean((y - 1.0) ** 2)}

    m = M()
    rng = jax.random.PRNGKey(0)
    good = {"img": jnp.ones((2, 4))}
    bad = {"img": jnp.full((2, 4), jnp.nan)}
    v = m.init(rng, good)
    params, state = split_variables(v)
    opt = make_optimizer({"optimizer_name": "Adam", "lr": 1e-2,
                          "weight_decay": 0}, grad_clip=1.0)
    ts0 = TrainState(params=params, state=state, opt_state=opt.init(params),
                     rng=rng)
    guarded = jax.jit(make_train_step(m, opt, skip_nonfinite=True))
    plain = jax.jit(make_train_step(m, opt))

    # non-finite grads: params/opt unchanged, flagged
    ts1, aux = guarded(ts0, bad)
    assert float(aux["skipped"]) == 1.0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ts1.params, ts0.params)
    # ...while the unguarded step would have been poisoned
    tsx, _ = plain(ts0, bad)
    assert not np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(tsx.params)[0])).all()

    # finite grads: guarded == unguarded bit-for-bit, flagged 0
    ts2, aux2 = guarded(ts0, good)
    tsy, _ = plain(ts0, good)
    assert float(aux2["skipped"]) == 0.0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ts2.params, tsy.params)
