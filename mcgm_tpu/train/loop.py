"""Experiment runner: the epoch-loop template shared by all six trainers.

Behavioral port of the reference trainer scripts (train_vae/train_gan/
train_glow/train_pixelcnn/train_vqvae/train_classifier.py), which differ only
in per-family config overrides and three hooks:

- GAN: dual optimizers, fused 5:1 D/G step, fixed-z generation eval with
  IS/FID pivot (reference train_gan.py:139-220);
- Glow: ActNorm data-dependent init over the first ``num_init_batches``
  batches before training (train_glow.py:60-67);
- PixelCNN: batches are code grids from the frozen best VQ-VAE
  (train_pixelcnn.py:44-45, 111-113).

Checkpoints every epoch + ``_best`` copy on pivot improvement, resume modes
0/1/2, batch-size-weighted logging with ETA lines — all per the reference
protocol. The per-batch work is one jitted step; batches stream to the device
(or to a sharded mesh placement for data parallelism).
"""

from __future__ import annotations

import contextlib
import copy
import datetime
import os
import threading
import time
from dataclasses import replace
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import make_model_tag, process_control
from ..data import fetch_dataset, make_data_loader, process_dataset
from ..evals.features import extract_real_features, make_feature_fn
from ..evals.metrics import make_device_metrics
from ..io.checkpoint import AsyncCheckpointer, load_checkpoint
from ..models import build_model
from ..report.logger import Logger
from ..report.profiling import StepTimer
from .optim import Scheduler, make_optimizer, set_learning_rate
from .state import (GANTrainState, TrainState, make_eval_step,
                    make_gan_train_step, make_train_step, merge_variables,
                    split_variables)

FAMILY = {
    "mcvae": "vae", "cvae": "vae", "vqvae": "vqvae", "classifier": "classifier",
    "mcgan": "gan", "cgan": "gan", "mcglow": "glow", "cglow": "glow",
    "mcpixelcnn": "pixelcnn", "cpixelcnn": "pixelcnn",
}

RNG_STREAMS = {"vae": ("reparam",), "glow": ("noise",)}

# Module-level overrides of the reference trainer scripts
# (train_vae.py:29-36, train_glow.py:30-38, train_pixelcnn.py:29-35,
#  train_vqvae.py:29-36, train_classifier.py:29-36, train_gan.py:29-56).
_OVERRIDES = {
    "vae": dict(pivot_metric="BCE", pivot_mode="min",
                metric_name={"train": ["Loss", "BCE"], "test": ["Loss", "BCE"]},
                optimizer_name="Adam", lr=3e-4, weight_decay=0,
                scheduler_name="ReduceLROnPlateau", grad_clip=1.0),
    "glow": dict(pivot_metric="Loss", pivot_mode="min",
                 metric_name={"train": ["Loss"], "test": ["Loss"]},
                 optimizer_name="Adam", lr=3e-4, weight_decay=0,
                 scheduler_name="ReduceLROnPlateau", num_init_batches=8,
                 grad_clip=1.0,
                 # ride through the first-update transient (round-5 cglow
                 # root-cause): 16 steps of linear warmup — negligible on
                 # the CIFAR protocol (391 steps/epoch), decisive for
                 # full-width cglow stability
                 lr_warmup_steps=16),
    "pixelcnn": dict(pivot_metric="NLL", pivot_mode="min",
                     metric_name={"train": ["Loss", "NLL"], "test": ["Loss", "NLL"]},
                     optimizer_name="Adam", lr=3e-4, weight_decay=0,
                     scheduler_name="ReduceLROnPlateau", grad_clip=1.0),
    "vqvae": dict(pivot_metric="MSE", pivot_mode="min",
                  metric_name={"train": ["Loss", "MSE"], "test": ["Loss", "MSE"]},
                  optimizer_name="Adam", lr=3e-4, weight_decay=0,
                  scheduler_name="ReduceLROnPlateau", grad_clip=1.0),
    "classifier": dict(pivot_metric="Accuracy", pivot_mode="max",
                       metric_name={"train": ["Loss", "Accuracy"],
                                    "test": ["Loss", "Accuracy"]},
                       optimizer_name="Adam", lr=1e-2,
                       scheduler_name="MultiStepLR", milestones=[100], factor=0.1,
                       grad_clip=1.0),
    "gan": dict(pivot_metric="InceptionScore", pivot_mode="max",
                metric_name={"train": ["Loss", "Loss_D", "Loss_G"],
                             "test": ["InceptionScore", "FID"]},
                optimizer_name="Adam", weight_decay=0, scheduler_name="None",
                loss_type="Hinge", grad_clip=None,
                # measured NOT to help the fused 5:1 step (DESIGN.md:
                # 4,640 vs 4,717 img/s at k=4) — its 26 ms of compute
                # already hides dispatch latency
                steps_per_dispatch=1),
}


def apply_family_overrides(cfg: dict) -> dict:
    cfg = dict(cfg)
    fam = FAMILY[cfg["model_name"]]
    # deepcopy: the override values hold nested dicts/lists (metric_name,
    # milestones); a shallow update would alias them into cfg, where any
    # later in-place mutation (e.g. editing exp.cfg['metric_name']['test'])
    # silently contaminates _OVERRIDES and every subsequent Experiment in
    # the process — including the other seeds of a run_experiments sweep
    cfg.update(copy.deepcopy(_OVERRIDES[fam]))
    cfg["family"] = fam
    if fam == "gan":
        # betas differ between mcgan and cgan (reference train_gan.py:33-55)
        betas = (0.5, 0.999) if cfg["model_name"] == "mcgan" else (0.0, 0.9)
        cfg["gan_opt"] = {"lr": {"generator": 2e-4, "discriminator": 2e-4},
                          "iter": {"generator": 1,
                                   "discriminator": cfg.get("d_iter", 5)},
                          "betas": {"generator": betas, "discriminator": betas}}
    return cfg


class Experiment:
    """One seed of one (data, model, control) cell — reference runExperiment."""

    def __init__(self, cfg: dict, seed: int | None = None, mesh=None):
        cfg = process_control(cfg)
        cfg = apply_family_overrides(cfg)
        self.seed = cfg["init_seed"] if seed is None else seed
        cfg["model_tag"] = make_model_tag(cfg, self.seed)
        self.cfg = cfg
        self.tag = cfg["model_tag"]
        self.family = cfg["family"]
        self.mesh = mesh
        self.logger = None
        self._ckpt_writer = AsyncCheckpointer()

    # ------------------------------------------------------------- setup
    def setup(self):
        cfg = self.cfg
        # production mixed precision: bf16 conv/matmul operands on TPU
        # (cfg['compute_dtype']: auto|float32|bfloat16), f32 master params.
        from ..ops.layers import resolve_compute_dtype, set_compute_dtype

        set_compute_dtype(resolve_compute_dtype(cfg.get("compute_dtype", "auto")))
        self.rng = jax.random.PRNGKey(self.seed)
        dataset = fetch_dataset(cfg["data_name"], cfg["subset"],
                                cfg.get("data_dir", "./data"))
        self.cfg = cfg = process_dataset(dataset["train"], cfg)
        sharding = None
        if self.mesh is not None:
            from ..parallel import data_sharding, spatial_data_sharding

            sharding = (spatial_data_sharding(self.mesh)
                        if "spatial" in self.mesh.axis_names
                        else data_sharding(self.mesh))
        self.dataset = dataset
        self.loaders = make_data_loader(dataset, cfg, seed=self.seed,
                                        sharding=sharding)
        if sharding is not None:
            # exact eval under SPMD: the train loader drops its final partial
            # batch (gradient correctness), so epoch eval — which the
            # reference runs on the TRAIN split (train_vae.py:77) — would
            # silently skip up to batch_size-1 samples. A dedicated padded
            # loader covers every sample exactly once; its 'w' mask drops
            # padded rows from every loss/metric mean.
            from ..data.loader import DataLoader as _DL

            self.loaders["train_eval"] = _DL(
                dataset["train"], cfg["batch_size"]["train"], shuffle=False,
                seed=self.seed, pad_to_batch=True, sharding=sharding)
        if cfg.get("reversible_flows") and cfg["family"] == "glow":
            if self.mesh is not None and "pipe" in self.mesh.axis_names:
                raise ValueError(
                    "reversible_flows and pipe_size are mutually exclusive "
                    "(the pipeline is its own flow-stack executor)")
            cfg["glow"] = dict(cfg["glow"], reversible_flows=True)
        if self.mesh is not None and "pipe" in self.mesh.axis_names:
            # pipeline-parallel flow stacks (parallel/pipeline.py): glow's
            # nn.scan-packed flows split over the mesh's pipe axis
            if cfg["family"] != "glow":
                raise ValueError(
                    "a 'pipe' mesh axis is supported for the glow family "
                    "only (its K flows are the homogeneous stack a pipeline "
                    f"wants); got family {cfg['family']!r}")
            from ..parallel import set_pipeline_mesh

            set_pipeline_mesh(self.mesh)
            cfg["glow"] = dict(cfg["glow"], pipe_axis="pipe",
                               pipe_microbatches=cfg.get("pipe_microbatches",
                                                         0))
        self.model = build_model(cfg)
        self.rng, init_key = jax.random.split(self.rng)
        self._build_family(init_key)
        self.train_metrics = make_device_metrics(
            [m for m in cfg["metric_name"]["train"]]
        )
        test_names = [m for m in cfg["metric_name"]["test"]
                      if m not in ("InceptionScore", "FID", "DBI")]
        self.test_metrics = make_device_metrics(test_names)

    def _example_batch(self, bs: int = 2):
        """Tiny init batch — parameter shapes don't depend on batch size."""
        cfg = self.cfg
        if self.family == "pixelcnn":
            grid = cfg["data_shape"][0] // 4
            img = jnp.zeros((bs, grid, grid), jnp.int32)
        else:
            img = jnp.zeros((bs, *cfg["data_shape"]), jnp.float32)
        return {"img": img, "label": jnp.zeros((bs,), jnp.int32)}

    def _init_variables(self, init_key):
        from .state import jit_init

        streams = RNG_STREAMS.get(self.family, ())
        rngs = {"params": init_key, "z": init_key,
                **{s: init_key for s in streams}}
        variables = jit_init(self.model, rngs, self._example_batch(), train=True)
        if self.mesh is not None:
            from ..parallel import replicate, shard_params

            if self.mesh.shape.get("model", 1) > 1:
                return shard_params(self.mesh, variables,
                                    self.cfg.get("tp_min_elements", 4096))
            return replicate(self.mesh, variables)
        return jax.device_put(variables, jax.devices()[0])

    def _place_state(self, ts, step):
        """Under a tensor-parallel mesh, place the train state by the TP
        policy and pin the step's output placement to match (otherwise XLA
        may return updated params replicated, undoing the sharding after one
        step). DP-only meshes and single-device runs pass through."""
        if self.mesh is not None and "pipe" in self.mesh.axis_names:
            from ..parallel import (shard_stacked_over_pipe, state_shardings,
                                    with_state_shardings)

            g = self.cfg["glow"]
            stack = g["K"] // max(int(g.get("scan_chunk", 1) or 1), 1)
            ts = shard_stacked_over_pipe(self.mesh, ts, stack_len=stack)
            return ts, with_state_shardings(step, state_shardings(ts))
        if self.mesh is None or self.mesh.shape.get("model", 1) <= 1:
            return ts, step
        from ..parallel import shard_params, state_shardings, with_state_shardings

        ts = shard_params(self.mesh, ts, self.cfg.get("tp_min_elements", 4096))
        return ts, with_state_shardings(step, state_shardings(ts))

    def _build_family(self, init_key):
        cfg = self.cfg
        fam = self.family
        streams = RNG_STREAMS.get(fam, ())
        if fam == "gan":
            variables = self._init_variables(init_key)
            params, state = split_variables(variables)
            go = cfg["gan_opt"]
            self.g_opt = make_optimizer(cfg, go["lr"]["generator"],
                                        go["betas"]["generator"])
            self.d_opt = make_optimizer(cfg, go["lr"]["discriminator"],
                                        go["betas"]["discriminator"])
            self.rng, sk = jax.random.split(self.rng)
            self.ts = GANTrainState(
                g_params=params["generator"], d_params=params["discriminator"],
                state=state,
                g_opt_state=self.g_opt.init(params["generator"]),
                d_opt_state=self.d_opt.init(params["discriminator"]),
                rng=sk,
            )
            self.scheduler = {"generator": Scheduler(cfg, go["lr"]["generator"]),
                              "discriminator": Scheduler(cfg, go["lr"]["discriminator"])}
            step = make_gan_train_step(self.model, self.g_opt, self.d_opt,
                                       d_iter=go["iter"]["discriminator"],
                                       loss_type=cfg["loss_type"],
                                       unroll=cfg.get("gan_scan_unroll", 1),
                                       remat=cfg.get("remat", False),
                                       fuse_g_pass=cfg.get("fuse_g_pass", False))
            self.ts, step = self._place_state(self.ts, step)
            self.train_step = jax.jit(step, donate_argnums=0)
            self._make_multi_step(step)
            self.generate_fn = jax.jit(
                lambda vars_, C, z: self.model.apply(vars_, C, z, False,
                                                     method="generate")
            )
            return
        # single-model families
        if fam == "pixelcnn":
            self._setup_frozen_ae()
        variables = self._init_variables(init_key)
        params, state = split_variables(variables)
        self.optimizer = make_optimizer(cfg, grad_clip=cfg.get("grad_clip"))
        self.rng, sk = jax.random.split(self.rng)
        self.ts = TrainState(params=params, state=state,
                             opt_state=self.optimizer.init(params), rng=sk)
        self.scheduler = Scheduler(cfg)
        step = make_train_step(self.model, self.optimizer,
                               rng_streams=streams,
                               remat=cfg.get("remat", False),
                               skip_nonfinite=self._skip_nonfinite())
        self.ts, step = self._place_state(self.ts, step)
        wrapped = self._wrap_metrics(step)
        self.train_step = jax.jit(wrapped, donate_argnums=0)
        self._make_multi_step(wrapped)
        ev = make_eval_step(self.model, rng_streams=streams)
        self._eval_raw = ev
        self._multi_eval_fn = None
        self.eval_step = jax.jit(ev)
        if fam == "glow":
            self._ddi_pending = True

    def _make_multi_step(self, base_step) -> None:
        """Compile the k-steps-per-dispatch variant when
        ``cfg['steps_per_dispatch'] > 1`` (host-dispatch amortization for
        small per-step families — see state.make_multi_train_step)."""
        k = int(self.cfg.get("steps_per_dispatch", 1))
        self._steps_per_dispatch = k
        if k > 1:
            from .state import make_multi_train_step

            self.train_step_multi = jax.jit(
                make_multi_train_step(base_step, k), donate_argnums=0)
        else:
            self.train_step_multi = None

    def _iter_dispatch_groups(self, loader, limit, skip: int = 0):
        """Yield ``(prepped_batches, ns)`` groups of up to
        ``steps_per_dispatch`` consecutive SAME-SHAPE batches. A ragged
        final batch (the single-device loader neither pads nor drops it)
        always flushes into its own group, so full-k groups are guaranteed
        stackable. Shared by the train and eval loops. ``skip`` drops the
        first ``skip`` batches (mid-epoch resume; ``limit`` stays an
        absolute batch index, so skip+limit cover the same epoch suffix an
        uninterrupted run would execute)."""
        k = getattr(self, "_steps_per_dispatch", 1)
        g, ns = [], []
        if skip and hasattr(loader, "iter_from"):
            it = enumerate(loader.iter_from(skip), start=skip)
        else:
            it = enumerate(loader)
        for i, batch in it:
            if limit and i >= limit:
                break
            if i < skip:
                continue
            n = batch["n"]
            b = self._prep_batch(batch)
            if g and any(b[key].shape != g[0][key].shape for key in b):
                yield g, ns
                g, ns = [], []
            g.append(b)
            ns.append(n)
            if len(g) == k:
                yield g, ns
                g, ns = [], []
        if g:
            yield g, ns

    @staticmethod
    def _stack_batches(prepped):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *prepped)

    @staticmethod
    def _unstack_metrics(stacked_m, ns):
        return [(jax.tree_util.tree_map(lambda a, j=j: a[j], stacked_m), n)
                for j, n in enumerate(ns)]

    def _multi_eval(self, params, state, batches, rng):
        """k eval batches in one scan dispatch; carries the rng so the key
        sequence is identical to k sequential eval_step calls. Returns
        (next_rng, stacked scalar metrics) — full outputs never leave the
        scan, so memory stays one batch deep."""
        if self._multi_eval_fn is None:
            ev, tm = self._eval_raw, self.test_metrics

            def multi(params, state, batches, rng):
                def body(r, b):
                    r, key = jax.random.split(r)
                    return r, tm(b, ev(params, state, b, key))

                return jax.lax.scan(body, rng, batches)

            self._multi_eval_fn = jax.jit(multi)
        return self._multi_eval_fn(params, state, batches, rng)

    # ------------------------------------------------------ dispatch watchdog
    def _arm_fetch_watchdog(self, n_pending: int):
        """Arm a timer around a blocking device fetch (§ tunnel wedges).

        The tunneled TPU client demonstrably wedges mid-run (the 200-epoch
        convergence artifact records an external-infra hang at epoch 154),
        and a wedged dispatch is indistinguishable from a long step forever
        — the loop would silently eat the whole job timeout. The watchdog
        converts that into a clean, resumable failure: if the fetch exceeds
        the budget, flush the host-side logger, give the async checkpoint
        writer a bounded join, and hard-exit nonzero (the main thread is
        unrecoverable inside a blocked device call) — the last
        epoch-boundary/step checkpoint on disk resumes with resume_mode=1.

        ``cfg['dispatch_timeout']``: seconds; 0 (default) = adaptive —
        20x the trailing per-step await estimate scaled by the number of
        steps this fetch awaits, floored at 300s (first fetch: 600s);
        negative disables the watchdog.
        """
        budget = float(self.cfg.get("dispatch_timeout", 0) or 0)
        if budget < 0:
            return None
        if budget == 0:
            est = getattr(self, "_fetch_step_est", None)
            budget = (max(300.0, 20.0 * est * max(n_pending, 1))
                      if est else 600.0)
        t = threading.Timer(budget, self._on_dispatch_wedge, args=(budget,))
        t.daemon = True
        t.start()
        return t

    def _on_dispatch_wedge(self, budget: float) -> None:
        print(f"dispatch watchdog: device fetch exceeded {budget:.0f}s — "
              f"wedged backend/tunnel ({self.tag}); checkpoints on disk are "
              f"intact, resume_mode=1 continues; exiting", flush=True)
        try:
            if self.logger is not None:
                self.logger.flush()
        except Exception:
            pass
        # bounded: the writer thread may itself be wedged on a device fetch
        th = getattr(self._ckpt_writer, "_thread", None)
        if th is not None:
            th.join(timeout=30)
        self._wedge_exit(3)

    # injectable for tests; the default leaves a blocked main thread behind,
    # which only process exit can reap
    _wedge_exit = staticmethod(os._exit)

    @contextlib.contextmanager
    def _fetch_guard(self, n_pending: int = 1):
        """Watchdog window around any blocking device fetch / writer join
        in the epoch loop (metric flushes, the GAN eval sweep, checkpoint
        snapshot+submit) — see :meth:`_arm_fetch_watchdog`."""
        wd = self._arm_fetch_watchdog(n_pending)
        try:
            yield
        finally:
            if wd is not None:
                wd.cancel()

    def _blocking_fetch(self, buffered: list, names: list) -> np.ndarray:
        """The raw device->host transfer (split out so tests can fake a
        wedged tunnel underneath the watchdog guard)."""
        return np.asarray(jnp.stack(
            [jnp.stack([m[k] for k in names]) for m, _ in buffered]))

    def _fetch_stacked(self, buffered: list, names: list) -> np.ndarray:
        """THE blocking host transfer of the epoch loop (watchdog-guarded)."""
        t0 = time.perf_counter()
        with self._fetch_guard(len(buffered)):
            stacked = self._blocking_fetch(buffered, names)
        # trailing per-step await estimate (EMA) for the adaptive budget
        per_step = (time.perf_counter() - t0) / max(len(buffered), 1)
        prev = getattr(self, "_fetch_step_est", None)
        self._fetch_step_est = (per_step if prev is None
                                else 0.5 * prev + 0.5 * per_step)
        return stacked

    def _flush_buffered(self, buffered: list, split: str) -> None:
        """Land buffered on-device (metrics, n) pairs as ONE stacked
        host transfer and append them to the logger (a per-step float()
        costs a full host-device round trip — ~31 ms on a tunneled chip)."""
        if not buffered:
            return
        names = sorted(buffered[0][0].keys())
        stacked = self._fetch_stacked(buffered, names)
        for row, (_, n_i) in zip(stacked, buffered):
            self.logger.append(
                {k: float(v) for k, v in zip(names, row)}, split, n_i)
        buffered.clear()

    def _skip_nonfinite(self) -> bool:
        """AMP-style non-finite-update skip (state.make_train_step).
        cfg['skip_nonfinite_updates']: true/false, or 'auto' (default) —
        on for glow, off elsewhere. In bf16 one inf/NaN glow gradient
        otherwise poisons every parameter through the global-norm clip in a
        single step (the round-5 cglow root-cause, docs/DESIGN.md)."""
        v = self.cfg.get("skip_nonfinite_updates", "auto")
        if isinstance(v, str):
            if v.lower() == "auto":
                return self.family == "glow"
            import yaml

            v = yaml.safe_load(v.lower())
        return bool(v)

    def _wrap_metrics(self, step):
        def wrapped(ts, batch):
            ts, aux = step(ts, batch)
            metrics = self.train_metrics(batch, aux["output"])
            if "skipped" in aux:
                metrics = dict(metrics, SkipUpd=aux["skipped"])
            return ts, metrics

        return wrapped

    # ---------------------------------------------------- pixelcnn frozen AE
    def _setup_frozen_ae(self):
        cfg = self.cfg
        ae_tag_parts = [str(self.seed), cfg["data_name"], cfg["subset"], cfg["ae_name"]]
        self.ae_tag = "_".join(p for p in ae_tag_parts if p)
        ckpt = load_checkpoint(cfg, self.ae_tag, "best")
        if ckpt is None:
            raise FileNotFoundError(
                f"pixelcnn requires the frozen AE checkpoint {self.ae_tag}_best "
                f"(train vqvae first — reference train_pixelcnn.py:44-45)"
            )
        ae_cfg = process_control({**cfg, "model_name": cfg["ae_name"]})
        ae_cfg["classes_size"] = cfg["classes_size"]
        self.ae_model = build_model(ae_cfg, cfg["ae_name"])
        self.ae_variables = ckpt["model_dict"]

        @jax.jit
        def encode(img):
            _, _, code = self.ae_model.apply(self.ae_variables, img,
                                             method="encode")
            return code

        @jax.jit
        def decode_code(code):
            return self.ae_model.apply(self.ae_variables, code,
                                       method="decode_code")

        self.ae_encode = encode
        self.ae_decode_code = decode_code

    def _prep_batch(self, batch):
        batch = {k: v for k, v in batch.items() if k != "n"}
        if self.family == "pixelcnn":
            batch["img"] = self.ae_encode(batch["img"])
        return batch

    # ------------------------------------------------------------- glow ddi
    def _run_ddi(self):
        cfg = self.cfg
        n = cfg.get("num_init_batches", 8)
        imgs, labels = [], []
        for i, batch in enumerate(self.loaders["train"]):
            if i >= n:
                break
            imgs.append(batch["img"])
            labels.append(batch["label"])
        big = {"img": jnp.concatenate(imgs), "label": jnp.concatenate(labels)}
        variables = merge_variables(self.ts.params, self.ts.state)
        self.rng, k = jax.random.split(self.rng)
        _, mut = self.model.apply(variables, big, train=True, ddi=True,
                                  rngs={"noise": k}, mutable=["params"])
        self.ts = replace(self.ts, params=mut["params"],
                          opt_state=self.optimizer.init(mut["params"]))
        self._ddi_pending = False

    # ------------------------------------------------------------ run loop
    def _install_preempt_handler(self):
        """Cooperative preemption (cloud TPU SIGTERM grace window): flag the
        loop to stop at the NEXT epoch boundary — the epoch's checkpoint is
        already on disk by then, so the run resumes with ``resume_mode=1``
        losing nothing. Mid-epoch state is never checkpointed (a partial
        epoch would corrupt resume semantics); if the grace window expires
        first, the atomic checkpoint writer guarantees the previous epoch's
        file is intact. Returns a restore callback (signal handlers only
        install from the main thread — elsewhere this is a no-op)."""
        import signal

        self._preempt_requested = False

        def on_term(signum, frame):
            self._preempt_requested = True
            where = ("at the next step checkpoint"
                     if int(self.cfg.get("save_every_steps", 0) or 0)
                     else "after the current epoch")
            print(f"SIGTERM: stopping {where} ({self.tag})", flush=True)

        try:
            prev = signal.signal(signal.SIGTERM, on_term)
        except ValueError:  # non-main thread (e.g. a test harness)
            return lambda: None
        return lambda: signal.signal(signal.SIGTERM, prev)

    def run(self, num_epochs: int | None = None):
        cfg = self.cfg
        self.setup()
        num_epochs = num_epochs or cfg["num_epochs"]
        last_epoch, pivot = self._resume()
        if self.family == "glow" and getattr(self, "_ddi_pending", False) \
                and last_epoch == 1:
            self._run_ddi()
        restore_handler = self._install_preempt_handler()
        start_step = getattr(self, "_resume_step", 0)
        self._resume_step = 0   # consumed; a second run() starts clean
        self._preempt_stop = False
        try:
            for epoch in range(last_epoch, num_epochs + 1):
                self.logger.safe(True)
                self.train_epoch(epoch, start_step=start_step)
                start_step = 0
                if getattr(self, "_preempt_stop", False):
                    # mid-epoch preemption checkpoint written by train_epoch;
                    # the epoch is unfinished — no eval/scheduler/best here
                    break
                self.test_epoch(epoch)
                pivot_val = self.logger.mean.get(f"test/{cfg['pivot_metric']}")
                if pivot_val is not None and not np.isfinite(pivot_val):
                    print(f"diverged: test/{cfg['pivot_metric']} non-finite at "
                          f"epoch {epoch}; epoch not eligible for _best",
                          flush=True)
                self._scheduler_step(pivot_val)
                self.logger.safe(False)
                # when the pivot metric is unavailable (e.g. no feature model
                # for IS), every epoch counts as an improvement → best = latest
                improved = pivot_val is None or self._improved(pivot_val, pivot)
                if improved and pivot_val is not None:
                    pivot = pivot_val
                self._checkpoint(epoch, copy_to_best=improved)
                self.logger.reset()
                if self._preempt_requested:
                    print(f"preempted: stopped after epoch {epoch} "
                          f"(checkpoint on disk; resume_mode=1 continues)",
                          flush=True)
                    break
        finally:
            restore_handler()
            # join (and surface failures from) the async writer even when the
            # loop raises — never leave it mid-write at interpreter exit
            self._ckpt_writer.wait()
            self.logger.close()
        return self.logger

    def _improved(self, value, pivot):
        # a diverged epoch (NaN/inf pivot metric — e.g. glow's all-NaN eval
        # loss) must never win the ``_best`` copy
        if value is not None and not np.isfinite(value):
            return False
        if pivot is None:
            return True
        if self.cfg.get("pivot_mode", "min") == "max":
            return value > pivot
        return value < pivot

    def _scheduler_step(self, pivot_val):
        cfg = self.cfg
        metric = pivot_val if cfg["scheduler_name"] == "ReduceLROnPlateau" else None
        if self.family == "gan":
            for k in ("generator", "discriminator"):
                lr = self.scheduler[k].step(metric)
            self.ts = replace(
                self.ts,
                g_opt_state=set_learning_rate(self.ts.g_opt_state,
                                              self.scheduler["generator"].lr),
                d_opt_state=set_learning_rate(self.ts.d_opt_state,
                                              self.scheduler["discriminator"].lr),
            )
        else:
            lr = self.scheduler.step(metric)
            self.ts = replace(self.ts,
                              opt_state=set_learning_rate(self.ts.opt_state, lr))

    # --------------------------------------------------------------- epochs
    def train_epoch(self, epoch: int, start_step: int = 0):
        cfg = self.cfg
        loader = self.loaders["train"]
        loader.set_epoch(epoch)
        n_batches = len(loader)
        limit = cfg.get("limit_train_batches")  # test-diet knob
        if limit:
            n_batches = min(n_batches, limit)
        log_every = max(1, int(n_batches * cfg["log_interval"]))
        # §5.1 profiling: cfg['profile_dir'] captures a jax.profiler trace of
        # steps [profile_warmup, profile_warmup+profile_steps) of epoch 1;
        # StepTimer feeds measured images/sec into the ETA log line.
        prof_dir = cfg.get("profile_dir") if epoch == 1 else None
        prof_warmup = cfg.get("profile_warmup", 2)
        prof_steps = cfg.get("profile_steps", 10)
        tracing = False
        timer = StepTimer()
        # Per-step metric fetches would force a host<->device round trip
        # every step (the reference's .item() pattern, train_gan.py:160-166;
        # ~31 ms on a tunneled chip — more than the step itself). Steps
        # dispatch async; metrics buffer ON DEVICE and flush as one stacked
        # transfer at each log point.
        buffered: list = []

        def flush():
            self._flush_buffered(buffered, "train")

        t0 = time.time()
        seen = 0
        k = getattr(self, "_steps_per_dispatch", 1)
        prof_done = False
        # mid-epoch checkpoint cadence (cloud-preemption granularity for
        # long epochs; 0 = epoch boundaries only). The loader order is a
        # pure function of (seed, epoch), so resuming at ``start_step``
        # replays exactly the suffix an uninterrupted run would execute.
        every = int(cfg.get("save_every_steps", 0) or 0)
        last_saved = start_step
        try:
            i = start_step - 1
            for prepped, ns in self._iter_dispatch_groups(
                    loader, limit, skip=start_step):
                start = i + 1
                multi = len(prepped) == k and self.train_step_multi is not None
                # tracing never starts INSIDE a fused dispatch: multi groups
                # start at the first group boundary at/after prof_warmup;
                # single-step execution keeps per-step warmup granularity
                if (prof_dir and not tracing and not prof_done and multi
                        and start >= prof_warmup):
                    jax.profiler.start_trace(prof_dir)
                    tracing = True
                timer.start()
                if multi:
                    # one dispatch for k steps (identical math/rng chain to
                    # k sequential calls; see state.make_multi_train_step)
                    self.ts, stacked_m = self.train_step_multi(
                        self.ts, self._stack_batches(prepped))
                    step_metrics = self._unstack_metrics(stacked_m, ns)
                else:  # remainder (or k=1): plain per-step dispatches
                    step_metrics = []
                    for j, (b, n) in enumerate(zip(prepped, ns)):
                        if (prof_dir and not tracing and not prof_done
                                and start + j >= prof_warmup):
                            jax.profiler.start_trace(prof_dir)
                            tracing = True
                        self.ts, metrics = self.train_step(self.ts, b)
                        step_metrics.append((metrics, n))
                        if tracing and start + j + 1 >= prof_warmup + prof_steps:
                            jax.profiler.stop_trace()
                            tracing = False
                            prof_done = True
                timer.stop(sum(ns))
                buffered.extend(step_metrics)
                seen += sum(ns)
                i += len(prepped)
                if tracing and i + 1 >= prof_warmup + prof_steps:
                    jax.profiler.stop_trace()
                    tracing = False
                    prof_done = True
                # log when a multiple of log_every falls inside this group
                # (exactly the old per-step `i % log_every == 0` for k=1)
                if every and i + 1 - last_saved >= every and i + 1 < n_batches:
                    # buffered device metrics must land in the logger BEFORE
                    # it is snapshotted into the checkpoint
                    flush()
                    self._checkpoint(epoch, mid_step=i + 1)
                    last_saved = i + 1
                if (getattr(self, "_preempt_requested", False) and every
                        and i + 1 < n_batches):
                    # with mid-epoch checkpoints enabled, the grace window
                    # only needs to cover one dispatch group: checkpoint
                    # here and stop — resume re-enters at this exact step.
                    # (Skip the write when the cadence save above already
                    # covered this exact step — no double submit inside
                    # the grace window.)
                    if last_saved != i + 1:
                        flush()
                        self._checkpoint(epoch, mid_step=i + 1)
                    self._preempt_stop = True
                    print(f"preempted: stopped mid-epoch {epoch} at step "
                          f"{i + 1} (checkpoint on disk; resume_mode=1 "
                          f"continues)", flush=True)
                    return
                if start == start_step or (start - 1) // log_every != i // log_every:
                    flush()
                    bt = (time.time() - t0) / max(i + 1 - start_step, 1)
                    eta = datetime.timedelta(
                        seconds=round(bt * (n_batches - i - 1)))
                    lr = (self.scheduler["generator"].lr
                          if self.family == "gan" else self.scheduler.lr)
                    rate = f", {seen / (time.time() - t0):.0f} images/s"
                    info = {"info": [f"Model: {self.tag}",
                                     f"Train Epoch: {epoch}({100. * i / n_batches:.0f}%)",
                                     f"Learning rate: {lr}",
                                     f"Epoch Finished Time: {eta}{rate}"]}
                    self.logger.append(info, "train", mean=False)
                    self.logger.write("train", cfg["metric_name"]["train"])
        finally:
            if tracing:
                jax.profiler.stop_trace()
            flush()
        self._last_step_stats = timer.stats()

    def test_epoch(self, epoch: int):
        if self.family == "gan":
            self._test_gan(epoch)
        else:
            self._test_eval_loader(epoch)

    def _next_eval_key(self):
        """Advance the host eval rng chain and return the step key.
        (Overridable: the seed-parallel runner carries a stacked [S, 2]
        chain and splits it per seed.)"""
        self.rng, key = jax.random.split(self.rng)
        return key

    def _test_eval_loader(self, epoch: int):
        """Eval on the TRAIN split (reference train_vae.py:77 et al.)."""
        cfg = self.cfg
        loader = self.loaders.get("train_eval", self.loaders["train"])
        limit = cfg.get("limit_eval_batches")
        out = batch = None
        # same async pattern as train_epoch: metrics stay on device until
        # one stacked flush (a per-batch float() costs a tunnel round trip);
        # and like train, k eval batches fuse into one scan dispatch (same
        # rng chain as sequential calls — the scan carries it)
        k_disp = getattr(self, "_steps_per_dispatch", 1)
        buffered = []
        for prepped, ns in self._iter_dispatch_groups(loader, limit):
            if len(prepped) == k_disp and k_disp > 1:
                self.rng, metrics = self._multi_eval(
                    self.ts.params, self.ts.state,
                    self._stack_batches(prepped), self.rng)
                buffered.extend(self._unstack_metrics(metrics, ns))
            else:
                for b, n_j in zip(prepped, ns):
                    key = self._next_eval_key()
                    out = self.eval_step(self.ts.params, self.ts.state, b, key)
                    buffered.append((self.test_metrics(b, out), n_j))
            batch = prepped[-1]  # last PREPPED batch (for the show grid)
        out = self._maybe_show(batch) if cfg.get("show") else None
        self._flush_buffered(buffered, "test")
        if cfg.get("show") and out is not None:
            self._save_show_grids(*out)
        info = {"info": [f"Model: {self.tag}", f"Test Epoch: {epoch}(100%)"]}
        self.logger.append(info, "test", mean=False)
        self.logger.write("test", [m for m in cfg["metric_name"]["test"]
                                   if m not in ("InceptionScore", "FID", "DBI")])

    def _maybe_show(self, batch):
        """Reconstruction grids for ``cfg['show']``: run one eval forward on
        the last batch and return ``(input_imgs, output_imgs)`` as numpy, or
        None when the model has no image output. (Overridable: the
        seed-parallel runner slices seed 0 out of the stacked batch.)"""
        if batch is None:
            return None
        key = self._next_eval_key()
        out = self.eval_step(self.ts.params, self.ts.state, batch, key)
        if "img" not in out:
            return None
        return np.asarray(batch["img"][:100]), np.asarray(out["img"][:100])

    def _save_show_grids(self, inp, outp):
        from ..io.images import save_image_grid
        from ..utils import vis_path

        save_image_grid(inp, vis_path(self.cfg, f"input_{self.tag}.png"))
        save_image_grid(outp, vis_path(self.cfg, f"output_{self.tag}.png"))

    def _gan_eval_moments(self, variables, C, chunk, feature_fn):
        """Fused on-device eval sweep: each chunk dispatch generates,
        feature-extracts, and accumulates first/second feature moments in
        the SAME program; only class probs [total, K] and the O(d²) moments
        leave the device (the round-2 path synced a full image tensor to
        host per 512-image chunk and re-uploaded it for features — ~250 MB
        over the tunnel per epoch; VERDICT r2 weak #3).

        Moments accumulate CENTERED on the real-side feature mean: raw
        second moments in f32 cancel catastrophically at high feature dim
        (E[f²] − µ² loses the variance bits when |µ| >> σ, e.g. inception's
        d=2048 post-ReLU features); (f−c) with c ≈ µ keeps every
        accumulation at O(σ) magnitude, so f32 is exact to working
        precision. sigma = Σg·gᵀ/(n−1) − n/(n−1)·(ḡ)(ḡ)ᵀ with g = f−c.
        """
        total = len(C)
        if getattr(self, "_gan_chunk_key", None) is not feature_fn:
            model = self.model

            @partial(jax.jit, donate_argnums=(0, 1))
            def add_chunk(fsum, fouter, variables, Ci, zi, center):
                img = model.apply(variables, Ci, zi, False, method="generate")
                feats, probs = feature_fn(img)
                g = feats.astype(jnp.float32) - center
                return fsum + g.sum(0), fouter + g.T @ g, probs

            probe_f, _ = feature_fn(jnp.zeros((1, *self.cfg["data_shape"]),
                                              jnp.float32))
            self._gan_chunk_fn = add_chunk
            self._gan_chunk_key = feature_fn  # held ref: id() could be reused
            self._feat_dim = int(probe_f.shape[-1])
        d = self._feat_dim
        real_stats = getattr(self, "real_stats", None)
        center_np = (real_stats[0] if real_stats is not None
                     else np.zeros((d,))).astype(np.float32)
        center = jnp.asarray(center_np)
        gsum = jnp.zeros((d,), jnp.float32)
        gouter = jnp.zeros((d, d), jnp.float32)
        probs_parts = []
        # the fetch below awaits every async chunk dispatch — guard it so a
        # wedged tunnel during the per-epoch eval sweep (the GAN family's
        # dominant device->host transfer) trips the dispatch watchdog
        with self._fetch_guard(max(total // max(chunk, 1), 1)):
            for i in range(0, total, chunk):
                Ci = jnp.asarray(C[i:i + chunk], jnp.int32)
                zi = self.fixed_z[i:i + chunk]
                gsum, gouter, probs = self._gan_chunk_fn(
                    gsum, gouter, variables, Ci, zi, center)
                probs_parts.append(probs)
            probs = np.asarray(jnp.concatenate(probs_parts))
        gbar = np.asarray(gsum, np.float64) / total
        mu = center_np.astype(np.float64) + gbar
        sigma = (np.asarray(gouter, np.float64)
                 - total * np.outer(gbar, gbar)) / (total - 1)
        return probs, mu, sigma

    def _test_gan(self, epoch: int):
        """Fixed-z class-sweep generation + IS/FID (reference train_gan.py:197-220)."""
        cfg = self.cfg
        t0 = time.time()
        # torch ``Tensor.repeat`` tiles: 0..K-1, 0..K-1, ... (train_gan.py:202)
        C = np.tile(np.arange(cfg["classes_size"]), cfg["generate_per_mode"])
        total = len(C)
        if "fixed_z" not in self.__dict__:
            zkey = jax.random.PRNGKey(self.seed ^ 0x5EED)
            self.fixed_z = jax.random.normal(
                zkey, (total, self.model.latent_size))
        variables = merge_variables(
            {"generator": self.ts.g_params, "discriminator": self.ts.d_params},
            self.ts.state)
        chunk = cfg["batch_size"]["test"]
        feature_fn = getattr(self, "feature_fn", "unset")
        if feature_fn == "unset":
            self.feature_fn = make_feature_fn(cfg)
            if self.feature_fn is not None:
                self.real_features = extract_real_features(
                    self.feature_fn, self.dataset["train"].img)
                # real-side Gaussian fixed across epochs — compute once
                rf = np.asarray(self.real_features, np.float64)
                self.real_stats = (rf.mean(0), np.cov(rf, rowvar=False))
            feature_fn = self.feature_fn
        names = [m for m in cfg["metric_name"]["test"]]
        unsupported = [m for m in names if m not in ("InceptionScore", "FID")]
        if unsupported:
            # fail fast instead of crashing mid-moments (feature_fn=None) or
            # silently printing 0.0 from the defaultdict mean: the fused
            # on-device eval scores IS/FID only (the reference's in-loop GAN
            # protocol, train_gan.py:29-55); anything else runs offline via
            # generate + test_generated/test_created
            raise ValueError(
                f"in-loop GAN eval supports InceptionScore/FID only, got "
                f"{unsupported}; score other metrics offline via the "
                f"generate + test_generated/test_created workflows")
        if feature_fn is None:
            names = [m for m in names if m not in ("InceptionScore", "FID")]
        if names:
            from ..evals.metrics import frechet_distance, inception_score

            probs, mu, sigma = self._gan_eval_moments(variables, C, chunk,
                                                      feature_fn)
            evaluation = {}
            if "InceptionScore" in names:
                # in-loop default 1 split (reference train_gan.py in-loop IS);
                # cfg['is_splits'] overrides, same as the standalone CLI
                evaluation["InceptionScore"] = inception_score(
                    probs, int(cfg.get("is_splits", 1)))
            if "FID" in names:
                mu1, sigma1 = self.real_stats
                evaluation["FID"] = frechet_distance(mu1, sigma1, mu, sigma)
            self.logger.append(evaluation, "test", total)
        self._last_eval_seconds = time.time() - t0
        info = {"info": [f"Model: {self.tag}",
                         f"Test Epoch: {epoch}(100%)",
                         f"Eval Time: {self._last_eval_seconds:.2f}s"]}
        self.logger.append(info, "test", mean=False)
        self.logger.write("test", names)

    # ----------------------------------------------------------- checkpoint
    def _model_variables(self):
        if self.family == "gan":
            return merge_variables(
                {"generator": self.ts.g_params,
                 "discriminator": self.ts.d_params},
                self.ts.state)
        return merge_variables(self.ts.params, self.ts.state)

    def _checkpoint(self, epoch: int, copy_to_best: bool = False,
                    mid_step: int | None = None):
        cfg = self.cfg
        if self.family == "gan":
            opt = {"generator": self.ts.g_opt_state,
                   "discriminator": self.ts.d_opt_state}
            sched = {k: s.state_dict() for k, s in self.scheduler.items()}
        else:
            opt = self.ts.opt_state
            sched = self.scheduler.state_dict()
        payload = {
            "cfg": {k: v for k, v in cfg.items() if k != "z"},
            # epoch-boundary checkpoints store the NEXT epoch to run;
            # mid-epoch ones store the CURRENT (unfinished) epoch + step
            "epoch": epoch if mid_step else epoch + 1,
            "model_dict": self._model_variables(),
            "optimizer_dict": opt,
            "scheduler_dict": sched,
            # snapshot: the live logger mutates (reset) while the writer
            # thread pickles; __getstate__ already strips the file handle
            "logger": copy.deepcopy(self.logger),
            "rng": np.asarray(self.ts.rng),
            # host eval key chain: restoring it makes eval-time *sampling*
            # metrics bit-continuous across a resume too (the train state
            # was always exact; this closes the one documented noise source)
            "eval_rng": np.asarray(self.rng),
        }
        if mid_step:
            payload["mid_epoch_step"] = int(mid_step)
        # fetch+pickle+write (tens to hundreds of MB) overlaps the next
        # epoch's dispatched steps — jax arrays are immutable, so the
        # writer sees exactly this epoch's values. The join of the PREVIOUS
        # epoch's writer is HOST work (pickle+disk, legitimately minutes on
        # a contended 1-core host) and must stay OUTSIDE the wedge watchdog
        # — guarding it killed healthy 12-seed glow sweeps whose checkpoint
        # payloads out-wrote the 300s floor; only the device-buffer
        # snapshot inside submit() is a device interaction worth guarding
        self._ckpt_writer.wait()
        with self._fetch_guard():
            self._ckpt_writer.submit(cfg, self.tag, payload,
                                     copy_to_best=copy_to_best)

    def _resume(self):
        cfg = self.cfg
        mode = cfg.get("resume_mode", 0)
        stamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
        fresh_logger = Logger(f"{cfg['output_dir']}/runs/train_{self.tag}_{stamp}",
                              backend=cfg.get("log_backend", "jsonl"))
        pivot = None
        if mode == 0:
            self.logger = fresh_logger
            return 1, pivot
        ckpt = load_checkpoint(cfg, self.tag, "checkpoint")
        if ckpt is None:
            print(f"Not exists model tag: {self.tag}, start from scratch")
            self.logger = fresh_logger
            return 1, pivot
        self._load_model_variables(ckpt["model_dict"])
        if mode == 1:
            self._load_opt_sched(ckpt)
            self.logger = ckpt["logger"]
            # current run's sink choice wins over the checkpointed one
            self.logger.backend = cfg.get("log_backend", "jsonl")
            self._resume_step = int(ckpt.get("mid_epoch_step", 0) or 0)
            if self._resume_step:
                # the saved step counts BATCHES of the checkpointed run; a
                # different batch size / limit / world size would make the
                # skip land on different SAMPLES (silent double-training) —
                # refuse instead
                old_cfg = ckpt.get("cfg", {})
                for key in ("batch_size", "limit_train_batches",
                            "world_size", "steps_per_dispatch"):
                    a, b = old_cfg.get(key), cfg.get(key)
                    if key == "batch_size":
                        a = (a or {}).get("train")
                        b = (b or {}).get("train")
                    if a != b:
                        raise ValueError(
                            f"mid-epoch resume: {key} changed "
                            f"({a!r} -> {b!r}) — the saved step index "
                            f"would skip different samples. Resume with "
                            f"the original value or restart the epoch "
                            f"(resume_mode=2).")
                # mid-epoch checkpoint: the pickled running means hold the
                # PARTIAL epoch so far — they must survive so the resumed
                # epoch's logged means equal an uninterrupted run's
                print(f"Resume from epoch {ckpt['epoch']} "
                      f"step {self._resume_step}")
            else:
                # the checkpoint pickles the logger BEFORE the epoch-end
                # reset (reference train_vae.py:83-94 has the same
                # ordering), so the restored running means still hold the
                # checkpoint epoch's values; without this reset the first
                # resumed epoch's logged metrics are a blend of old and new
                # (found by the round-3 crash/resume equality run —
                # history kept, means cleared)
                self.logger.reset()
                print(f"Resume from {ckpt['epoch']}")
            key = f"test/{cfg['pivot_metric']}"
            # non-finite history entries (diverged epochs) never held _best,
            # so they must not seed the resumed pivot either
            hist = [v for v in self.logger.history.get(key, [])
                    if np.isfinite(v)]
            if hist:
                pivot = (max(hist) if cfg.get("pivot_mode") == "max" else min(hist))
            return ckpt["epoch"], pivot
        # mode 2: warm start weights only
        self.logger = fresh_logger
        return 1, pivot

    def _match_glow_scan_layout(self, variables):
        """Repack scanned-flow leaves if the checkpoint's ``scan_chunk``
        layout differs from the configured one (a chunk=1 run stores
        ``flows/flow/[K,...]``; chunk=c stores ``flows/flow_j/[K/c,...]``) —
        resume must not require matching the flag the run was trained with."""
        glow_cfg = self.cfg.get("glow", {})
        if not glow_cfg.get("scan_flows", True):
            return variables
        want = int(glow_cfg.get("scan_chunk", 1))
        from ..models.glow import detect_glow_scan_chunk, rechunk_glow_flows

        have = detect_glow_scan_chunk(variables)
        if have == want:
            return variables

        return rechunk_glow_flows(variables, to_chunk=want, from_chunk=have)

    def _load_model_variables(self, variables):
        if self.family == "glow":
            variables = self._match_glow_scan_layout(variables)
        params, state = split_variables(jax.tree_util.tree_map(jnp.asarray, variables))
        if self.family == "gan":
            self.ts = replace(self.ts, g_params=params["generator"],
                              d_params=params["discriminator"], state=state)
        else:
            self.ts = replace(self.ts, params=params, state=state)
            if self.family == "glow":
                self._ddi_pending = False

    def _load_opt_sched(self, ckpt):
        def as_jnp(tree):
            return jax.tree_util.tree_map(jnp.asarray, tree)

        if self.family == "gan":
            self.ts = replace(
                self.ts,
                g_opt_state=jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.ts.g_opt_state),
                    jax.tree_util.tree_leaves(as_jnp(ckpt["optimizer_dict"]["generator"]))),
                d_opt_state=jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.ts.d_opt_state),
                    jax.tree_util.tree_leaves(as_jnp(ckpt["optimizer_dict"]["discriminator"]))),
            )
            for k in ("generator", "discriminator"):
                self.scheduler[k].load_state_dict(ckpt["scheduler_dict"][k])
        else:
            self.ts = replace(
                self.ts,
                opt_state=jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.ts.opt_state),
                    jax.tree_util.tree_leaves(as_jnp(ckpt["optimizer_dict"]))),
            )
            self.scheduler.load_state_dict(ckpt["scheduler_dict"])
        if "rng" in ckpt:
            rng = jnp.asarray(ckpt["rng"])
            self.ts = replace(self.ts, rng=rng)
        if "eval_rng" in ckpt:  # absent in older / imported checkpoints
            self.rng = jnp.asarray(ckpt["eval_rng"])


def run_experiments(cfg: dict, num_epochs: int | None = None, mesh=None):
    """reference ``main()``: loop seeds init_seed..init_seed+num_experiments.

    ``world_size > 1`` maps onto a mesh of that many devices — the SPMD
    analog of the reference's DataParallel gate (reference
    train_vae.py:72-73). ``model_size > 1`` carves a tensor-parallel axis
    out of it: mesh shape (world_size / model_size, model_size), params
    sharded per ``parallel.shard_params``.
    """
    n_exp = int(cfg.get("num_experiments", 1))
    if cfg.get("seed_parallel") and n_exp > 1:
        # all seeds as ONE vmapped run (train/seed_parallel.py) — the
        # TPU-native replacement for the reference's shell-level per-seed
        # job round-robin (reference make.py:27, 55-60). world_size > 1
        # shards the SEED axis over a ("seed",) mesh: one seed group per
        # device, zero collectives. (Handled BEFORE the generic mesh
        # construction below — world_size means seed groups here, not DP.)
        if mesh is not None:
            raise ValueError(
                "seed_parallel builds its own ('seed',) mesh from "
                "world_size; don't pass an explicit mesh")
        smesh = None
        ws = int(cfg.get("world_size", 1))
        if ws > 1:
            if any(int(cfg.get(k, 1) or 1) > 1
                   for k in ("model_size", "pipe_size", "spatial_size")):
                raise ValueError(
                    "seed_parallel composes with a plain world_size only "
                    "(the mesh axis is 'seed'; model/pipe/spatial layouts "
                    "are for sequential runs)")
            if n_exp % ws:
                raise ValueError(
                    f"num_experiments ({n_exp}) must be divisible by "
                    f"world_size ({ws}) under seed_parallel")
            from ..parallel import make_seed_mesh

            smesh = make_seed_mesh(ws)
        from .seed_parallel import SeedParallelExperiment, seed_parallel_groups

        # per-family cap on the vmapped group size (measured-optimal S;
        # seed_parallel.SEED_PARALLEL_MAX_S) — larger sweeps run as
        # sequential groups of capped vmaps so the 12-seed protocol never
        # hits a configuration measured slower than sequential
        groups = seed_parallel_groups(
            FAMILY[cfg["model_name"]],
            [cfg["init_seed"] + i for i in range(n_exp)],
            world_size=ws, max_override=cfg.get("seed_parallel_max", 0))
        results = []
        for g in groups:
            if len(g) == 1:
                # a leftover single seed is just a sequential run
                exp = Experiment(cfg, seed=g[0])
                print(f"Experiment: {exp.tag}")
                results.append(exp.run(num_epochs))
                continue
            exp = SeedParallelExperiment(cfg, seeds=g, mesh=smesh)
            grp = (f" [group {g[0]}-{g[-1]} of {n_exp}]"
                   if len(groups) > 1 else "")
            print(f"Experiment (seed-parallel x{len(g)}"
                  f"{f' over {ws} devices' if smesh else ''}){grp}: "
                  f"{exp.tag}")
            results.extend(exp.run(num_epochs))
        return results
    if mesh is None and cfg.get("world_size", 1) > 1:
        n_model = int(cfg.get("model_size", 1))
        n_pipe = int(cfg.get("pipe_size", 1))
        n_spatial = int(cfg.get("spatial_size", 1))
        if sum(n > 1 for n in (n_model, n_pipe, n_spatial)) > 1:
            raise ValueError("model_size, pipe_size and spatial_size are "
                             "mutually exclusive mesh layouts")
        if n_spatial > 1:
            from ..parallel import make_spatial_mesh

            if cfg["world_size"] % n_spatial:
                raise ValueError(
                    f"spatial_size ({n_spatial}) must divide world_size "
                    f"({cfg['world_size']})")
            mesh = make_spatial_mesh(n_data=cfg["world_size"] // n_spatial,
                                     n_spatial=n_spatial)
        elif n_pipe > 1:
            from ..parallel import make_pipe_mesh

            if cfg["world_size"] % n_pipe:
                raise ValueError(
                    f"pipe_size ({n_pipe}) must divide world_size "
                    f"({cfg['world_size']})")
            mesh = make_pipe_mesh(n_data=cfg["world_size"] // n_pipe,
                                  n_pipe=n_pipe)
        else:
            from ..parallel import make_mesh

            if n_model < 1 or cfg["world_size"] % n_model:
                raise ValueError(
                    f"model_size ({n_model}) must divide world_size "
                    f"({cfg['world_size']})"
                )
            mesh = make_mesh(n_data=cfg["world_size"] // n_model,
                             n_model=n_model)
    results = []
    for i in range(n_exp):
        seed = cfg["init_seed"] + i
        exp = Experiment(cfg, seed=seed, mesh=mesh)
        print(f"Experiment: {exp.tag}")
        results.append(exp.run(num_epochs))
    return results
