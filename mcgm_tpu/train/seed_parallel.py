"""Seed-parallel training: one vmapped train step over stacked experiment seeds.

The reference's experiment protocol runs ``num_experiments`` seeds of every
(data, model, control) cell as SEPARATE single-GPU jobs, round-robined over
devices by shell scripts (reference make.py:27, 55-60 — its only "job
scheduler"). On TPU the small 32x32 families leave the chip mostly idle: the
profiled mcvae step is ~50 fusions of a few MB each, latency-bound at 8-10x
its HBM/MXU roofline (docs/DESIGN.md "Per-family step rooflines"). The
TPU-native equivalent of that job scheduler is therefore not process
round-robin but *packing all seeds onto the chip at once*: stack S seeds'
train states leaf-wise ([S, ...] leading axis) and ``jax.vmap`` ONE train
step over the stacked axis, so every fusion processes S seeds' tensors in a
single issue and per-dispatch latency amortizes S-fold.

Semantics are exactly S sequential :class:`~mcgm_tpu.train.loop.Experiment`
runs (pinned by tests/test_seed_parallel.py):

- each member seed's init / rng chains / MC codebook / data order are built
  by a plain per-seed ``Experiment.setup()`` before stacking — identical to
  what a sequential run would construct;
- the per-seed rng chains ride inside the stacked state ([S, 2] keys) and
  split per seed under vmap, replaying each seed's sequential key sequence;
- BN batch stats, VQ-EMA and every other mutable collection stay per-seed
  (vmap maps them — no cross-seed coupling anywhere);
- schedulers (including per-seed ReduceLROnPlateau decisions) run host-side
  per seed and write an [S] learning-rate vector into the stacked
  ``inject_hyperparams`` state;
- every epoch checkpoints S separate reference-tag files
  (``{seed}_{data}_{subset}_{model}[_{rate}]_checkpoint``) with per-seed
  loggers/schedulers/pivot-best copies, so generate/test_*/process.py
  consume seed-parallel runs with no changes.

With ``world_size > 1`` the stacked seed axis additionally shards over a
1-D ``("seed",)`` mesh (``parallel.make_seed_mesh``): one seed group per
device, ZERO collectives — embarrassingly parallel, the exact SPMD form of
the reference's ``CUDA_VISIBLE_DEVICES`` round-robin.

Scope: the single-model families (vae / vqvae / pixelcnn / glow /
classifier). The GAN family is excluded by design, with measurement: its
fused 5:1 step already runs at per-op MXU ceilings (DESIGN.md round-3
profile — the big convs at 92-98% of peak), so packing seeds multiplies
FLOPs at constant chip FLOP/s and cannot gain on one chip; run GAN seeds
sequentially (or over a DP mesh). Checkpoints are epoch-boundary only
(``save_every_steps == 0``).

Measured single-chip sweep speedups vs sequential at the production k=8
dispatch (docs/artifacts/seed_parallel_bench.json; DESIGN.md section):
classifier 9.6x at S=12 (the latency-bound case the design targets),
vae/vqvae 1.2-1.3x (their batch-128 convs already occupy the chip),
pixelcnn ~1.05x at S<=4 and NEGATIVE at S>=8 (HBM pressure). Families
whose speedup peaks below the sweep size are auto-split into capped
groups (:data:`SEED_PARALLEL_MAX_S`, :func:`seed_parallel_groups`) so the
12-seed protocol never runs a measured-slower configuration. The round-3
"vqvae S=12 pathological compile" was the persistent-compile-cache
deadlock (mcgm_tpu/compile_cache.py), not XLA: with the cache fenced,
S=12 compiles normally and measures 1.19x.
"""

from __future__ import annotations

import copy
import datetime

import numpy as np
import jax
import jax.numpy as jnp

from dataclasses import replace

from ..config import make_model_tag
from ..data.loader import _gather_normalize
from ..io.checkpoint import load_checkpoint
from ..report.logger import Logger
from .loop import RNG_STREAMS, Experiment
from .optim import set_learning_rate
from .state import (make_eval_step, make_train_step, merge_variables,
                    split_variables)


# Measured-optimal max vmapped group size per family (single chip, k=8
# dispatch; docs/artifacts/seed_parallel_bench.json): sweep speedup vs
# sequential peaks at S=4 for vqvae (1.28x vs 1.23x at S=8) and for
# pixelcnn (1.06x vs 0.95x at S=8, 0.84x at S=12 — HBM pressure), and
# keeps rising through S=12 for classifier (9.6x) and vae (1.25-1.26x).
# Families absent here are uncapped. cfg['seed_parallel_max'] overrides.
SEED_PARALLEL_MAX_S = {"pixelcnn": 4, "vqvae": 4}


def seed_parallel_groups(family: str, seeds, world_size: int = 1,
                         max_override: int = 0):
    """Split a seed-parallel sweep into contiguous vmapped groups capped at
    the family's measured-optimal S, so the 12-seed reference protocol
    (reference process.py:12, make.py:27) never runs a vmapped
    configuration measured slower than sequential — e.g. pixelcnn 12 seeds
    run as 3 groups of 4 (1.06x each) instead of one S=12 vmap (0.84x).

    Groups run one after another and each member seed's semantics are
    exactly sequential (module docstring), so the split is transparent to
    artifacts/checkpoints. With ``world_size > 1`` the cap rounds down to
    a multiple of the seed-mesh size so every group still shards evenly.
    ``max_override`` (cfg['seed_parallel_max']) replaces the measured cap;
    0 means auto.
    """
    seeds = list(seeds)
    override = int(max_override or 0)
    if override < 0:  # negative = uncapped (mirrors dispatch_timeout's
        return [seeds]  # negative-disables convention)
    cap = override or SEED_PARALLEL_MAX_S.get(family, 0)
    if not cap or len(seeds) <= cap:
        return [seeds]
    if world_size > 1:
        requested = cap
        cap -= cap % world_size
        if cap <= 0:
            why = (f"seed_parallel_max={requested}" if override else
                   f"family '{family}' caps vmapped groups at {requested} "
                   f"seeds (measured slower-than-sequential above — "
                   f"docs/artifacts/seed_parallel_bench.json)")
            raise ValueError(
                f"seed_parallel: {why}, which cannot host a seed mesh of "
                f"world_size {world_size}; lower world_size or raise the "
                f"cap (seed_parallel_max >= world_size, or negative for "
                f"uncapped)")
    return [seeds[i:i + cap] for i in range(0, len(seeds), cap)]


def _tree_stack(trees):
    """Stack a list of same-structure pytrees into one [S, ...] pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *trees)


class StackedLoader:
    """Batches for all S seeds in ONE fused device gather.

    Wraps the S per-seed :class:`~mcgm_tpu.data.loader.DataLoader`s as order
    oracles only (their (seed, epoch) permutations are what make each seed's
    data stream identical to a sequential run) while staging the shared
    packed dataset into HBM ONCE and materializing each stacked batch
    ``[S, B, ...]`` with a single jitted gather+normalize — S per-seed
    gathers would cost S dispatches and S HBM copies of the dataset.
    """

    def __init__(self, loaders, sharding=None):
        self.loaders = loaders
        self.dataset = loaders[0].dataset
        self.batch_size = loaders[0].batch_size
        self.sharding = sharding   # NamedSharding over the seed axis, or None
        self._dev = None

    def __len__(self) -> int:
        return min(len(l) for l in self.loaders)

    def set_epoch(self, epoch: int) -> None:
        for l in self.loaders:
            l.set_epoch(epoch)

    def _stage(self):
        if self._dev is None:
            self._dev = (jax.device_put(self.dataset.img),
                         jax.device_put(jnp.asarray(self.dataset.labels,
                                                    jnp.int32)))
        return self._dev

    def __iter__(self):
        return self.iter_from(0)

    def iter_from(self, start_batch: int):
        orders = [l._order() for l in self.loaders]
        for l in self.loaders:
            l.epoch += 1
        n, bs = len(orders[0]), self.batch_size
        if self.sharding is None:
            img_u8, labels = self._stage()
        for start in range(start_batch * bs, n, bs):
            idx = np.stack([o[start:start + bs] for o in orders])  # [S, b]
            if self.sharding is not None:
                # seed mesh: gather host-side and place each device's seed
                # rows directly (no cross-device reshard of a staged gather)
                from ..data.loader import normalize_images

                img = jax.device_put(self.dataset.img[idx], self.sharding)
                lab = jax.device_put(
                    np.asarray(self.dataset.labels, np.int32)[idx],
                    self.sharding)
                yield {"img": normalize_images(img), "label": lab,
                       "n": int(idx.shape[1])}
                continue
            img, lab = _gather_normalize(img_u8, labels,
                                         jnp.asarray(idx, jnp.int32))
            yield {"img": img, "label": lab, "n": int(idx.shape[1])}


class _FanoutLogger:
    """Presents S per-seed Loggers as the one ``self.logger`` the epoch loop
    expects. Info lines fan out with the joint tag rewritten to each seed's
    tag; scalar metrics are appended per seed by the overridden
    ``_flush_buffered`` directly, never through this facade."""

    def __init__(self, loggers, tags, joint_tag):
        self.loggers = loggers
        self.tags = tags
        self.joint = joint_tag

    def safe(self, write: bool):
        for lg in self.loggers:
            lg.safe(write)

    def reset(self):
        for lg in self.loggers:
            lg.reset()

    def close(self):
        for lg in self.loggers:
            lg.close()

    def flush(self):
        for lg in self.loggers:
            lg.flush()

    def append(self, result: dict, tag: str, n: int = 1, mean: bool = True):
        for t, lg in zip(self.tags, self.loggers):
            r = result
            if "info" in result:
                r = dict(result)
                r["info"] = [s.replace(self.joint, t) for s in result["info"]]
            lg.append(r, tag, n, mean)

    def write(self, tag: str, metric_names: list):
        for lg in self.loggers:
            lg.write(tag, metric_names)


class SeedParallelExperiment(Experiment):
    """All ``num_experiments`` seeds of one cell trained as ONE vmapped run."""

    def __init__(self, cfg: dict, seeds, mesh=None):
        seeds = list(seeds)
        if len(seeds) < 2:
            raise ValueError("seed_parallel needs num_experiments >= 2 "
                             "(a single seed is just a sequential run)")
        self._raw_cfg = dict(cfg)
        super().__init__(cfg, seed=seeds[0], mesh=None)
        self.seeds = seeds
        # optional 1-D ("seed",) mesh: the stacked axis shards over devices —
        # each device trains S/n_seed seeds with zero collectives
        self.seed_mesh = mesh
        if mesh is not None:
            if "seed" not in mesh.axis_names:
                raise ValueError("seed_parallel expects a ('seed',) mesh "
                                 "(parallel.make_seed_mesh)")
            if len(seeds) % mesh.shape["seed"]:
                raise ValueError(
                    f"num_experiments ({len(seeds)}) must be divisible by "
                    f"the seed-mesh size ({mesh.shape['seed']})")
        if self.family == "gan":
            raise ValueError(
                "seed_parallel does not support the GAN family: its fused "
                "5:1 step already runs at per-op MXU ceilings (DESIGN.md), "
                "so stacking seeds multiplies FLOPs with no aggregate gain "
                "— run GAN seeds sequentially (seed_parallel: false)")
        if int(self.cfg.get("save_every_steps", 0) or 0):
            raise ValueError(
                "seed_parallel supports epoch-boundary checkpoints only; "
                "unset save_every_steps or run seeds sequentially")
        self.tags = [make_model_tag(self.cfg, s) for s in seeds]
        # joint display tag: "0-3_CIFAR10_label_mcvae_0.5"
        self.tag = (f"{seeds[0]}-{seeds[-1]}"
                    + self.tags[0][len(str(seeds[0])):])
        self.loggers = []
        self.schedulers = []
        self._seed_sharding = None

    # ------------------------------------------------------------- setup
    def setup(self):
        cfg = self.cfg
        # one plain Experiment per seed reproduces the exact init / rng /
        # codebook / loader chain a sequential run would execute
        self.members = [Experiment(self._raw_cfg, seed=s) for s in self.seeds]
        for m in self.members:
            m.setup()
        m0 = self.members[0]
        joint_tag = self.tag
        self.cfg = cfg = dict(m0.cfg, model_tag=joint_tag)
        self.model = m0.model
        self.optimizer = m0.optimizer
        self.dataset = m0.dataset
        self.train_metrics = m0.train_metrics   # applied INSIDE the vmap
        self._test_metrics_raw = m0.test_metrics
        self.test_metrics = jax.vmap(m0.test_metrics)  # applied on [S, ...]
        self.schedulers = [m.scheduler for m in self.members]
        self.scheduler = self.schedulers[0]     # the ETA line reads .lr
        batch_sharding = None
        if self.seed_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            batch_sharding = NamedSharding(self.seed_mesh,
                                           PartitionSpec("seed"))
            self._seed_sharding = batch_sharding
        self.loaders = {k: StackedLoader([m.loaders[k] for m in self.members],
                                         sharding=batch_sharding)
                        for k in m0.loaders}
        self.ts = self._place(_tree_stack([m.ts for m in self.members]))
        self.rng = jnp.stack([m.rng for m in self.members])  # eval chains
        streams = RNG_STREAMS.get(self.family, ())
        base = make_train_step(self.model, self.optimizer, rng_streams=streams,
                               remat=cfg.get("remat", False),
                               skip_nonfinite=self._skip_nonfinite())
        vstep = jax.vmap(self._wrap_metrics(base))
        if self.seed_mesh is not None:
            # pin step outputs to the seed placement (XLA propagation could
            # otherwise return updated leaves replicated, undoing it)
            from ..parallel import state_shardings, with_state_shardings

            vstep = with_state_shardings(vstep, state_shardings(self.ts))
        self.train_step = jax.jit(vstep, donate_argnums=0)
        self._make_multi_step(vstep)
        ev = make_eval_step(self.model, rng_streams=streams)
        self._eval_raw = ev
        self._multi_eval_fn = None
        self.eval_step = jax.jit(jax.vmap(ev))
        if self.family == "pixelcnn":
            ae_model = m0.ae_model
            ae_vars = self._place(
                _tree_stack([m.ae_variables for m in self.members]))

            @jax.jit
            def encode(vars_, img):
                def one(v, im):
                    _, _, code = ae_model.apply(v, im, method="encode")
                    return code

                return jax.vmap(one)(vars_, img)

            self._ae_vars = ae_vars
            self._ae_encode_stacked = encode
        self._ddi_pending = (self.family == "glow")

    def _place(self, tree):
        """Shard every stacked leaf's seed axis over the mesh (no-op when
        running single-device)."""
        if self.seed_mesh is None:
            return tree
        return jax.device_put(tree, self._seed_sharding)

    def _prep_batch(self, batch):
        batch = {k: v for k, v in batch.items() if k != "n"}
        if self.family == "pixelcnn":
            batch["img"] = self._ae_encode_stacked(self._ae_vars, batch["img"])
        return batch

    # ------------------------------------------------------------- run loop
    def run(self, num_epochs: int | None = None):
        cfg = self.cfg
        self.setup()
        cfg = self.cfg   # setup refreshes it from member 0
        num_epochs = num_epochs or cfg["num_epochs"]
        last_epoch, pivots = self._resume()
        if self.family == "glow" and self._ddi_pending and last_epoch == 1:
            # DDI per seed on the UNSTACKED members (full-batch stats in one
            # place, same ordering as a sequential run), then restack
            for m in self.members:
                if getattr(m, "_ddi_pending", False):
                    m._run_ddi()
            self.ts = self._place(_tree_stack([m.ts for m in self.members]))
            self.rng = jnp.stack([m.rng for m in self.members])
            self._ddi_pending = False
        self.members = None  # stacked state is authoritative from here on
        restore_handler = self._install_preempt_handler()
        try:
            for epoch in range(last_epoch, num_epochs + 1):
                self.logger.safe(True)
                self.train_epoch(epoch)
                self.test_epoch(epoch)
                pivot_vals = [lg.mean.get(f"test/{cfg['pivot_metric']}")
                              for lg in self.loggers]
                self._scheduler_step(pivot_vals)
                self.logger.safe(False)
                improved = []
                for j, pv in enumerate(pivot_vals):
                    imp = pv is None or self._improved(pv, pivots[j])
                    if imp and pv is not None:
                        pivots[j] = pv
                    improved.append(imp)
                self._checkpoint(epoch, copy_to_best=improved)
                self.logger.reset()
                if getattr(self, "_preempt_requested", False):
                    print(f"preempted: stopped after epoch {epoch} "
                          f"(checkpoints on disk; resume_mode=1 continues)",
                          flush=True)
                    break
        finally:
            restore_handler()
            self._ckpt_writer.wait()
            self.logger.close()
        return list(self.loggers)

    def _scheduler_step(self, pivot_vals):
        cfg = self.cfg
        plateau = cfg["scheduler_name"] == "ReduceLROnPlateau"
        lrs = [sch.step(pv if plateau else None)
               for sch, pv in zip(self.schedulers, pivot_vals)]
        self.ts = replace(
            self.ts,
            opt_state=set_learning_rate(self.ts.opt_state,
                                        jnp.asarray(lrs, jnp.float32)))

    # -------------------------------------------------------------- logging
    def _flush_buffered(self, buffered: list, split: str) -> None:
        """Buffered entries hold [S]-vector metrics; one stacked host
        transfer, then append seed j's scalars to logger j."""
        if not buffered:
            return
        names = sorted(buffered[0][0].keys())
        stacked = self._fetch_stacked(buffered, names)  # watchdog-guarded
        for row, (_, n_i) in zip(stacked, buffered):   # row: [names, S]
            for j, lg in enumerate(self.loggers):
                lg.append({k: float(v) for k, v in zip(names, row[:, j])},
                          split, n_i)
        buffered.clear()

    # ----------------------------------------------------------------- eval
    def _next_eval_key(self):
        nxt = jax.vmap(jax.random.split)(self.rng)   # [S, 2, 2]
        self.rng = nxt[:, 0]
        return nxt[:, 1]

    def _multi_eval(self, params, state, batches, rng):
        """k stacked eval batches [k, S, B, ...] in one dispatch: vmap over
        the seed axis of an rng-carrying scan over k — the per-seed key
        chains are identical to k sequential per-seed eval calls."""
        if self._multi_eval_fn is None:
            ev, tm = self._eval_raw, self._test_metrics_raw

            def one(params, state, batches, rng):
                def body(r, b):
                    r, key = jax.random.split(r)
                    return r, tm(b, ev(params, state, b, key))

                return jax.lax.scan(body, rng, batches)

            # metrics come back [k, S] so the base loop's per-step unstack
            # (axis 0 = step) stays correct; the carried rng stays [S, 2]
            self._multi_eval_fn = jax.jit(
                jax.vmap(one, in_axes=(0, 0, 1, 0), out_axes=(0, 1)))
        return self._multi_eval_fn(params, state, batches, rng)

    def _maybe_show(self, batch):
        if batch is None:
            return None
        key = self._next_eval_key()
        out = self.eval_step(self.ts.params, self.ts.state, batch, key)
        if "img" not in out:
            return None
        # seed 0's grid (the reference shows one grid per job)
        return (np.asarray(batch["img"][0][:100]),
                np.asarray(out["img"][0][:100]))

    # ----------------------------------------------------------- checkpoint
    def _checkpoint(self, epoch: int, copy_to_best=False, mid_step=None):
        assert mid_step is None, "seed_parallel is epoch-granular"
        cfg = self.cfg
        best = (copy_to_best if isinstance(copy_to_best, (list, tuple))
                else [copy_to_best] * len(self.seeds))
        for j, tag in enumerate(self.tags):
            # join the previous seed's pickle+write OUTSIDE the watchdog:
            # S large payloads are minutes of host work on a contended
            # 1-core host, not a device wedge (guarding this join killed
            # healthy 12-seed glow sweeps); only the device fetches and
            # the snapshot inside submit() stay guarded
            self._ckpt_writer.wait()
            with self._fetch_guard():
                ts_j = jax.tree_util.tree_map(lambda a, j=j: a[j], self.ts)
                payload = {
                    "cfg": {k: v for k, v in cfg.items() if k != "z"} |
                           {"model_tag": tag},
                    "epoch": epoch + 1,
                    "model_dict": merge_variables(ts_j.params, ts_j.state),
                    "optimizer_dict": ts_j.opt_state,
                    "scheduler_dict": self.schedulers[j].state_dict(),
                    "logger": copy.deepcopy(self.loggers[j]),
                    "rng": np.asarray(ts_j.rng),
                    "eval_rng": np.asarray(self.rng[j]),
                }
                self._ckpt_writer.submit(cfg, tag, payload,
                                         copy_to_best=best[j])

    # ---------------------------------------------------------------- resume
    def _fresh_loggers(self):
        cfg = self.cfg
        stamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
        return [Logger(f"{cfg['output_dir']}/runs/train_{t}_{stamp}",
                       backend=cfg.get("log_backend", "jsonl"))
                for t in self.tags]

    def _resume(self):
        cfg = self.cfg
        mode = cfg.get("resume_mode", 0)
        S = len(self.seeds)
        pivots = [None] * S
        if mode == 0:
            self.loggers = self._fresh_loggers()
            self.logger = _FanoutLogger(self.loggers, self.tags, self.tag)
            return 1, pivots
        ckpts = [load_checkpoint(cfg, t, "checkpoint") for t in self.tags]
        have = [c is not None for c in ckpts]
        if not any(have):
            print(f"Not exists model tag: {self.tag}, start from scratch")
            self.loggers = self._fresh_loggers()
            self.logger = _FanoutLogger(self.loggers, self.tags, self.tag)
            return 1, pivots
        if not all(have):
            missing = [t for t, h in zip(self.tags, have) if not h]
            raise ValueError(
                f"seed-parallel resume: checkpoints missing for {missing} "
                f"— finish the partial seeds sequentially or restart "
                f"(resume_mode=0)")
        if any(c.get("mid_epoch_step") for c in ckpts):
            raise ValueError(
                "seed-parallel resume: found mid-epoch (step-level) "
                "checkpoints; resume those runs sequentially")
        epochs = {c["epoch"] for c in ckpts}
        if len(epochs) != 1:
            raise ValueError(
                f"seed-parallel resume: seeds at different epochs "
                f"{sorted(epochs)} — bring them level sequentially first")
        model_dicts = [self._match_glow_scan_layout(c["model_dict"])
                       if self.family == "glow" else c["model_dict"]
                       for c in ckpts]
        params, state = split_variables(self._place(_tree_stack(model_dicts)))
        self.ts = replace(self.ts, params=params, state=state)
        self._ddi_pending = False
        if mode == 1:
            opt_leaves = [jax.tree_util.tree_leaves(c["optimizer_dict"])
                          for c in ckpts]
            stacked = [jnp.stack([jnp.asarray(x) for x in xs])
                       for xs in zip(*opt_leaves)]
            self.ts = replace(
                self.ts,
                opt_state=self._place(jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.ts.opt_state), stacked)),
                rng=self._place(jnp.stack([jnp.asarray(c["rng"])
                                           for c in ckpts])),
            )
            if all("eval_rng" in c for c in ckpts):
                self.rng = jnp.stack([jnp.asarray(c["eval_rng"])
                                      for c in ckpts])
            for sch, c in zip(self.schedulers, ckpts):
                sch.load_state_dict(c["scheduler_dict"])
            self.loggers = [c["logger"] for c in ckpts]
            for lg in self.loggers:
                lg.backend = cfg.get("log_backend", "jsonl")
                # checkpoints pickle the logger pre-reset (reference
                # ordering); clear the stale running means, keep history
                lg.reset()
            self.logger = _FanoutLogger(self.loggers, self.tags, self.tag)
            key = f"test/{cfg['pivot_metric']}"
            for j, lg in enumerate(self.loggers):
                # diverged (non-finite) epochs never held _best — skip them
                hist = [v for v in lg.history.get(key, [])
                        if np.isfinite(v)]
                if hist:
                    pivots[j] = (max(hist) if cfg.get("pivot_mode") == "max"
                                 else min(hist))
            print(f"Resume from {ckpts[0]['epoch']} ({S} seeds)")
            return ckpts[0]["epoch"], pivots
        # mode 2: warm-start weights only
        self.loggers = self._fresh_loggers()
        self.logger = _FanoutLogger(self.loggers, self.tags, self.tag)
        return 1, pivots
