"""Optimizers and LR schedulers.

Port of the reference factories (reference src/train_vae.py:150-189,
src/train_gan.py:222-262) onto optax:

- optimizers: SGD / RMSprop / Adam / Adamax, built with
  ``optax.inject_hyperparams`` so the learning rate is runtime-mutable state;
- schedulers: the torch schedulers become a small host-side ``Scheduler``
  object that computes the epoch's lr (including ReduceLROnPlateau's
  metric-driven logic) and writes it into the optimizer state between epochs
  — matching torch's "scheduler mutates optimizer lr" semantics without
  recompiling the jitted step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def make_optimizer(cfg: dict, lr: float | None = None,
                   betas: tuple = (0.9, 0.999),
                   grad_clip: float | None = None) -> optax.GradientTransformation:
    lr = cfg["lr"] if lr is None else lr
    name = cfg["optimizer_name"]
    wd = cfg.get("weight_decay", 0.0) or 0.0
    # linear per-STEP update warmup (multiplier 1/w .. 1 over the first w
    # steps), composed INSIDE the jitted step so it works at any
    # steps_per_dispatch. Stabilizer for glow's violent first-update
    # transient (round-5 cglow root-cause, docs/DESIGN.md): Adam's fresh
    # bias-corrected moments make the very first updates sign-like and
    # coherent across all flow scales, which at K=16/512 width overshoots
    # into f32-overflow territory on some seeds. 0 = off. The host-side
    # Scheduler still owns the epoch-level lr (they compose).
    warmup = int(cfg.get("lr_warmup_steps", 0) or 0)

    @optax.inject_hyperparams
    def build(learning_rate):
        chain = []
        if grad_clip is not None:
            chain.append(optax.clip_by_global_norm(grad_clip))
        if name == "SGD":
            mom = cfg.get("momentum", 0.0) or 0.0
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.sgd(learning_rate, momentum=mom or None))
        elif name == "RMSprop":
            mom = cfg.get("momentum", 0.0) or 0.0
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.rmsprop(learning_rate, momentum=mom))
        elif name == "Adam":
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.adam(learning_rate, b1=betas[0], b2=betas[1],
                                    eps=1e-8))
        elif name == "Adamax":
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.adamax(learning_rate, b1=betas[0], b2=betas[1]))
        else:
            raise ValueError(f"Not valid optimizer name: {name}")
        if warmup > 0:
            chain.append(optax.scale_by_schedule(
                lambda count: jnp.minimum(1.0, (count + 1.0) / warmup)))
        return optax.chain(*chain)

    return build(learning_rate=lr)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Functionally write a new lr into an inject_hyperparams state."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


class Scheduler:
    """Host-side epoch scheduler mirroring the reference's torch schedulers.

    ``step(metric)`` advances one epoch and returns the new lr. State is a
    plain dict for checkpointing (reference pickles torch scheduler
    state_dicts — src/train_vae.py:84-88).
    """

    def __init__(self, cfg: dict, base_lr: float | None = None):
        self.name = cfg["scheduler_name"]
        self.base_lr = cfg["lr"] if base_lr is None else base_lr
        self.cfg = {
            "step_size": cfg.get("step_size", 1),
            "milestones": list(cfg.get("milestones", [])),
            "factor": cfg.get("factor", 0.5),
            "patience": cfg.get("patience", 10),
            "threshold": cfg.get("threshold", 1e-3),
            "min_lr": cfg.get("min_lr", 1e-5),
            "num_epochs": cfg.get("num_epochs", 200),
            # torch ReduceLROnPlateau mode: 'min' (default) or 'max'
            "plateau_mode": cfg.get("plateau_mode", "min"),
        }
        self.epoch = 0
        self.lr = self.base_lr
        # ReduceLROnPlateau state (threshold_mode='rel', as torch defaults)
        self.best = math.inf if self.cfg["plateau_mode"] == "min" else -math.inf
        self.num_bad = 0

    def step(self, metric: float | None = None) -> float:
        self.epoch += 1
        c = self.cfg
        name = self.name
        if name in ("None", None):
            pass
        elif name == "StepLR":
            self.lr = self.base_lr * c["factor"] ** (self.epoch // c["step_size"])
        elif name == "MultiStepLR":
            n = sum(1 for m in c["milestones"] if self.epoch >= m)
            self.lr = self.base_lr * c["factor"] ** n
        elif name == "ExponentialLR":
            self.lr = self.base_lr * 0.99 ** self.epoch
        elif name == "CosineAnnealingLR":
            self.lr = 0.5 * self.base_lr * (1 + math.cos(math.pi * self.epoch / c["num_epochs"]))
        elif name == "ReduceLROnPlateau":
            if metric is None:
                raise ValueError("ReduceLROnPlateau requires a metric")
            if c["plateau_mode"] == "max":
                # torch is_better(mode='max', rel): a > best * (1 + threshold)
                improved = metric > self.best * (1 + c["threshold"])
            else:
                improved = metric < self.best * (1 - c["threshold"])
            if improved:
                self.best = metric
                self.num_bad = 0
            else:
                self.num_bad += 1
            if self.num_bad > c["patience"]:
                self.lr = max(self.lr * c["factor"], c["min_lr"])
                self.num_bad = 0
        elif name == "CyclicLR":
            # torch CyclicLR defaults: triangular, step_size_up=2000 iterations;
            # epoch-level approximation with the same base/max lr span.
            cycle = math.floor(1 + self.epoch / (2 * 2000))
            frac = abs(self.epoch / 2000 - 2 * cycle + 1)
            self.lr = self.base_lr + (10 * self.base_lr - self.base_lr) * max(0.0, 1 - frac)
        else:
            raise ValueError(f"Not valid scheduler name: {name}")
        return self.lr

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "lr": self.lr, "best": self.best,
                "num_bad": self.num_bad}

    def load_state_dict(self, d: dict):
        self.epoch = d["epoch"]
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad = d["num_bad"]
