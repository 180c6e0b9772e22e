"""Optimizer and LR-schedule factories resolved by config name.

The reference resolves optimizers from torch.optim and schedulers from
torch.optim.lr_scheduler by name, with a custom per-step exponential
"DefaultScheduler" lr * gamma**(step/step_size)
(src/models/model_base.py:150-177). Here the same names map onto optax;
the schedule is baked into the optimizer so the whole update is one fused
jitted transform.
"""

from __future__ import annotations

from typing import Callable

import optax


def build_schedule(cfg) -> Callable[[int], float]:
    """cfg.scheduler -> optax schedule giving the absolute LR at a step."""
    lr = float(cfg.optimizer.lr)
    kind = cfg.scheduler.type
    opts = dict(cfg.scheduler.options)

    if kind == "DefaultScheduler":
        # lr * gamma ** (step / step_size), continuous.
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=int(opts["step_size"]),
            decay_rate=float(opts["gamma"]),
            staircase=False,
        )
    if kind == "StepLR":
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=int(opts["step_size"]),
            decay_rate=float(opts.get("gamma", 0.1)),
            staircase=True,
        )
    if kind == "ExponentialLR":
        return optax.exponential_decay(
            init_value=lr, transition_steps=1, decay_rate=float(opts["gamma"])
        )
    if kind == "MultiStepLR":
        gamma = float(opts.get("gamma", 0.1))
        milestones = sorted(int(m) for m in opts["milestones"])
        return optax.piecewise_constant_schedule(
            init_value=lr, boundaries_and_scales={m: gamma for m in milestones}
        )
    if kind == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            init_value=lr,
            decay_steps=int(opts["T_max"]),
            alpha=float(opts.get("eta_min", 0.0)) / lr if lr else 0.0,
        )
    if kind == "ConstantLR" or kind == "LambdaLR":
        return optax.constant_schedule(lr)
    raise ValueError(f"Unknown scheduler type {kind!r}")


def accumulation_steps(cfg) -> int:
    """cfg.optimizer.accumulate_steps (>=1); 1 = no accumulation."""
    try:
        return max(1, int(cfg.optimizer.get("accumulate_steps", 1)))
    except AttributeError:  # plain dict-like cfg in tests
        return max(1, int(getattr(cfg.optimizer, "accumulate_steps", 1)))


def build_optimizer(cfg) -> optax.GradientTransformation:
    """cfg.optimizer.type (torch.optim names) -> optax transform with the
    schedule from cfg.scheduler applied per step.

    With cfg.optimizer.accumulate_steps > 1 the transform is wrapped in
    optax.MultiSteps: each update call feeds one micro-batch gradient into
    a running mean and the inner optimizer (and its schedule) advances
    once every N calls — exactly one big batch of N x num_random_rays
    rays, since the MSE loss means over rays."""
    schedule = build_schedule(cfg)
    kind = cfg.optimizer.type

    if kind == "Adam":
        opt = optax.adam(schedule)
    elif kind == "AdamW":
        opt = optax.adamw(schedule)
    elif kind == "Adamax":
        opt = optax.adamax(schedule)
    elif kind == "SGD":
        opt = optax.sgd(schedule)
    elif kind == "RMSprop":
        opt = optax.rmsprop(schedule)
    elif kind == "Adagrad":
        opt = optax.adagrad(schedule)
    else:
        raise ValueError(f"Unknown optimizer type {kind!r}")

    accum = accumulation_steps(cfg)
    if accum > 1:
        ms = optax.MultiSteps(opt, every_k_schedule=accum)
        opt = ms.gradient_transformation()
    return opt
