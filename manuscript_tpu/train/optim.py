"""Optimizers: functional SAM/ASAM, Lookahead, EMA, warm-restart schedule.

The reference trains EAST with SAM(SGD) or RAdam+Lookahead under
CosineAnnealingWarmRestarts (reference: src/manuscript/detectors/_east/
sam.py:19-72, train_utils.py:122-153). Here SAM is the canonical functional
JAX formulation — two grad evaluations inside ONE jitted train step (ascent
to params+e_w, descent grads applied at the original params) — instead of a
stateful optimizer object mutating parameters in place.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree))
    )


def sam_gradient(
    loss_fn: Callable,
    params,
    *loss_args,
    rho: float = 0.05,
    adaptive: bool = True,
):
    """Sharpness-aware gradient: returns (loss_at_adv, grads_at_adv).

    ascent: e_w = (p² if adaptive else 1) · g · ρ/‖(|p| if adaptive else 1)·g‖
    descent gradient evaluated at params + e_w, applied by the caller's base
    optimizer at the ORIGINAL params.
    """
    loss1, grads1 = jax.value_and_grad(loss_fn)(params, *loss_args)

    if adaptive:
        scaled = jax.tree_util.tree_map(lambda p, g: jnp.abs(p) * g, params, grads1)
    else:
        scaled = grads1
    grad_norm = _global_norm(scaled)
    scale = rho / (grad_norm + 1e-12)

    if adaptive:
        e_w = jax.tree_util.tree_map(
            lambda p, g: jnp.square(p) * g * scale, params, grads1
        )
    else:
        e_w = jax.tree_util.tree_map(lambda g: g * scale, grads1)

    params_adv = jax.tree_util.tree_map(lambda p, e: p + e, params, e_w)
    loss2, grads2 = jax.value_and_grad(loss_fn)(params_adv, *loss_args)
    return loss2, grads2


class LookaheadState(NamedTuple):
    slow: optax.Params
    step: jnp.ndarray


def lookahead(k: int = 5, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead as a terminal transform: every k steps the fast weights are
    pulled toward the slow weights (slow += α·(fast−slow); fast = slow)."""

    def init(params):
        return LookaheadState(
            slow=jax.tree_util.tree_map(jnp.asarray, params),
            step=jnp.zeros((), jnp.int32),
        )

    def update(updates, state, params=None):
        assert params is not None, "lookahead requires params"
        step = state.step + 1
        sync = (step % k) == 0

        fast = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + alpha * (f - s), s), state.slow, fast
        )
        new_params = jax.tree_util.tree_map(
            lambda f, s: jnp.where(sync, s, f), fast, new_slow
        )
        out_updates = jax.tree_util.tree_map(
            lambda np_, p: np_ - p, new_params, params
        )
        return out_updates, LookaheadState(slow=new_slow, step=step)

    return optax.GradientTransformation(init, update)


def ema_update(ema_params, params, decay: float = 0.999):
    """Exponential moving average of parameters (the working replacement for
    the reference's broken use_ema path — SURVEY.md §7 quirks)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


def cosine_warm_restarts(
    base_lr: float,
    t_0: int,
    steps_per_epoch: int,
    n_cycles: int = 16,
    t_mult: int = 1,
    eta_min_ratio: float = 0.01,
) -> optax.Schedule:
    """CosineAnnealingWarmRestarts equivalent: repeated cosine decays of
    length T_0·steps_per_epoch (times t_mult each cycle)."""
    schedules, boundaries = [], []
    total = 0
    length = t_0 * steps_per_epoch
    for _ in range(n_cycles):
        schedules.append(
            optax.cosine_decay_schedule(
                base_lr, max(length, 1), alpha=eta_min_ratio
            )
        )
        total += length
        boundaries.append(total)
        length *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])


def build_east_optimizer(
    lr: float,
    steps_per_epoch: int,
    use_sam: bool = True,
    use_lookahead: bool = True,
    grad_clip: float = 5.0,
    t_0: int = 10,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """EAST's optimizer stack: SGD(momentum) under SAM, or RAdam+Lookahead;
    cosine warm restarts either way."""
    schedule = cosine_warm_restarts(lr, t_0, steps_per_epoch)
    if use_sam:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.sgd(schedule, momentum=0.9),
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.radam(schedule),
        )
        if use_lookahead:
            tx = optax.chain(tx, lookahead(k=5, alpha=0.5))
    return tx, schedule


def build_trba_optimizer(
    optimizer: str,
    lr: float,
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = None,
    schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    lr_or_sched = schedule if schedule is not None else lr
    if optimizer == "adam":
        base = optax.adam(lr_or_sched)
    elif optimizer == "adamw":
        base = optax.adamw(lr_or_sched, weight_decay=weight_decay)
    elif optimizer == "sgd":
        base = optax.sgd(lr_or_sched, momentum=0.9)
    else:
        raise ValueError(f"Unknown optimizer: {optimizer}")
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(grad_clip), base)
    return base
