"""In-repo optimizers + grad utilities (all jittable, functional).

Replaces the reference's optimizer stack: torch Adam, the in-repo LAMB
(CookieTTS/_4_mtw/waveglow/lamb.py:26-144), apex FusedAdam/FusedLAMB, and
the hand-rolled FP16 dynamic loss scaler
(CookieTTS/_2_ttm/tacotron2_tm/loss_scaler.py:31-69). On TPU the fused
update is simply a jitted tree-map — XLA fuses it into a handful of
kernels; bf16 training needs no loss scaling, but the scaler is kept for
fp16-parity experiments.

API (optax-like, no dependency):
    opt = adam(); state = opt.init(params)
    updates, state = opt.update(grads, state, params, lr=1e-4)
    params = apply_updates(params, updates)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[..., Tuple[Any, Any]]


class AdamState(NamedTuple):
    step: jnp.ndarray
    mu: Any
    nu: Any


def _tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
         weight_decay: float = 0.0) -> Optimizer:
    """Adam / AdamW (decoupled weight decay when weight_decay > 0)."""

    def init(params):
        return AdamState(jnp.zeros((), jnp.int32),
                         _tree_zeros_like(params), _tree_zeros_like(params))

    def update(grads, state: AdamState, params=None, lr=1e-4):
        step = state.step + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(m.dtype),
            state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(v.dtype)),
            state.nu, grads)
        bc1 = 1 - b1 ** step.astype(jnp.float32)
        bc2 = 1 - b2 ** step.astype(jnp.float32)

        def upd(m, v, p):
            mhat = m / bc1
            vhat = v / bc2
            u = -lr * mhat / (jnp.sqrt(vhat) + eps)
            if weight_decay and p is not None:
                u = u - lr * weight_decay * p
            return u

        if params is None:
            updates = jax.tree_util.tree_map(
                lambda m, v: upd(m, v, None), mu, nu)
        else:
            updates = jax.tree_util.tree_map(upd, mu, nu, params)
        return updates, AdamState(step, mu, nu)

    return Optimizer(init, update)


def lamb(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
         weight_decay: float = 0.0, min_trust: float = 0.0,
         max_trust: float = 10.0) -> Optimizer:
    """LAMB: layer-wise adaptive Adam (reference lamb.py:26-144).

    trust_ratio = ||p|| / ||adam_update|| per leaf (clamped), so large
    layers take proportionally large steps — used by the vocoder trainer
    for big-batch training.
    """

    def init(params):
        return AdamState(jnp.zeros((), jnp.int32),
                         _tree_zeros_like(params), _tree_zeros_like(params))

    def update(grads, state: AdamState, params=None, lr=1e-4):
        assert params is not None, "LAMB needs params for trust ratio"
        step = state.step + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(m.dtype),
            state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(v.dtype)),
            state.nu, grads)

        def upd(m, v, p):
            a = m / (jnp.sqrt(v) + eps)
            if weight_decay:
                a = a + weight_decay * p
            w_norm = jnp.linalg.norm(p.reshape(-1))
            a_norm = jnp.linalg.norm(a.reshape(-1))
            trust = jnp.where(
                (w_norm > 0) & (a_norm > 0),
                jnp.clip(w_norm / a_norm, min_trust, max_trust), 1.0)
            return -lr * trust * a

        updates = jax.tree_util.tree_map(upd, mu, nu, params)
        return updates, AdamState(step, mu, nu)

    return Optimizer(init, update)


def apply_updates(params, updates):
    return jax.tree_util.tree_map(
        lambda p, u: (p + u.astype(p.dtype)), params, updates)


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def clip_by_global_norm(grads, max_norm: float | jnp.ndarray):
    """Returns (clipped_grads, pre_clip_norm). NaN/Inf norm zeroes the
    update (the reference skips the step on overflow, train.py:719-722)."""
    norm = global_norm(grads)
    finite = jnp.isfinite(norm)
    scale = jnp.where(finite, jnp.minimum(1.0, max_norm / (norm + 1e-6)), 0.0)
    clipped = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g * scale.astype(g.dtype),
                            jnp.zeros_like(g)),
        grads)
    return clipped, norm


@dataclasses.dataclass
class DynamicLossScaler:
    """fp16 dynamic loss scaling (reference loss_scaler.py:31-69):
    start at 2**init_scale_pow, double every ``scale_window`` good steps,
    halve on overflow. Not needed for bf16 — kept for fp16 parity."""
    scale: float = 2.0 ** 17
    scale_factor: float = 2.0
    scale_window: int = 1000
    _good_steps: int = 0

    def unscale(self, grads):
        s = 1.0 / self.scale
        return jax.tree_util.tree_map(lambda g: g * s, grads)

    def step(self, overflow: bool) -> None:
        if overflow:
            self.scale = max(self.scale / self.scale_factor, 1.0)
            self._good_steps = 0
        else:
            self._good_steps += 1
            if self._good_steps >= self.scale_window:
                self.scale *= self.scale_factor
                self._good_steps = 0


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Plateau LR scheduler (the vocoder trainer steps one with the
    broadcast validation MSE, reference _4_mtw/waveglow/train.py:671-700).

    Call ``lr = sched.step(metric)`` after each validation.

    ``min_lr`` floors the EFFECTIVE learning rate (torch semantics —
    param-group lr = max(lr*factor, min_lr)): the Trainer applies it at
    ``lr = max(base_lr * scale, min(min_lr, base_lr))``, because this
    object only tracks the multiplier and the base LR is a live
    schedule it cannot see. Clamping ``scale`` at min_lr (the old
    behavior) floored the MULTIPLIER — with base_lr=1e-4 that allowed
    an effective 1e-10."""
    factor: float = 0.5
    patience: int = 5
    min_lr: float = 1e-6
    threshold: float = 1e-4
    scale: float = 1.0           # multiplies the externally supplied base lr
    _best: float = float("inf")
    _bad_steps: int = 0

    def step(self, metric: float) -> float:
        if metric < self._best * (1.0 - self.threshold):
            self._best = metric
            self._bad_steps = 0
        else:
            self._bad_steps += 1
            if self._bad_steps > self.patience:
                self.scale = max(self.scale * self.factor, 1e-12)
                self._bad_steps = 0
        return self.scale
