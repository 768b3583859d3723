"""Functional train state shared by every trainer.

Bundles what the reference's per-trainer ``save_checkpoint`` dicts carry
(CookieTTS/_2_ttm/tacotron2_tm/train.py:255-279): params, optimizer state,
step/epoch, mutable collections (batch_stats), plus host-side metadata
(speaker lookups, best-loss dicts) kept separately in the Checkpointer.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
from flax import struct

from .optim import Optimizer, apply_updates


@struct.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any
    mutables: Any = None         # e.g. {'batch_stats': ...}
    apply_fn: Callable = struct.field(pytree_node=False, default=None)
    tx: Optimizer = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, apply_fn, params, tx: Optimizer, mutables=None):
        return cls(step=0, params=params, opt_state=tx.init(params),
                   mutables=mutables or {}, apply_fn=apply_fn, tx=tx)

    def apply_gradients(self, grads, lr):
        updates, new_opt = self.tx.update(grads, self.opt_state,
                                          self.params, lr=lr)
        return self.replace(step=self.step + 1,
                            params=apply_updates(self.params, updates),
                            opt_state=new_opt)
