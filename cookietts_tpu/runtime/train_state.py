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

    def to_host_tree(self):
        """Checkpoint payload (numpy) — the tree save_checkpoint writes."""
        import numpy as np
        asnp = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
        return {"step": int(self.step), "params": asnp(self.params),
                "opt_state": asnp(self.opt_state),
                "mutables": asnp(self.mutables)}


@struct.dataclass
class GANTrainState:
    """Paired generator/discriminator state so adversarial trainers ride
    the same Trainer (validation cadence, live config, explosion restart,
    resume) as the single-model ones — the reference duplicates that
    machinery per trainer dir (SURVEY.md §2.7); checkpoints keep the
    generator under the usual keys (``params``/``opt_state``) so serving
    and converters load them unchanged, with ``d_params``/``d_opt_state``
    alongside (the reference's paired g_/do_ files)."""
    g: TrainState
    d: TrainState

    @property
    def step(self):
        return self.g.step

    @property
    def params(self):
        return self.g.params

    @property
    def mutables(self):
        return self.g.mutables

    def to_host_tree(self):
        import numpy as np
        asnp = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
        return {"step": int(self.g.step), "params": asnp(self.g.params),
                "opt_state": asnp(self.g.opt_state),
                "mutables": asnp(self.g.mutables),
                "d_params": asnp(self.d.params),
                "d_opt_state": asnp(self.d.opt_state),
                "d_mutables": asnp(self.d.mutables)}
