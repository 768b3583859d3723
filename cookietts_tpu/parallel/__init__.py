"""Mesh construction + sharding rules (TPU-native parallelism).

Replaces the reference's single-node NCCL data parallelism
(CookieTTS/_2_ttm/tacotron2_tm/distributed.py, multiproc.py — see
SURVEY.md §2.6) with `jax.sharding` over a device mesh: parameters are
replicated by sharding spec (no rank-0 broadcast), gradients are averaged
by XLA-inserted collectives over ICI (no hand-rolled bucketed allreduce),
and multi-host launch is `jax.distributed.initialize()` instead of one
subprocess per GPU.
"""
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from .launch import global_batch_slice, initialize  # noqa: F401
from .tp import (  # noqa: F401
    HIFIGAN_TP_RULES,
    TACOTRON2_TP_RULES,
    WAVEGLOW_TP_RULES,
    tree_shardings,
)
