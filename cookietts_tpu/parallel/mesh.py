"""Device mesh + sharding helpers.

The framework's standard mesh axes:
- ``dp``  — data parallel (batch axis). The reference's only strategy
  (distributed.py:51-173) maps here.
- ``tp``  — tensor parallel (reserved for sharding large matmuls; the TTS
  models are small so tp defaults to 1).

Collectives ride ICI within a slice; across slices JAX routes over DCN
automatically when the mesh is built from `jax.devices()` in order.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, tp) mesh. ``dp=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n_devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Put a pytree of [B, ...] arrays on the mesh with B sharded over dp.

    Single-process: a plain device_put. Multi-host (TPU pod): ``batch``
    must hold only THIS host's rows (see
    :func:`cookietts_tpu.parallel.launch.global_batch_slice`); the local
    shards are assembled into one global array per leaf — the JAX
    equivalent of the reference's DistributedSampler feeding each rank
    its slice (tacotron2_tm/train.py:158).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
