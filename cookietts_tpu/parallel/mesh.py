"""Device mesh + sharding helpers.

The framework's standard mesh axes:
- ``dp``  — data parallel (batch axis). The reference's only strategy
  (distributed.py:51-173) maps here.
- ``tp``  — tensor parallel (reserved for sharding large matmuls; the TTS
  models are small so tp defaults to 1).
- ``sp``  — sequence parallel (vocoder time axis). The flow vocoders are
  pointwise-in-time given the upsampled conditioning (SURVEY §2.6: the
  reference has NO sequence parallelism, only TBPTT), so sharding the
  audio/mel time axis scales a single long utterance across chips: the
  batch rides ``in_shardings`` and GSPMD inserts the conv halo exchanges
  over ICI automatically — no hand-written collectives.

Collectives ride ICI within a slice; across slices JAX routes over DCN
automatically when the mesh is built from `jax.devices()` in order.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, tp, sp) mesh. ``dp=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (tp * sp) == 0, \
            f"{n} devices not divisible by tp*sp={tp * sp}"
        dp = n // (tp * sp)
    assert dp * tp * sp == n, \
        f"dp({dp}) * tp({tp}) * sp({sp}) != n_devices({n})"
    arr = np.asarray(devices).reshape(dp, tp, sp)
    return Mesh(arr, ("dp", "tp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_sp(mesh: Mesh) -> int:
    """Size of the mesh's sp axis (1 when absent — pre-sp meshes)."""
    return int(mesh.shape.get("sp", 1)) if "sp" in mesh.axis_names else 1


# batch keys whose axis 1 is the (audio or mel-frame) time axis — the
# dimensions the vocoder flows treat pointwise given cond
VOCODER_TIME_AXES: Dict[str, int] = {"audio": 1, "mels": 1}


def sp_batch_shardings(batch, mesh: Mesh,
                       time_axes: Dict[str, int] = VOCODER_TIME_AXES):
    """Per-key NamedShardings for a batch dict: batch axis over dp, and —
    when the mesh has an sp axis — the named time axes over sp. Keys not
    in ``time_axes`` (ids, scalars) shard over dp only."""
    sp = mesh_sp(mesh)

    def spec(k, x):
        ndim = getattr(x, "ndim", 0)
        ta = time_axes.get(k)
        if sp == 1 or ta is None or ndim <= ta:
            return batch_sharding(mesh)
        parts = [None] * ndim
        parts[0] = "dp"
        parts[ta] = "sp"
        return NamedSharding(mesh, P(*parts))

    return {k: spec(k, v) for k, v in batch.items()}


def replicate_global(x, mesh: Mesh):
    """Place a GLOBAL (non-batch) array replicated on the mesh — e.g. the
    dataset mel mean feeding drop-frame-rate. Multi-host: every process
    passes the identical full array as its local replica."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch, mesh: Mesh, time_axes: Optional[Dict[str, int]] = None):
    """Put a pytree of [B, ...] arrays on the mesh with B sharded over dp
    (and, for dict batches with ``time_axes`` given on an sp mesh, the
    named time axes sharded over sp).

    Single-process: a plain device_put. Multi-host (TPU pod): ``batch``
    must hold only THIS host's rows (see
    :func:`cookietts_tpu.parallel.launch.global_batch_slice`); the local
    shards are assembled into one global array per leaf — the JAX
    equivalent of the reference's DistributedSampler feeding each rank
    its slice (tacotron2_tm/train.py:158).
    """
    if time_axes and isinstance(batch, dict) and mesh_sp(mesh) > 1:
        shardings = sp_batch_shardings(batch, mesh, time_axes)
    else:
        shardings = jax.tree_util.tree_map(
            lambda _: batch_sharding(mesh), batch)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), batch, shardings)

    def put(x, s):
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree_util.tree_map(put, batch, shardings)
