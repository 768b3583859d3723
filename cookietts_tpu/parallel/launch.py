"""Multi-host launch glue.

The reference spawns one process per GPU with ``multiproc.py`` and a
NCCL TCP rendezvous (tacotron2_tm/multiproc.py:8-57, train.py:91-103).
On TPU pods the runtime is one process per HOST: call
:func:`initialize` first thing, then build the global mesh — JAX wires
ICI within the slice and DCN across hosts, and every jitted function is
automatically SPMD across all chips.

Typical pod run (same command on every host; the TPU runtime provides
coordinator discovery, so no arguments are needed):

    python -m cookietts_tpu train --model tacotron2 ... --tp 2

with ``initialize()`` called by the CLI when it detects a multi-host
environment.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the distributed runtime when running multi-host.

    No-ops (returns False) in single-process settings: already
    initialized, a single-host TPU, or the CPU/GPU dev backends without
    explicit coordination args. On TPU pods all arguments are
    auto-discovered from the runtime.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return True
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0 \
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not on_pod:
        return False
    # dev-backend path (explicit coordinator, no cluster auto-detect):
    # JAX has env vars for the address but NOT for process counts — an
    # initialize(None, None, None) call would raise "Number of processes
    # must be defined" at startup. Accept the standard env pair.
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if explicit and not on_pod and (num_processes is None
                                    or process_id is None):
        raise SystemExit(
            "multi-host init: JAX_COORDINATOR_ADDRESS is set but the "
            "process topology is not auto-discoverable on this backend "
            "— also set JAX_NUM_PROCESSES and JAX_PROCESS_ID (or pass "
            "num_processes/process_id)")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def global_batch_slice(global_batch: int) -> slice:
    """The half-open row range of the global batch this host should
    feed. With batch sharded over dp and dp laid out process-major, each
    host loads only its local rows (the reference's DistributedSampler
    equivalent, train.py:158)."""
    n = jax.process_count()
    if global_batch % n != 0:
        # a silent floor-division would leave the remainder rows never
        # loaded by ANY host (cmd_train also guards this, but library
        # callers reach here directly)
        raise ValueError(
            f"global batch {global_batch} is not divisible by the "
            f"{n} processes — every row must belong to exactly one host")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def allgather_object(obj):
    """All hosts' copies of a JSON-serializable object, as a list of
    length ``process_count()`` indexed by process.

    The TPU-native replacement for the reference's pickle-file +
    ``dist.barrier()`` cross-rank object exchange
    (tacotron2_tm/train.py:126-143,282-308): the object rides the ICI/
    DCN collectives as a length-padded byte array. Single-process:
    returns ``[obj]`` without touching the device."""
    import json

    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(json.dumps(obj).encode("utf-8"), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([data.size], np.int32))
    m = int(sizes.max())
    buf = np.zeros((m,), np.uint8)
    buf[: data.size] = data
    out = multihost_utils.process_allgather(buf)
    return [json.loads(bytes(out[i, : int(sizes[i])]).decode("utf-8"))
            for i in range(out.shape[0])]
