"""Checkpoint save / resume / warm-start.

Capability rebuild of the reference checkpointing (SURVEY.md §5):
- three checkpoint classes: periodic ``checkpoint_<iter>``,
  ``best_val_model`` (audio quality), ``best_inf_attsc`` (inference
  attention score) — hparams.py:15-19, train.py:783-797.
- load modes: full resume, ``warm_start`` (with ignore_layers), and
  ``warm_start_force`` — shape-filtered partial restore that silently
  drops mismatched params (train.py:182-219).
- host metadata bundled in: speaker lookups, hparams JSON, best-loss dicts.
- manual save trigger: touching a ``save`` file in the run dir, polled by
  the train loop (save_model.py:1-5, train.py:764).

Format: flax msgpack serialization + a JSON sidecar for metadata.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_serializable(tree):
    """Recursively convert NamedTuples/tuples/lists to dicts/lists so the
    msgpack serializer accepts them (optimizer states are NamedTuples)."""
    if hasattr(tree, "_asdict"):             # NamedTuple
        return {k: _to_serializable(v) for k, v in tree._asdict().items()}
    if isinstance(tree, dict):
        return {k: _to_serializable(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_serializable(v) for v in tree]
    return tree


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x),
                                  _to_serializable(tree))


def save_checkpoint(path: str, state_tree: Any,
                    metadata: Optional[Dict[str, Any]] = None) -> None:
    """Serialize a pytree (params/opt_state/step/...) + JSON metadata."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.msgpack_serialize(_to_host(state_tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if metadata is not None:
        # atomic like the blob: restore_any keys behavior off this
        # sidecar (model tag, best losses) — a reader racing a re-save
        # must never see a truncated JSON
        jtmp = path + ".json.tmp"
        with open(jtmp, "w") as f:
            json.dump(metadata, f, indent=1, default=str)
        os.replace(jtmp, path + ".json")


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return tree, meta


def restore_like(target: Any, tree: Any) -> Any:
    """Restore a deserialized checkpoint ``tree`` (nested dicts/lists of
    numpy arrays, as produced by ``_to_serializable``) into the exact
    container structure of ``target`` (dicts / NamedTuples / tuples /
    lists / leaves). Needed because msgpack round-trips NamedTuple
    optimizer states as dicts and tuples as lists."""
    if hasattr(target, "_asdict"):           # NamedTuple
        fields = target._fields
        vals = [tree[k] if isinstance(tree, dict) else tree[i]
                for i, k in enumerate(fields)]
        return type(target)(*[restore_like(getattr(target, k), v)
                              for k, v in zip(fields, vals)])
    if isinstance(target, dict):
        return {k: restore_like(v, tree[k]) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        if len(tree) != len(target):
            # zip would silently truncate — e.g. a GAN checkpoint with 2
            # critic param dicts resumed into a model built with 3 would
            # "restore" a 2-tuple and fail confusingly much later
            raise ValueError(
                f"checkpoint container length {len(tree)} != target "
                f"{len(target)} (model structure changed since save?)")
        restored = [restore_like(t, v) for t, v in zip(target, tree)]
        return type(target)(restored) if isinstance(target, list) \
            else tuple(restored)
    arr = np.asarray(tree)
    if hasattr(target, "dtype") and arr.dtype != np.asarray(target).dtype:
        arr = arr.astype(np.asarray(target).dtype)
    return arr


def restore_train_state(state, path: str):
    """Full resume: load params + opt_state + mutables + step from a
    checkpoint into ``state``'s structure (reference full-resume mode,
    train.py:255-279). Returns (new_state, metadata)."""
    tree, meta = load_checkpoint(path)
    return _restore_train_state_from_tree(state, tree), meta


def fold_weightnorm_layout(target: Any, tree: Any, zero_fold: bool = False
                           ) -> tuple:
    """Migrate flax WeightNorm checkpoint subtrees to folded-kernel
    layout wherever ``target`` now expects a plain {kernel, bias} conv.

    Old in-repo HiFi-GAN runs (before the MSD spectral-norm parity fix)
    saved the scale-0 discriminator convs in WeightNorm layout: the conv
    params under a sibling ``Conv_j`` key and the wrapper holding a flat
    ``Conv_j/kernel/scale``. The module now uses :class:`SNConv`
    (plain kernel/bias), so ``--resume`` of such a run used to fail at
    restore (MIGRATION.md "In-framework checkpoint compatibility").
    This folds w = v * g / ||v|| (norm over all axes but the output one
    — the same fold the torch converter uses) into the kernel.

    ``zero_fold=True`` is for Adam moment trees, which mirror the params
    structure: the fold is a re-parametrization, so folded KERNEL
    moments are reset to zero (fresh curvature for the migrated layer)
    while bias moments — whose parametrization is unchanged — survive.

    Returns (migrated_tree, n_folded); a no-op (n_folded=0) when the
    tree already matches the target layout."""
    n = 0

    def walk(tgt, tr):
        nonlocal n
        if isinstance(tgt, (list, tuple)) and isinstance(tr, (list, tuple)):
            return type(tr)(walk(t, v) for t, v in zip(tgt, tr))
        if not isinstance(tgt, dict) or not isinstance(tr, dict):
            return tr
        out = {}
        for k, tgt_v in tgt.items():
            tv = tr.get(k)
            if (isinstance(tgt_v, dict) and set(tgt_v) == {"kernel", "bias"}
                    and isinstance(tv, dict) and "kernel" not in tv):
                scales = [s for s in tv if s.endswith("/kernel/scale")]
                conv = tr.get(scales[0].split("/")[0]) if len(scales) == 1 \
                    else None
                if isinstance(conv, dict) and "kernel" in conv:
                    v = np.asarray(conv["kernel"], np.float32)
                    if zero_fold:
                        out[k] = {"kernel": np.zeros_like(v),
                                  "bias": conv["bias"]}
                    else:
                        g = np.asarray(tv[scales[0]], np.float32)
                        norm = np.sqrt(np.sum(
                            np.square(v),
                            axis=tuple(range(v.ndim - 1)), keepdims=True))
                        out[k] = {
                            "kernel": (v * g / norm).astype(
                                np.asarray(conv["kernel"]).dtype),
                            "bias": conv["bias"]}
                    n += 1
                    continue
            out[k] = walk(tgt_v, tv) if tv is not None else tv
        return out

    return walk(target, tree), n


def restore_any(state, path: str):
    """Full resume for either a plain :class:`TrainState` or a paired
    :class:`GANTrainState` (G under ``params``/``opt_state``, D under
    ``d_params``/``d_opt_state`` — the reference's paired g_/do_
    checkpoints). Returns (new_state, metadata)."""
    from .train_state import GANTrainState
    if not isinstance(state, GANTrainState):
        return restore_train_state(state, path)
    tree, meta = load_checkpoint(path)
    if "d_params" not in tree:
        raise SystemExit(
            f"{path} has no discriminator state; use --warm_start for a "
            "generator-only load")
    # denoiser stage promotion: generator HEAD subtrees absent from the
    # checkpoint (stage-0 runs saved before every head was materialized,
    # or promotion across the materialization change) start fresh; the
    # set of fillable keys is pinned so a genuinely corrupt checkpoint
    # still fails loudly on any other missing subtree
    _DENOISER_HEADS = {"wn_end", "postnet", "postnet_end"}
    g_target = jax.tree_util.tree_map(np.asarray, state.g.params)
    missing = [k for k in g_target
               if isinstance(tree.get("params"), dict)
               and k not in tree["params"]]
    if (missing and (meta or {}).get("model") == "hifigan_denoiser"
            and set(missing) <= _DENOISER_HEADS):
        print(f"[resume] generator head(s) {sorted(missing)} not in the "
              "checkpoint (stage promotion); starting them fresh")
        for k in missing:
            tree["params"][k] = g_target[k]
            opt = tree.get("opt_state")
            if isinstance(opt, dict):
                for mom in ("mu", "nu"):   # Adam moments mirror params
                    if isinstance(opt.get(mom), dict):
                        opt[mom][k] = jax.tree_util.tree_map(
                            np.zeros_like, g_target[k])
    # `tree` is already loaded — restore from it directly (re-reading a
    # multi-GB checkpoint would double resume latency and host memory)
    g = _restore_train_state_from_tree(state.g, tree)
    if (isinstance(tree["d_params"], (list, tuple))
            and len(tree["d_params"]) == 0
            and jax.tree_util.tree_leaves(state.d.params)):
        # stage promotion: a pre-adversarial denoiser checkpoint has no
        # critics yet — resume the generator, keep the fresh critics
        print("[resume] checkpoint has no critic params (pre-adversarial "
              "stage); discriminators start fresh")
        return GANTrainState(g=g, d=state.d.replace(
            step=int(tree.get("step", 0)))), meta
    d_target = jax.tree_util.tree_map(np.asarray, state.d.params)
    d_params, n_folded = fold_weightnorm_layout(d_target, tree["d_params"])
    d_tree = {"params": d_params, "step": tree.get("step", 0)}
    if "d_opt_state" in tree:
        d_tree["opt_state"] = tree["d_opt_state"]
        if n_folded:
            # Adam moments mirror the params tree: migrate structure,
            # zero the re-parametrized kernel moments
            opt = dict(tree["d_opt_state"])
            for mom in ("mu", "nu"):
                if mom in opt:
                    opt[mom], _ = fold_weightnorm_layout(
                        d_target, opt[mom], zero_fold=True)
            d_tree["opt_state"] = opt
    if tree.get("d_mutables"):
        d_tree["mutables"] = tree["d_mutables"]
    if n_folded:
        print(f"[resume] migrated {n_folded} discriminator conv(s) from "
              "weight-norm to folded spectral-norm layout "
              "(pre-SNConv checkpoint; kernel moments reset)")
    d = _restore_train_state_from_tree(state.d, d_tree)
    return GANTrainState(g=g, d=d), meta


def _restore_train_state_from_tree(state, tree):
    import jax.numpy as jnp
    as_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    new = state.replace(
        params=as_dev(restore_like(
            jax.tree_util.tree_map(np.asarray, state.params),
            tree["params"])))
    if "opt_state" in tree and state.opt_state is not None:
        new = new.replace(opt_state=as_dev(restore_like(
            jax.tree_util.tree_map(np.asarray, state.opt_state),
            tree["opt_state"])))
    if tree.get("mutables") and state.mutables:
        new = new.replace(mutables=as_dev(restore_like(
            jax.tree_util.tree_map(np.asarray, state.mutables),
            tree["mutables"])))
    if "step" in tree:
        new = new.replace(step=int(tree["step"]))
    return new


def _flatten(d, prefix="", sep="/"):
    """Flatten a nested params dict to {joined/path: leaf} (shared by
    warm_start and the logger's histogram dump)."""
    out = {}
    for k, v in d.items():
        kk = f"{prefix}{sep}{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, kk, sep))
        else:
            out[kk] = v
    return out


def warm_start(params: Any, restored: Any,
               ignore_layers: tuple = (),
               force: bool = True) -> Any:
    """Partial restore: copy restored leaves into ``params`` where the
    path exists and shapes match (reference warm_start_force_model,
    train.py:182-219). ``ignore_layers`` are path substrings to skip.
    Returns (new_params, n_loaded, n_skipped)."""
    flat_p = _flatten(params)
    flat_r = _flatten(restored)
    loaded, skipped = 0, 0
    out = dict(flat_p)
    for k, v in flat_p.items():
        if any(ig in k for ig in ignore_layers):
            skipped += 1
            continue
        if k in flat_r and tuple(np.shape(flat_r[k])) == tuple(np.shape(v)):
            out[k] = np.asarray(flat_r[k]).astype(np.asarray(v).dtype)
            loaded += 1
        else:
            if not force and k not in flat_r:
                raise KeyError(f"missing param in checkpoint: {k}")
            skipped += 1

    # unflatten back
    def unflat(flat):
        tree: Dict[str, Any] = {}
        for k, v in flat.items():
            parts = k.split("/")
            d = tree
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = v
        return tree

    return unflat(out), loaded, skipped


class Checkpointer:
    """Run-directory checkpoint manager with best-model tracking.

    ``async_save=True`` overlaps serialization + disk IO with training:
    the device→host copy happens synchronously (a consistent snapshot of
    the step's params), then msgpack + write run on a single background
    thread — one save in flight at a time, later saves wait for the
    earlier one, and :meth:`wait` / process exit drain the queue. The
    atomic temp+rename in :func:`save_checkpoint` means readers never
    see a partial file. (The reference saves synchronously,
    train.py:255-279; orbax-style async is the TPU-native upgrade.)"""

    def __init__(self, run_dir: str, keep_last: int = 3,
                 async_save: bool = False):
        self.run_dir = run_dir
        self.keep_last = keep_last
        os.makedirs(run_dir, exist_ok=True)
        self.best_val_loss = float("inf")
        self.best_inf_attsc = float("-inf")
        self._executor = self._pending = None
        if async_save:
            import atexit
            import weakref
            from concurrent.futures import ThreadPoolExecutor
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-save")

            # weakref: the atexit hook must not pin the Checkpointer (one
            # per Trainer) for the life of the process, and a failed
            # final save should WARN at shutdown, not raise from atexit
            ref = weakref.ref(self)

            def _drain():
                obj = ref()
                if obj is None:
                    return
                try:
                    obj.wait()
                except Exception as e:    # pragma: no cover - shutdown
                    print(f"[checkpoint] async save failed at exit: {e}")

            atexit.register(_drain)

    def wait(self) -> None:
        """Block until any in-flight async save has landed on disk.
        A failed save raises HERE (once) — _pending is cleared first so
        one bad write never poisons every later save/wait/latest."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def _save(self, path: str, state_tree, metadata, after=None) -> None:
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-host: params are replicated, so rank 0 writes and
            # everyone else skips — concurrent writers would interleave
            # into the SAME .tmp path on a shared run_dir (the reference
            # also saves on rank 0 only, train.py:760-772)
            return
        if self._executor is None:
            save_checkpoint(path, state_tree, metadata)
            if after:
                after()
            return
        self.wait()          # one save in flight — drain BEFORE copying
        # (waiting first keeps peak host memory at ONE extra state copy)
        # consistent snapshot NOW: np.array COPIES host-resident numpy
        # leaves too (np.asarray would alias them, and the caller may
        # mutate its tree while the background thread serializes)
        host_tree = jax.tree_util.tree_map(
            lambda x: np.array(x), _to_serializable(state_tree))

        def job():
            save_checkpoint(path, host_tree, metadata)
            if after:
                after()

        self._pending = self._executor.submit(job)

    # -- periodic ----------------------------------------------------------
    def save_periodic(self, step: int, state_tree, metadata=None) -> str:
        path = os.path.join(self.run_dir, f"checkpoint_{step}")
        self._save(path, state_tree, metadata, after=self._gc)
        return path

    def _gc(self):
        cks = sorted(
            (f for f in os.listdir(self.run_dir)
             if f.startswith("checkpoint_") and not f.endswith(".json")
             and not f.endswith(".tmp")),
            key=lambda f: int(f.split("_")[1]))
        for f in cks[: -self.keep_last]:
            for suffix in ("", ".json"):
                p = os.path.join(self.run_dir, f + suffix)
                if os.path.exists(p):
                    os.remove(p)

    # -- best models ---------------------------------------------------------
    def maybe_save_best_val(self, val_loss: float, state_tree,
                            metadata=None) -> bool:
        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            # stamp the UPDATED tracker: the caller built metadata before
            # this call, and a resume restores best_val_loss from it — a
            # stale (inf on the first save) value would re-trigger best
            # saves on every post-resume validation
            metadata = {**(metadata or {}), "best_val_loss": val_loss}
            self._save(os.path.join(self.run_dir, "best_val_model"),
                       state_tree, metadata)
            return True
        return False

    def maybe_save_best_attsc(self, att_score: float, state_tree,
                              metadata=None) -> bool:
        if att_score > self.best_inf_attsc:
            self.best_inf_attsc = att_score
            metadata = {**(metadata or {}), "best_inf_attsc": att_score}
            self._save(os.path.join(self.run_dir, "best_inf_attsc"),
                       state_tree, metadata)
            return True
        return False

    # -- manual trigger (save_model.py) ---------------------------------------
    def manual_save_requested(self) -> bool:
        # rank 0 only: _save writes on rank 0, so another host consuming
        # the shared-run-dir trigger would silently drop the user's
        # manual save; the remove races that same sharing, so a missing
        # file just means someone else already took it
        if jax.process_index() != 0:
            return False
        trigger = os.path.join(self.run_dir, "save")
        if os.path.exists(trigger):
            try:
                os.remove(trigger)
            except FileNotFoundError:
                return False
            return True
        return False

    def latest(self) -> Optional[str]:
        self.wait()
        cks = [f for f in os.listdir(self.run_dir)
               if f.startswith("checkpoint_") and not f.endswith(".json")
               and not f.endswith(".tmp")]
        if not cks:
            return None
        latest = max(cks, key=lambda f: int(f.split("_")[1]))
        return os.path.join(self.run_dir, latest)
