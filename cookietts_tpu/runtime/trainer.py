"""The single shared training loop.

Replaces the reference's per-model-directory copies of train.py /
distributed.py / fp16_optimizer.py (SURVEY.md §2.7, §3.1) with ONE
runtime:

- the train step is a pjit'd pure function over a (dp, tp) mesh: batch
  sharded over dp, params replicated, gradients averaged by XLA-inserted
  collectives (no hand-rolled bucketed allreduce).
- loss scalars / LR / teacher forcing / DFR arrive as ARRAYS, so live
  config changes never trigger recompilation.
- LossExplosion handling: loss above the live threshold or NaN reloads
  best_val_model and decays LR by 2^(n_restarts/3)
  (reference train.py:40-42,732-736,831-851).
- validation runs teacher-forced AND inference-mode attention scoring
  with a forked, seeded RNG for reproducibility (train.py:403-405).
- per-file losses feed the FileLossDB for dataset curation
  (train.py:803-825).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import DEFAULT_LOSS_SCALARS, tacotron2_loss
from ..parallel.mesh import batch_sharding, replicated
from .checkpoint import Checkpointer
from .live_config import LiveConfig, LossExplosion
from .logging_util import FileLossDB, MetricsLogger
from .optim import clip_by_global_norm
from .train_state import TrainState


def scalars_to_arrays(scalars: Dict[str, float]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v, jnp.float32) for k, v in scalars.items()}


def _state_shardings(mesh, tp_rules, state):
    """Full-tree shardings for a TrainState: tp-rule-matched weights (and
    their Adam moments) shard over the tp axis, everything else
    replicates. With no rules, one replicated sharding broadcast over the
    whole tree."""
    from ..parallel.tp import tree_shardings
    if tp_rules:
        return tree_shardings(state, mesh, tp_rules)
    return replicated(mesh)


def make_tacotron2_train_step(model, mesh=None,
                              gate_positive_weight: float = 10.0,
                              guided_att_sigma: float = 0.5,
                              donate: bool = True,
                              tp_rules=None) -> Callable:
    """Build the pjit'd Tacotron2 train step.

    step(state, batch, key, ctrl, carry=None) ->
        (state, metrics, file_losses, carry)
    ``ctrl`` = dict of jnp scalars: lr, grad_clip, p_teacher_forcing,
    teacher_force_till, drop_frame_rate, + loss weights.
    ``carry`` is the TBPTT decoder state from the previous iteration;
    lanes whose ``batch['pres_prev_state']`` is 0 are reset to fresh
    state inside the model (reference model.py:507-608,
    data_utils.py:875-886). The returned carry feeds the next call.
    ``tp_rules``: parallel/tp.py rules sharding the big gate matmuls over
    the mesh's tp axis (resolved against the first call's state).
    """

    def loss_fn(params, mutables, batch, key, ctrl, carry):
        variables = {"params": params, **mutables}
        (out, new_carry), new_mut = model.apply(
            variables,
            text=batch["text"], text_lengths=batch["text_lengths"],
            mels=batch["mels"], mel_lengths=batch["mel_lengths"],
            speaker_id=batch["speaker_id"], sylps=batch["sylps"],
            torchmoji_hidden=batch.get("torchmoji"),
            key=key,
            p_teacher_forcing=ctrl["p_teacher_forcing"],
            teacher_force_till=ctrl["teacher_force_till"],
            drop_frame_rate=ctrl["drop_frame_rate"],
            global_mean=batch.get("global_mean"),
            deterministic=False,
            init_carry=carry,
            pres_prev_state=(batch.get("pres_prev_state")
                             if carry is not None else None),
            # ssvae semi-supervision: labels flow into EmotionNet so
            # known items override the classifier with their one-hot
            # (reference EmotionNet.py:66-140; round-2 gap: these never
            # reached the model in real training)
            emotion_id=batch.get("emotion_id"),
            emotion_onehot=batch.get("emotion_onehot"),
            rngs={"dropout": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"])
        gt = dict(
            mels=batch["mels"], mel_lengths=batch["mel_lengths"],
            text_lengths=batch["text_lengths"], sylps=batch["sylps"],
            gate_target=batch["gate_target"],
            pres_prev_state=batch.get(
                "pres_prev_state", jnp.zeros_like(batch["sylps"])),
        )
        if "emotion_id" in batch:
            gt["emotion_id"] = batch["emotion_id"]
            gt["emotion_onehot"] = batch["emotion_onehot"]
        loss_weights = {k: ctrl[k] for k in DEFAULT_LOSS_SCALARS if k in ctrl}
        total, loss_dict, file_losses = tacotron2_loss(
            out, gt, loss_weights,
            gate_positive_weight=gate_positive_weight,
            # live-config-schedulable (reference hparams guided_att sigma;
            # a traced scalar so annealing it does not retrace)
            guided_att_sigma=ctrl.get("guided_att_sigma", guided_att_sigma))
        return total, (loss_dict, file_losses, new_mut, new_carry)

    def step(state: TrainState, batch, key, ctrl, carry=None):
        (loss, (loss_dict, file_losses, new_mut, new_carry)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.mutables, batch, key, ctrl, carry)
        grads, grad_norm = clip_by_global_norm(grads, ctrl["grad_clip"])
        new_state = state.apply_gradients(grads, ctrl["lr"])
        new_state = new_state.replace(mutables=new_mut)
        loss_dict = dict(loss_dict)
        loss_dict["grad_norm"] = grad_norm
        return new_state, loss_dict, file_losses, new_carry

    if mesh is None:
        jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

        def wrapped(state, batch, key, ctrl, carry=None):
            return jitted(state, batch, key, ctrl, carry)
    else:
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        cache = {}

        def wrapped(state, batch, key, ctrl, carry=None):
            if "jitted" not in cache:
                ss = _state_shardings(mesh, tp_rules, state)
                # per-key batch shardings: every [B, ...] leaf over dp,
                # GLOBAL leaves (the drop-frame-rate mel mean) replicated
                bsd = {k: (rep if k == "global_mean" else bs)
                       for k in batch}
                cache["jitted"] = jax.jit(
                    step,
                    in_shardings=(ss, bsd, rep, rep, bs),
                    out_shardings=(ss, rep, bs, bs),
                    donate_argnums=(0,) if donate else (),
                )
            return cache["jitted"](state, batch, key, ctrl, carry)

    wrapped.carries_state = True         # Trainer threads the TBPTT carry
    return wrapped


def make_tacotron2_eval_step(model, mesh=None,
                             gate_positive_weight: float = 10.0,
                             tp_rules=None) -> Callable:
    """Teacher-forced validation step (no grads). Returns
    (loss_dict, file_losses, outputs) — outputs feed the alignment / mel /
    gate image logging the reference does every validation
    (logger.py:64-114). Validation runs at FULL teacher forcing
    regardless of the live training schedule (reference teacher_force=1
    mode, train.py:392-394) so val_loss stays comparable across the run.
    ``tp_rules`` must match the train step's so tp-sharded states are
    not all-gathered every validation."""

    def step(state: TrainState, batch, key, ctrl):
        del ctrl      # validation is schedule-independent
        variables = {"params": state.params, **(state.mutables or {})}
        out, _ = model.apply(
            variables,
            text=batch["text"], text_lengths=batch["text_lengths"],
            mels=batch["mels"], mel_lengths=batch["mel_lengths"],
            speaker_id=batch["speaker_id"], sylps=batch["sylps"],
            torchmoji_hidden=batch.get("torchmoji"),
            key=key,
            p_teacher_forcing=1.0,
            teacher_force_till=0,
            emotion_id=batch.get("emotion_id"),
            emotion_onehot=batch.get("emotion_onehot"),
            deterministic=True)
        gt = dict(
            mels=batch["mels"], mel_lengths=batch["mel_lengths"],
            text_lengths=batch["text_lengths"], sylps=batch["sylps"],
            gate_target=batch["gate_target"],
        )
        if "emotion_id" in batch:
            gt["emotion_id"] = batch["emotion_id"]
            gt["emotion_onehot"] = batch["emotion_onehot"]
        _, loss_dict, file_losses = tacotron2_loss(
            out, gt, gate_positive_weight=gate_positive_weight)
        images = {"alignments": out["alignments"],
                  "mel_outputs_postnet": out["mel_outputs_postnet"],
                  "gate_outputs": out["gate_outputs"]}
        return loss_dict, file_losses, images

    if mesh is None:
        return jax.jit(step)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    cache = {}

    def wrapped(state, batch, key, ctrl):
        if "jitted" not in cache:
            ss = _state_shardings(mesh, tp_rules, state)
            cache["jitted"] = jax.jit(
                step, in_shardings=(ss, bs, rep, rep),
                out_shardings=(rep, bs, bs))
        return cache["jitted"](state, batch, key, ctrl)

    return wrapped


def make_tacotron2_inference_eval_step(model, mesh=None,
                                       tp_rules=None) -> Callable:
    """FREE-RUNNING validation step (no teacher forcing).

    The reference validates BOTH teacher-forced and inference modes every
    interval and keeps a separate best_inf_attsc checkpoint scored on
    *inference* attention (train.py:774-797, teacher_force modes
    :392-394,456-457; hparams.py:15-19) — teacher-forced alignments are
    systematically easier, so scoring the attention-stability checkpoint
    on them mislabels it. Decodes ``batch['mels'].shape[1]`` steps (the
    collated bucket) and scores alignments with the gate-derived output
    lengths.

    Returns step(state, batch, key, ctrl) ->
    (loss_dict{inf_weighted_score, inf_diagonality, inf_avg_max_attention,
    inf_gate_fired}, file_losses{inf_att_score}, images).
    """
    from ..models.tacotron2 import Tacotron2
    from ..ops.metrics import alignment_metric, weighted_score

    def step(state: TrainState, batch, key, ctrl):
        del ctrl
        variables = {"params": state.params, **(state.mutables or {})}
        out = model.apply(
            variables,
            text=batch["text"], text_lengths=batch["text_lengths"],
            speaker_id=batch["speaker_id"], sylps=batch["sylps"],
            torchmoji_hidden=batch.get("torchmoji"),
            key=key, max_decoder_steps=int(batch["mels"].shape[1]),
            method=Tacotron2.inference)
        atd = alignment_metric(out["alignments"], batch["text_lengths"],
                               out["mel_lengths"])
        scores = weighted_score(atd, batch["text_lengths"],
                                out["mel_lengths"])
        T_dec = out["alignments"].shape[1]
        loss_dict = {
            "inf_weighted_score": jnp.mean(scores),
            "inf_diagonality": jnp.mean(atd["diagonalitys"]),
            "inf_avg_max_attention": jnp.mean(atd["avg_prob"]),
            # fraction of lanes whose gate fired before the step budget
            "inf_gate_fired": jnp.mean(
                (out["mel_lengths"] < T_dec).astype(jnp.float32)),
            # gate PLACEMENT: |predicted - ground-truth| length in frames.
            # gate_fired alone is satisfied by an untrained gate stopping
            # instantly; this shows the gate learning WHERE to stop
            "inf_len_abs_err": jnp.mean(jnp.abs(
                out["mel_lengths"].astype(jnp.float32)
                - batch["mel_lengths"].astype(jnp.float32))),
        }
        file_losses = {"inf_att_score": scores}
        images = {"alignments": out["alignments"],
                  "mel_outputs_postnet": out["mel_outputs_postnet"],
                  "gate_outputs": out["gate_outputs"]}
        return loss_dict, file_losses, images

    if mesh is None:
        return jax.jit(step)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    cache = {}

    def wrapped(state, batch, key, ctrl):
        if "jitted" not in cache:
            ss = _state_shardings(mesh, tp_rules, state)
            cache["jitted"] = jax.jit(
                step, in_shardings=(ss, bs, rep, rep),
                out_shardings=(rep, bs, bs))
        return cache["jitted"](state, batch, key, ctrl)

    return wrapped


def adapt_carry(carry, t_enc: int, batch_size: int):
    """Fit a TBPTT carry from the previous iteration to this batch's
    shapes. Attention weights over the text axis are truncated /
    zero-padded to the new encoder length, keeping the common prefix (the
    reference copies ``COMMON_ENCODE = min(old, new)`` columns,
    model.py:570-575 — positions past the old padding carry no
    information anyway). A batch-size change (trailing partial batches,
    bucketing shifts) keeps the common LANES and zero-fills new ones —
    zero state is exactly what a ``pres_prev_state==0`` reset produces,
    and the sampler marks fresh lanes that way, so surviving lanes keep
    their continuity instead of all lanes silently resetting."""
    if carry is None:
        return None
    att = carry.attention
    b_old = att.weights.shape[0]
    if b_old != batch_size:
        def fit_lanes(x):
            if not hasattr(x, "shape") or x.ndim == 0 \
                    or x.shape[0] != b_old:
                return x
            if b_old > batch_size:
                return x[:batch_size]
            pad = [(0, batch_size - b_old)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)
        carry = jax.tree_util.tree_map(fit_lanes, carry)
        att = carry.attention
    t_old = att.weights.shape[1]
    if t_old == t_enc:
        return carry

    def resize(x):
        if x.shape[1] >= t_enc:
            return x[:, :t_enc]
        return jnp.pad(x, ((0, 0), (0, t_enc - x.shape[1])))

    return carry._replace(attention=att._replace(
        weights=resize(att.weights), weights_cum=resize(att.weights_cum)))


def align_file_losses(paths, file_losses):
    """Per-file loss rows paired with THIS host's ``paths``, as numpy.

    Single-host (paths cover the whole batch): a straight device_get.
    Multi-host sharded loading: this host collated only its own dp rows
    ``[pi*per, (pi+1)*per)`` of the global batch (cli
    ``collate_local_shard`` layout), but the train step's per-file losses
    span the FULL global batch — slice this host's rows before pairing
    them with its local paths. The rows are host-addressable by the
    ``shard_batch`` layout; ``np.asarray`` of the full array would be
    wrong on every host but 0 and raises on real multi-host arrays.
    Mirrors the reference's per-rank ``file_losses`` accounting
    (tacotron2_tm/train.py:282-321)."""
    first = next(iter(file_losses.values()))
    if len(paths) == int(first.shape[0]):
        return {k: np.asarray(jax.device_get(v))
                for k, v in file_losses.items()}
    per = len(paths)

    def host_rows(v):
        # Pull ONLY host-addressable shards: slicing the global array with
        # per-process-different Python bounds would launch a different
        # SPMD program on every process (deadlock), and `device_get` of a
        # global array raises when it spans non-addressable devices.
        shards = getattr(v, "addressable_shards", None)
        if shards:
            by_index = {}
            for s in shards:      # dedupe replicated copies by index
                key_ = tuple((sl.start or 0, sl.stop) for sl in s.index)
                if key_ not in by_index:
                    by_index[key_] = np.asarray(s.data)
            rows = np.concatenate(
                [by_index[k] for k in sorted(by_index)], axis=0)
        else:
            rows = np.asarray(v)
        if rows.shape[0] == per:
            return rows
        # fully host-addressable (single process / replicated / numpy):
        # slice this host's dp rows host-side
        lo = jax.process_index() * per
        return rows[lo:lo + per]

    return {k: host_rows(v) for k, v in file_losses.items()}


@dataclasses.dataclass
class TrainerConfig:
    run_dir: str = "runs/default"
    live_config_path: Optional[str] = None
    log_every: int = 10
    seed: int = 1234
    n_restarts_max: int = 10
    # profiling (reference only has wall-clock prints, train.py:750-758;
    # here: smoothed s/iter scalars + an optional jax.profiler trace of
    # iterations [start, stop) written under run_dir/profile)
    profile_start: Optional[int] = None
    profile_stop: Optional[int] = None
    # overlap checkpoint serialization + IO with training (orbax-style;
    # the device->host snapshot stays synchronous, writes drain at exit)
    async_save: bool = False


class Trainer:
    """Epoch orchestration: live config, explosion recovery, curation.

    Model-agnostic: pass any (train_step, eval_step) pair built by the
    ``make_*_train_step`` factories.
    """

    def __init__(self, cfg: TrainerConfig, state: TrainState,
                 train_step: Callable, eval_step: Optional[Callable] = None,
                 val_batches: Optional[list] = None,
                 inference_eval_step: Optional[Callable] = None,
                 plateau=None):
        self.cfg = cfg
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        # free-running eval: scores best_inf_attsc on INFERENCE attention
        # (reference train.py:774-797); without it the teacher-forced
        # weighted_score drives the attsc checkpoint as a fallback
        self.inference_eval_step = inference_eval_step
        self.val_batches = val_batches    # enables cadence-driven validation
        # vocoder-style ReduceLROnPlateau: stepped with held-out val_loss
        # every validation, its scale multiplies the live-config LR
        # (reference _4_mtw/waveglow/train.py:671-700)
        self.plateau = plateau
        self.live = LiveConfig(cfg.live_config_path)
        self.ckpt = Checkpointer(cfg.run_dir, async_save=cfg.async_save)
        self.logger = MetricsLogger(cfg.run_dir)
        self.file_db = FileLossDB()
        self.n_restarts = 0
        self.default_metadata: Dict[str, Any] = {}   # stamped on every ckpt
        self.key = jax.random.PRNGKey(cfg.seed)
        # host-side copy of the INITIAL params: the explosion fallback
        # when loss goes non-finite before any best_val_model exists
        self._init_params = jax.tree_util.tree_map(
            np.asarray, jax.device_get(state.params))
        self.carry = None        # TBPTT decoder state carried across iters
        self._iter_time_ema = None   # smoothed s/iter (tracing subsystem)
        self._profiling = False
        self._start_validated = False   # one-shot validate_at_start guard

    def resume(self, path: Optional[str] = None) -> int:
        """Full resume (params + optimizer + step) from ``path`` or the
        latest periodic checkpoint in the run dir (reference full-resume
        mode, train.py:255-279). Returns the restored step."""
        path = path or self.ckpt.latest()
        if path is None:
            print("[trainer] no checkpoint to resume from; starting fresh")
            return 0
        from .checkpoint import restore_any
        self.state, meta = restore_any(self.state, path)
        if meta:
            self.ckpt.best_val_loss = float(
                meta.get("best_val_loss", self.ckpt.best_val_loss))
            self.ckpt.best_inf_attsc = float(
                meta.get("best_inf_attsc", self.ckpt.best_inf_attsc))
            # schedule state: without these a resumed vocoder run trains
            # at full base LR and re-counts explosions from zero
            self.n_restarts = int(meta.get("n_restarts", self.n_restarts))
            if self.plateau is not None and "plateau_scale" in meta:
                self.plateau.scale = float(meta["plateau_scale"])
        print(f"[trainer] resumed from {path} at step {self.state.step}")
        return int(self.state.step)

    # -- control dict from live config ------------------------------------
    def ctrl(self, iteration: int) -> Dict[str, jnp.ndarray]:
        live = self.live.values
        base_lr = self.live.lr(iteration)
        lr = base_lr / (2.0 ** (self.n_restarts / 3.0))
        if self.plateau is not None:
            # torch ReduceLROnPlateau floors the EFFECTIVE lr at min_lr
            # (never raising it above the base schedule)
            lr = max(lr * self.plateau.scale,
                     min(self.plateau.min_lr, lr))
        ctrl = {
            "lr": lr,
            "grad_clip": live.get("grad_clip_thresh", 1.0),
            "p_teacher_forcing": live.get("p_teacher_forcing", 1.0),
            "teacher_force_till": live.get("teacher_force_till", 20),
            "drop_frame_rate": live.get("drop_frame_rate", 0.0),
            "guided_att_sigma": live.get("guided_att_sigma", 0.5),
        }
        weights = dict(DEFAULT_LOSS_SCALARS)
        weights.update(live.get("loss_scalars", {}))
        ctrl.update(weights)
        return scalars_to_arrays(ctrl)

    # -- profiling ------------------------------------------------------------
    def _maybe_profile(self, it: int) -> None:
        """Start/stop a jax.profiler trace around the configured iteration
        window (TensorBoard-readable, run_dir/profile)."""
        cfg = self.cfg
        if cfg.profile_start is None:
            return
        import os
        if not self._profiling and it == cfg.profile_start:
            jax.profiler.start_trace(os.path.join(cfg.run_dir, "profile"))
            self._profiling = True
        elif self._profiling and (cfg.profile_stop is None
                                  or it >= cfg.profile_stop):
            jax.profiler.stop_trace()
            self._profiling = False

    # -- one iteration -------------------------------------------------------
    def step(self, batch: Dict[str, Any]) -> Dict[str, float]:
        t_start = time.perf_counter()
        it = int(self.state.step)
        self._maybe_profile(it)
        if it % 5 == 0:
            self.live.poll({"iteration": it})
        if (it == 0 and not self._start_validated
                and bool(self.live.get("validate_at_start", False))
                and self.eval_step is not None and self.val_batches):
            # opt-in step-0 validation: anchors learning curves at TRUE
            # random init (the reference's first val fires only after
            # validation_interval steps, train.py:774-797)
            self._start_validated = True
            self.validate(self.val_batches, iteration=0)
            if self.inference_eval_step is not None:
                self.validate(self.val_batches, iteration=0,
                              step_fn=self.inference_eval_step,
                              prefix="validation_inf")
        self.key, sub = jax.random.split(self.key)
        ctrl = self.ctrl(it)
        batch = dict(batch)           # never mutate the caller's dict
        paths = batch.pop("audiopath", None)
        batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
        if getattr(self.train_step, "carries_state", False):
            carry = adapt_carry(self.carry, int(batch_dev["text"].shape[1]),
                                int(batch_dev["text"].shape[0]))
            new_state, loss_dict, file_losses, new_carry = self.train_step(
                self.state, batch_dev, sub, ctrl, carry)
        else:
            res = self.train_step(self.state, batch_dev, sub, ctrl)
            # step factories return (state, metrics[, file_losses]) —
            # vocoder/GAN steps have no per-file losses
            new_state, loss_dict = res[0], res[1]
            file_losses = res[2] if len(res) > 2 else {}
            new_carry = None

        loss = float(loss_dict["loss"])
        thresh = float(self.live.get("LossExplosionThreshold", 1e3))
        if not np.isfinite(loss) or loss > thresh:
            # NOTE: with donate=True the input state's buffers are deleted
            # by the train step, so recovery must rebuild from new_state
            # (still materialized) or a checkpoint — never self.state.
            self.carry = None    # fresh decoder states after a blowup
            self._recover(loss, new_state)
            return {"loss": loss, "exploded": 1.0}

        self.state = new_state
        self.carry = new_carry
        if paths is not None and file_losses:
            self.file_db.update(
                paths, align_file_losses(paths, file_losses))
        metrics = {k: float(v) for k, v in loss_dict.items()}
        dt = time.perf_counter() - t_start
        self._iter_time_ema = (dt if self._iter_time_ema is None
                               else 0.95 * self._iter_time_ema + 0.05 * dt)
        if it % self.cfg.log_every == 0:
            metrics["lr"] = float(ctrl["lr"])
            metrics["s_per_iter"] = self._iter_time_ema
            self.logger.log_scalars(it, metrics)
        # param histograms every 20k iters (reference logger.py:57-58);
        # live-configurable, 0 disables
        hi = int(self.live.get("histogram_interval", 20000) or 0)
        if hi > 0 and int(self.state.step) % hi == 0:
            self.logger.log_histograms(
                int(self.state.step),
                jax.tree.map(np.asarray, self.state.params))
        if self.ckpt.manual_save_requested():
            self.save(periodic=True)

        # cadence from the live config (reference validates teacher-forced
        # + saves on validation_interval, train.py:774-797, and
        # checkpoints on checkpoint_interval)
        it_now = int(self.state.step)
        vi = int(self.live.get("validation_interval", 0) or 0)
        if (self.eval_step is not None and self.val_batches
                and vi > 0 and it_now % vi == 0):
            means = self.validate(self.val_batches, iteration=it_now)
            if self.plateau is not None and "val_loss" in means:
                self.plateau.step(means["val_loss"])
            att_score = means.get("val_weighted_score")
            if self.inference_eval_step is not None:
                # the attention-stability checkpoint follows the
                # FREE-RUNNING score, not the (easier) teacher-forced one
                inf = self.validate(self.val_batches, iteration=it_now,
                                    step_fn=self.inference_eval_step,
                                    prefix="validation_inf")
                att_score = inf.get("val_inf_weighted_score", att_score)
            self.save(periodic=False, val_loss=means.get("val_loss"),
                      att_score=att_score)
        ci = int(self.live.get("checkpoint_interval", 0) or 0)
        if ci > 0 and it_now % ci == 0:
            self.save(periodic=True)
        return metrics

    # -- explosion recovery ----------------------------------------------------
    def _recover(self, loss: float, new_state: TrainState):
        """Reload best_val_model — FULL state: params + optimizer moments +
        step (reference train.py:831-851 reloads the whole checkpoint) —
        with decayed LR. If no best model exists yet, continue from
        ``new_state`` (the one clipped update that tripped the threshold);
        the donated input state is already deleted and must not be read."""
        self.n_restarts += 1
        if self.n_restarts > self.cfg.n_restarts_max:
            raise LossExplosion(
                f"loss {loss} exploded {self.n_restarts} times; giving up")
        import os
        self.ckpt.wait()     # a best-model save may still be in flight
        best = os.path.join(self.cfg.run_dir, "best_val_model")
        if os.path.exists(best):
            from .checkpoint import restore_any
            self.state, _ = restore_any(new_state, best)
        else:
            self.state = new_state
            finite = all(
                bool(np.all(np.isfinite(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(
                    jax.device_get(new_state.params))
                if np.issubdtype(np.asarray(x).dtype, np.floating))
            if not finite:
                # NaN grads poisoned the one update that tripped the
                # threshold and no checkpoint exists yet to reload — a
                # bare retry would NaN-loop to n_restarts_max. Restart
                # from the stashed INITIAL params with fresh moments.
                self.state = self._reset_to_initial(new_state)
                print("[trainer] non-finite params with no best "
                      "checkpoint; reset to initial params")
        print(f"[trainer] LossExplosion (loss={loss}); restart "
              f"#{self.n_restarts}, lr decay 2^{self.n_restarts}/3")

    def _reset_to_initial(self, state):
        """Fresh start: initial params, zeroed optimizer moments, step
        kept (a poisoned state has nothing worth preserving)."""
        params = jax.tree_util.tree_map(jnp.asarray, self._init_params)
        opt_state = jax.tree_util.tree_map(
            jnp.zeros_like, state.opt_state)
        return state.replace(params=params, opt_state=opt_state)

    # -- checkpointing ------------------------------------------------------
    def _state_tree(self):
        # GANTrainState serializes G under the usual keys + d_params/...
        return self.state.to_host_tree()

    def save(self, periodic=True, val_loss: Optional[float] = None,
             att_score: Optional[float] = None, metadata=None):
        tree = self._state_tree()
        metadata = {**self.default_metadata, **(metadata or {})}
        metadata.setdefault("best_val_loss", self.ckpt.best_val_loss)
        metadata.setdefault("best_inf_attsc", self.ckpt.best_inf_attsc)
        metadata.setdefault("n_restarts", self.n_restarts)
        if self.plateau is not None:
            metadata.setdefault("plateau_scale", self.plateau.scale)
        if periodic:
            self.ckpt.save_periodic(int(self.state.step), tree, metadata)
        if val_loss is not None:
            self.ckpt.maybe_save_best_val(val_loss, tree, metadata)
        if att_score is not None:
            self.ckpt.maybe_save_best_attsc(att_score, tree, metadata)

    def validate(self, batches, iteration: Optional[int] = None,
                 log_images: bool = True, step_fn: Optional[Callable] = None,
                 prefix: str = "validation") -> Dict[str, float]:
        """Seeded, reproducible validation over an iterable of batches,
        with alignment / mel / gate images from the first batch
        (reference logger.py:64-114 logs these every validation).
        ``step_fn`` defaults to the teacher-forced eval step; pass
        ``self.inference_eval_step`` with ``prefix='validation_inf'`` for
        the free-running namespace."""
        step_fn = step_fn or self.eval_step
        assert step_fn is not None
        it = iteration if iteration is not None else int(self.state.step)
        ctrl = self.ctrl(it)          # fixed for the whole validation
        agg: Dict[str, list] = {}
        first = None
        for i, batch in enumerate(batches):
            key = jax.random.PRNGKey(self.cfg.seed + i)   # forked, seeded
            batch = dict(batch)
            paths = batch.pop("audiopath", None)
            # leaves stay host-side: jit places them per its in_shardings
            # (an eager jnp.asarray would COMMIT process-local arrays
            # that a multi-host mesh cannot reshard)
            res = step_fn(self.state, batch, key, ctrl)
            loss_dict, outputs = res[0], (res[2] if len(res) > 2 else None)
            if paths is not None and len(res) > 1 and res[1]:
                # validation per-file scores (e.g. inf_att_score) join the
                # curation db alongside the training losses
                self.file_db.update(paths, align_file_losses(paths, res[1]))
            for k, v in loss_dict.items():
                agg.setdefault(k, []).append(float(v))
            if i == 0 and outputs is not None:
                first = (batch, outputs)
        means = {f"val_{k}": float(np.mean(v)) for k, v in agg.items()}
        self.logger.log_scalars(it, means, prefix=prefix)
        if log_images and first is not None:
            self._log_validation_images(it, *first, prefix=prefix)
        return means

    def _log_validation_images(self, it: int, batch, outputs,
                               prefix: str = "validation") -> None:
        try:
            from .plotting import plot_alignment, plot_gate, plot_spectrogram
            t_dec = int(batch["mel_lengths"][0])
            t_enc = int(batch["text_lengths"][0])
            align = np.asarray(outputs["alignments"])[0, :t_dec, :t_enc]
            self.logger.log_image(it, f"{prefix}/alignment",
                                  plot_alignment(align))
            mel_pred = np.asarray(outputs["mel_outputs_postnet"])[0, :t_dec]
            self.logger.log_image(it, f"{prefix}/mel_predicted",
                                  plot_spectrogram(mel_pred, "predicted"))
            mel_gt = np.asarray(batch["mels"])[0, :t_dec]
            self.logger.log_image(it, f"{prefix}/mel_target",
                                  plot_spectrogram(mel_gt, "target"))
            if "gate_target" in batch:
                self.logger.log_image(
                    it, f"{prefix}/gate",
                    plot_gate(np.asarray(batch["gate_target"])[0, :t_dec],
                              np.asarray(outputs["gate_outputs"])[0, :t_dec]))
        except Exception as e:  # rendering must never kill training
            print(f"[trainer] image logging failed: {e!r}")


def make_gan_trainer_step(d_step, g_step, pass_key: bool = True,
                          loss_key: str = "g_loss",
                          d_lr_scale: float = 1.0) -> Callable:
    """Adapt a (d_step, g_step) pair to the Trainer's single-step
    interface over a :class:`GANTrainState`: one call runs D then G (the
    reference's alternating update, e.g. _2_ttm/GANTTS/train.py:344-395)
    and returns (state, metrics) with ``metrics['loss']`` aliased from
    ``loss_key`` so explosion detection and logging work unchanged.
    ``d_lr_scale`` scales the discriminator LR (train.py:344)."""
    from .train_state import GANTrainState

    def step(state: GANTrainState, batch, key, ctrl):
        d_ctrl = dict(ctrl)
        if d_lr_scale != 1.0:
            d_ctrl["lr"] = ctrl["lr"] * d_lr_scale
        if pass_key:
            d, d_m = d_step(state.d, state.g, batch, key, d_ctrl)
            g, g_m = g_step(state.g, d, batch, key, ctrl)
        else:
            d, d_m = d_step(state.d, state.g, batch, d_ctrl)
            g, g_m = g_step(state.g, d, batch, ctrl)
        metrics = {**{k: v for k, v in d_m.items()},
                   **{k: v for k, v in g_m.items()}}
        metrics["loss"] = metrics.get(loss_key, metrics.get("g_loss", 0.0))
        return GANTrainState(g=g, d=d), metrics

    return step


# -- vocoder (WaveGlow/WaveFlow) steps ----------------------------------------

def make_waveglow_train_step(model, mesh=None, sigma: float = 1.0,
                             donate: bool = True, tp_rules=None) -> Callable:
    """Flow-NLL train step (reference _4_mtw/waveglow/train.py:522-616).

    step(state, batch{audio, mels}, key, ctrl{lr, grad_clip}) ->
    (state, metrics, per_item_z_sq)
    ``tp_rules``: parallel/tp.py rules sharding the WN channel matmuls
    over the mesh's tp axis.
    """
    from ..models.waveglow import waveglow_loss

    def loss_fn(params, batch):
        # speaker conditioning threads through when the model has speaker
        # embeddings (reference passes speaker_ids from Mel2Samp,
        # _4_mtw/waveglow/train.py:583-587)
        out = model.apply({"params": params}, batch["audio"], batch["mels"],
                          speaker_ids=batch.get("speaker_id"))
        loss, loss_dict = waveglow_loss(out, sigma=sigma)
        return loss, loss_dict

    def step(state: TrainState, batch, key, ctrl):
        del key
        (loss, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        grads, grad_norm = clip_by_global_norm(grads, ctrl["grad_clip"])
        new_state = state.apply_gradients(grads, ctrl["lr"])
        loss_dict = dict(loss_dict)
        loss_dict["grad_norm"] = grad_norm
        return new_state, loss_dict

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    rep = replicated(mesh)
    cache = {}

    def wrapped(state, batch, key, ctrl):
        if "jitted" not in cache:
            ss = _state_shardings(mesh, tp_rules, state)
            # sp meshes additionally shard the audio/mel TIME axes —
            # the flows are pointwise-in-time given cond, so GSPMD only
            # inserts conv halo exchanges (sequence parallelism; the
            # reference has none, SURVEY §2.6)
            from ..parallel.mesh import sp_batch_shardings
            bs = sp_batch_shardings(batch, mesh)
            cache["jitted"] = jax.jit(
                step, in_shardings=(ss, bs, rep, rep),
                out_shardings=(ss, rep),
                donate_argnums=(0,) if donate else ())
        return cache["jitted"](state, batch, key, ctrl)

    return wrapped


def make_waveglow_val_step(model, stft_windows=((1200, 300, 1200),
                                                (2400, 600, 2400)),
                           sigma: float = 1.0) -> Callable:
    """Validation: invert the flow from sampled z and compare multi-window
    STFT magnitudes to ground truth (reference train.py:184-341).

    Returns step(state, batch, key) -> dict(val_MSE, val_MAE).
    Call ``elapsed/audio_seconds`` host-side for the RTF scalar the
    reference also logs.
    """
    from ..audio.stft import STFT
    from ..models.waveglow import WaveGlow

    banks = [STFT(f, h, w) for (f, h, w) in stft_windows]

    def step(state: TrainState, batch, key):
        variables = {"params": state.params}
        gen = model.apply(variables, batch["mels"], key, sigma,
                          method=WaveGlow.infer)
        gt = batch["audio"][:, : gen.shape[1]]
        gen = gen[:, : gt.shape[1]].astype(jnp.float32)
        mse = jnp.zeros((), jnp.float32)
        mae = jnp.zeros((), jnp.float32)
        for bank in banks:
            mag_gen, _ = bank.transform(gen, return_phase=False)
            mag_gt, _ = bank.transform(gt, return_phase=False)
            mse = mse + jnp.mean((mag_gen - mag_gt) ** 2)
            mae = mae + jnp.mean(jnp.abs(mag_gen - mag_gt))
        n = float(len(banks))
        return {"val_MSE": mse / n, "val_MAE": mae / n}

    return jax.jit(step)


# -- adversarial postnet (ssvae GAN postnet) steps -----------------------------

def _gan_jit(step, mesh, has_key=False):
    """jit a GAN step under an optional dp mesh: both states + ctrl (+key)
    replicated, batch sharded over dp — GSPMD inserts the gradient
    collectives (the data-parallel DDP the reference uses for hifigan,
    _4_mtw/hifigan/train.py:66-69)."""
    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    bs = batch_sharding(mesh)
    in_sh = (rep, rep, bs) + ((rep,) if has_key else ()) + (rep,)
    return jax.jit(step, in_shardings=in_sh, out_shardings=(rep, rep))


def make_gan_postnet_train_steps(postnet, disc, mel_weight: float = 1.0,
                                 mesh=None) -> Tuple[Callable, Callable]:
    """G/D steps for the ssvae adversarial postnet
    (reference tacotron2_ssvae/model.py:183-316): the postnet refines the
    decoder mel toward the ground truth while fooling a speaker-conditioned
    fakeness discriminator (real label 0, fake label 1, BCE).

    batch = {decoder_mel [B,T,M], gt_mel [B,T,M], speaker_embed [B,S],
             mel_mask [B,T] (optional)}.
    d_step(d_state, g_state, batch, key, ctrl) and
    g_step(g_state, d_state, batch, key, ctrl); both return
    (state, metrics). States carry batch_stats in ``mutables``.
    """
    from ..models.gan_postnet import gan_postnet_losses

    def _mask(batch):
        if "mel_mask" in batch:
            return batch["mel_mask"][:, :, None].astype(jnp.float32)
        return jnp.ones_like(batch["gt_mel"][..., :1], jnp.float32)

    def _apply_g(g_params, g_mut, batch, key):
        return postnet.apply(
            {"params": g_params, **g_mut}, batch["decoder_mel"],
            batch["speaker_embed"], key=key, deterministic=False,
            mutable=["batch_stats"])

    def g_loss_fn(g_params, g_mut, d_params, d_mut, batch, key):
        fake, new_mut = _apply_g(g_params, g_mut, batch, key)
        d_fake = disc.apply({"params": d_params, **d_mut}, fake,
                            batch["speaker_embed"], deterministic=True)
        g_adv, _ = gan_postnet_losses(d_fake, d_fake)   # only fake term used
        m = _mask(batch)
        mel_mse = jnp.sum(((fake - batch["gt_mel"]) ** 2) * m) \
            / jnp.maximum(jnp.sum(m) * fake.shape[-1], 1.0)
        total = g_adv + mel_weight * mel_mse
        return total, ({"g_adv": g_adv, "g_mel_MSE": mel_mse,
                        "g_loss": total}, new_mut)

    def d_loss_fn(d_params, d_mut, g_params, g_mut, batch, key):
        fake, _ = _apply_g(g_params, g_mut, batch, key)
        fake = jax.lax.stop_gradient(fake)
        variables = {"params": d_params, **d_mut}
        d_real, new_mut = disc.apply(
            variables, batch["gt_mel"], batch["speaker_embed"],
            deterministic=False, mutable=["batch_stats"])
        d_fake, new_mut2 = disc.apply(
            {"params": d_params, **new_mut}, fake, batch["speaker_embed"],
            deterministic=False, mutable=["batch_stats"])
        _, d_loss = gan_postnet_losses(d_real, d_fake)
        return d_loss, ({"d_loss": d_loss,
                         "d_real": jnp.mean(d_real),
                         "d_fake": jnp.mean(d_fake)}, new_mut2)

    def g_step(g_state, d_state, batch, key, ctrl):
        (loss, (metrics, new_mut)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(
                g_state.params, g_state.mutables or {},
                d_state.params, d_state.mutables or {}, batch, key)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        g_state = g_state.apply_gradients(grads, ctrl["lr"])
        g_state = g_state.replace(mutables=new_mut)
        metrics = dict(metrics)
        metrics["g_grad_norm"] = gn
        return g_state, metrics

    def d_step(d_state, g_state, batch, key, ctrl):
        (loss, (metrics, new_mut)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(
                d_state.params, d_state.mutables or {},
                g_state.params, g_state.mutables or {}, batch, key)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        d_state = d_state.apply_gradients(grads, ctrl["lr"])
        d_state = d_state.replace(mutables=new_mut)
        metrics = dict(metrics)
        metrics["d_grad_norm"] = gn
        return d_state, metrics

    return (_gan_jit(d_step, mesh, has_key=True),
            _gan_jit(g_step, mesh, has_key=True))


# -- HiFiGAN-Denoiser staged steps ----------------------------------------------

def make_hifigan_denoiser_train_steps(gen, dw, ds, mrs, stage: int = 0,
                                      mesh=None) -> Tuple[Callable, Callable]:
    """Staged denoiser training (reference HiFiGAN_Denoiser/model.py:59-175):
    stage 0/1 = log multi-res spectral L1 + audio L1 only; stage >= 2 is
    adversarial — fakeness logits of the wave (DW) and spectrogram (DS)
    critics are SUMMED and pushed through ONE BCE (real label 0, fake
    label 1; model.py:80-84,113-126), D loss averaged over the real and
    fake halves (model.py:126).

    batch = {noisy [B,T], clean [B,T]}.
    Returns (d_step, g_step); d_step is a no-op (returns state unchanged)
    below stage 2.
    """
    from ..models.hifigan_denoiser import (denoiser_loss, fakeness_bce,
                                           log_compress)

    def _spect(audio):
        # DS sees the log-compressed concatenated multi-res spectrogram
        # (model.py:65-68)
        return log_compress(mrs(audio))

    def g_loss_fn(g_params, d_params, batch):
        pred = gen.apply({"params": g_params}, batch["noisy"])
        dw_fake = ds_fake = None
        if stage >= 2:
            dw_params, ds_params = d_params
            dw_fake = dw.apply({"params": dw_params}, pred)
            ds_fake = ds.apply({"params": ds_params}, _spect(pred))
        total, loss_dict = denoiser_loss(mrs, pred, batch["clean"],
                                         stage=stage, dw_fake=dw_fake,
                                         ds_fake=ds_fake)
        return total, loss_dict

    def d_loss_fn(d_params, g_params, batch):
        pred = jax.lax.stop_gradient(
            gen.apply({"params": g_params}, batch["noisy"]))
        dw_params, ds_params = d_params

        def fakeness(audio):
            return (dw.apply({"params": dw_params}, audio)
                    + ds.apply({"params": ds_params}, _spect(audio)))

        real_loss = fakeness_bce(fakeness(batch["clean"]), fake_label=0.0)
        fake_loss = fakeness_bce(fakeness(pred), fake_label=1.0)
        loss = (real_loss + fake_loss) / 2.0
        return loss, {"d_loss": loss}

    def g_step(g_state, d_state, batch, ctrl):
        (loss, metrics), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params,
                                     d_state.params, batch)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        g_state = g_state.apply_gradients(grads, ctrl["lr"])
        metrics = dict(metrics)
        metrics["g_grad_norm"] = gn
        return g_state, metrics

    g_step = _gan_jit(g_step, mesh)
    if stage < 2:
        def d_step(d_state, g_state, batch, ctrl):   # pre-adversarial stage
            return d_state, {"d_loss": 0.0}
        return d_step, g_step

    def d_step(d_state, g_state, batch, ctrl):
        (loss, metrics), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params, g_state.params, batch)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        d_state = d_state.apply_gradients(grads, ctrl["lr"])
        metrics = dict(metrics)
        metrics["d_grad_norm"] = gn
        return d_state, metrics

    return _gan_jit(d_step, mesh), g_step


# -- UnTTS (NAR flow TTS) steps ------------------------------------------------

def _untts_loss_fn(model, sigma, dur_weight, f0_weight, energy_weight,
                   varglow_weight, deterministic: bool):
    """Shared UnTTS loss closure for the train AND eval steps (decoder
    flow NLL + predictor MSEs + optional VarGlow NLL)."""
    from ..models.untts import untts_loss, varglow_loss

    def loss_fn(params, batch, key):
        kwargs = {} if deterministic else {"rngs": {"dropout": key}}
        out = model.apply(
            {"params": params},
            text=batch["text"], text_lengths=batch["text_lengths"],
            mels=batch["mels"], mel_lengths=batch["mel_lengths"],
            speaker_id=batch["speaker_id"], durations=batch["durations"],
            f0=batch.get("f0"), energy=batch.get("energy"),
            frame_f0=batch.get("frame_f0"),
            frame_energy=batch.get("frame_energy"),
            frame_voiced=batch.get("frame_voiced"),
            deterministic=deterministic, **kwargs)
        gt = {"durations": batch["durations"]}
        if "f0" in batch:
            gt["f0"] = batch["f0"]
        if "energy" in batch:
            gt["energy"] = batch["energy"]
        total, loss_dict = untts_loss(
            out, gt, sigma=sigma, dur_weight=dur_weight,
            f0_weight=f0_weight, energy_weight=energy_weight)
        if "varglow_z" in out:
            vnll = varglow_loss(out["varglow_z"], out["varglow_log_s"],
                                out["varglow_logdet_w"], out["varglow_n"])
            total = total + varglow_weight * vnll
            loss_dict = dict(loss_dict)
            loss_dict["varglow_nll"] = vnll
            loss_dict["loss"] = total
        return total, loss_dict

    return loss_fn


def make_untts_eval_step(model, sigma: float = 1.0, dur_weight: float = 0.1,
                         f0_weight: float = 0.1, energy_weight: float = 0.1,
                         varglow_weight: float = 1.0) -> Callable:
    """Held-out validation: the training loss in deterministic mode,
    no gradients (reference _2_ttm/untts/train.py validation loop)."""
    loss_fn = _untts_loss_fn(model, sigma, dur_weight, f0_weight,
                             energy_weight, varglow_weight,
                             deterministic=True)

    def step(state: TrainState, batch, key, ctrl):
        _, loss_dict = loss_fn(state.params, batch, key)
        return dict(loss_dict), {}

    return jax.jit(step)


def make_untts_train_step(model, mesh=None, sigma: float = 1.0,
                          dur_weight: float = 0.1, f0_weight: float = 0.1,
                          energy_weight: float = 0.1,
                          varglow_weight: float = 1.0,
                          donate: bool = True) -> Callable:
    """NAR flow-TTS train step (reference _2_ttm/untts/train.py): decoder
    flow NLL + duration/f0/energy predictor MSE (+ VarGlow prosody-flow
    NLL when the model has one).

    step(state, batch, key, ctrl) -> (state, metrics)
    batch = {text, text_lengths, mels, mel_lengths, speaker_id, durations
             [, f0, energy]} with per-CHAR f0/energy (the dataset's
             ``durations`` feature provides all three).
    """
    loss_fn = _untts_loss_fn(model, sigma, dur_weight, f0_weight,
                             energy_weight, varglow_weight,
                             deterministic=False)

    def step(state: TrainState, batch, key, ctrl):
        (loss, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, key)
        grads, grad_norm = clip_by_global_norm(grads, ctrl["grad_clip"])
        new_state = state.apply_gradients(grads, ctrl["lr"])
        loss_dict = dict(loss_dict)
        loss_dict["grad_norm"] = grad_norm
        return new_state, loss_dict

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(step, in_shardings=(rep, bs, rep, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,) if donate else ())


# -- HiFi-GAN steps ----------------------------------------------------------

def make_hifigan_train_steps(gen, mpd, msd, mel_fn,
                             mel_weight: float = 45.0,
                             fm_weight: float = 2.0,
                             mesh=None) -> Tuple[Callable, Callable]:
    """Build (d_step, g_step) for HiFi-GAN adversarial training.

    Reference _4_mtw/hifigan/train.py:26-283: AdamW both sides, mel L1
    weight 45, feature-matching on both discriminators.

    d_step(d_state(mpd,msd tuple), g_state, batch) and
    g_step(g_state, d_state, batch) where batch = {mels, audio}.
    mel_fn(audio [B, T]) -> mel [B, T_mel, M] (jittable; used for the mel
    reconstruction loss on generated audio).
    """
    from ..models.hifigan import (discriminator_loss, feature_loss,
                                  generator_loss, mel_l1_loss)

    def d_loss_fn(d_params, g_params, batch):
        mpd_params, msd_params = d_params
        fake = gen.apply({"params": g_params}, batch["mels"])
        fake = jax.lax.stop_gradient(fake)
        n = min(fake.shape[1], batch["audio"].shape[1])
        fake = fake[:, :n]
        real = batch["audio"][:, :n]
        rl, fl, _, _ = mpd.apply({"params": mpd_params}, real, fake)
        rl2, fl2, _, _ = msd.apply({"params": msd_params}, real, fake)
        loss = discriminator_loss(rl + rl2, fl + fl2)
        return loss, {"d_loss": loss}

    def g_loss_fn(g_params, d_params, batch):
        mpd_params, msd_params = d_params
        fake = gen.apply({"params": g_params}, batch["mels"])
        n = min(fake.shape[1], batch["audio"].shape[1])
        fake = fake[:, :n]
        real = batch["audio"][:, :n]
        rl, fl, rf, ff = mpd.apply({"params": mpd_params}, real, fake)
        rl2, fl2, rf2, ff2 = msd.apply({"params": msd_params}, real, fake)
        adv = generator_loss(fl + fl2)
        fm = feature_loss(rf + rf2, ff + ff2)
        mel_rec = mel_l1_loss(mel_fn(real), mel_fn(fake))
        loss = adv + fm_weight * fm + mel_weight * mel_rec
        return loss, {"g_adv": adv, "g_fm": fm, "g_mel_l1": mel_rec,
                      "g_loss": loss}

    def d_step(d_state, g_state, batch, ctrl):
        (loss, metrics), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params, g_state.params, batch)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        d_state = d_state.apply_gradients(grads, ctrl["lr"])
        metrics = dict(metrics)
        metrics["d_grad_norm"] = gn
        return d_state, metrics

    def g_step(g_state, d_state, batch, ctrl):
        (loss, metrics), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params, d_state.params, batch)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        g_state = g_state.apply_gradients(grads, ctrl["lr"])
        metrics = dict(metrics)
        metrics["g_grad_norm"] = gn
        return g_state, metrics

    return _gan_jit(d_step, mesh), _gan_jit(g_step, mesh)


# -- GAN-TTS steps -----------------------------------------------------------

def make_gantts_train_steps(gen, disc, mel_weight: float = 1.0,
                            mesh=None) -> Tuple[Callable, Callable]:
    """(d_step, g_step) for GAN-TTS adversarial training.

    Reference _2_ttm/GANTTS/train.py:344-395: plain BCE on the
    discriminator's fakeness — the generator drives its samples toward
    the "real" label (:359), the discriminator drives real->real and
    fake->fake (:385-389). Our window-discriminator ensemble returns
    per-window LOGITS, so the BCE is computed with logits; a masked mel
    L1 term (``mel_weight``, 0 disables) anchors the generator the way
    the reference's teacher-forced variants do.

    batch = {text, text_lengths, speaker_id, durations, mels [B,T,M],
             mel_lengths}; both steps take (state, other_state, batch,
    key, ctrl) and return (state, metrics).
    """
    def _bce_logits(logits, target):
        # mean softplus BCE: target 1 = real
        x = logits.astype(jnp.float32)
        return jnp.mean(jax.nn.softplus(x) - target * x)

    def _gen_mel(g_params, batch, key):
        return gen.apply(
            {"params": g_params}, text=batch["text"],
            text_lengths=batch["text_lengths"],
            speaker_id=batch["speaker_id"], durations=batch["durations"],
            t_out=batch["mels"].shape[1], key=key, deterministic=False,
            rngs={"dropout": key})

    def g_loss_fn(g_params, d_params, batch, key):
        fake, frame_mask = _gen_mel(g_params, batch, key)
        logits = disc.apply({"params": d_params}, fake,
                            key=jax.random.fold_in(key, 1))
        g_adv = sum(_bce_logits(l, 1.0) for l in logits) / len(logits)
        m = frame_mask[:, :, None].astype(jnp.float32)
        mel_l1 = jnp.sum(jnp.abs(fake - batch["mels"]) * m) \
            / jnp.maximum(jnp.sum(m) * fake.shape[-1], 1.0)
        total = g_adv + mel_weight * mel_l1
        return total, {"g_adv": g_adv, "g_mel_l1": mel_l1,
                       "g_loss": total}

    def d_loss_fn(d_params, g_params, batch, key):
        fake, _ = _gen_mel(g_params, batch, key)
        fake = jax.lax.stop_gradient(fake)
        wkey = jax.random.fold_in(key, 1)
        real_logits = disc.apply({"params": d_params}, batch["mels"],
                                 key=wkey)
        fake_logits = disc.apply({"params": d_params}, fake, key=wkey)
        d_real = sum(_bce_logits(l, 1.0) for l in real_logits)
        d_fake = sum(_bce_logits(l, 0.0) for l in fake_logits)
        loss = (d_real + d_fake) / len(real_logits)
        return loss, {"d_loss": loss,
                      "d_real_logit": jnp.mean(real_logits[0]),
                      "d_fake_logit": jnp.mean(fake_logits[0])}

    def d_step(d_state, g_state, batch, key, ctrl):
        (loss, metrics), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params, g_state.params,
                                     batch, key)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        d_state = d_state.apply_gradients(grads, ctrl["lr"])
        metrics = dict(metrics)
        metrics["d_grad_norm"] = gn
        return d_state, metrics

    def g_step(g_state, d_state, batch, key, ctrl):
        (loss, metrics), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params, d_state.params,
                                     batch, key)
        grads, gn = clip_by_global_norm(grads, ctrl["grad_clip"])
        g_state = g_state.apply_gradients(grads, ctrl["lr"])
        metrics = dict(metrics)
        metrics["g_grad_norm"] = gn
        return g_state, metrics

    return (_gan_jit(d_step, mesh, has_key=True),
            _gan_jit(g_step, mesh, has_key=True))
