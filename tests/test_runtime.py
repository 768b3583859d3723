"""Runtime component tests: optimizers, checkpointing, live config,
dataset collate/TBPTT, mesh helpers. Mostly host-side (fast)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from cookietts_tpu.data.dataset import (
    DataConfig, Segment, TBPTTSampler, bucket_size, collate)
from cookietts_tpu.parallel.mesh import make_mesh, shard_batch
from cookietts_tpu.runtime.checkpoint import (
    Checkpointer, load_checkpoint, save_checkpoint, warm_start)
from cookietts_tpu.runtime.live_config import (
    LiveConfig, piecewise_warmup_decay_lr)
from cookietts_tpu.runtime.logging_util import FileLossDB
from cookietts_tpu.runtime.optim import (
    adam, apply_updates, clip_by_global_norm, lamb)


# -- optimizers -------------------------------------------------------------

def _quadratic_losses(opt, n_steps=400, lr=0.1):
    params = {"w": jnp.asarray([3.0, -2.0]), "b": jnp.asarray(5.0)}
    state = opt.init(params)

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2) + p["b"] ** 2

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params, lr=lr)
        return apply_updates(params, updates), state, loss

    losses = []
    for _ in range(n_steps):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    return losses


def test_adam_converges():
    losses = _quadratic_losses(adam())
    assert losses[-1] < losses[0] * 1e-2


def test_lamb_converges():
    losses = _quadratic_losses(lamb(), lr=0.05)
    assert losses[-1] < losses[0] * 1e-1


def test_clip_by_global_norm():
    grads = {"a": jnp.full((4,), 10.0)}
    clipped, norm = clip_by_global_norm(grads, 1.0)
    assert float(norm) == 20.0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(clipped["a"])), 1.0, rtol=1e-4)
    # NaN grads -> zero update (skip-step semantics)
    bad = {"a": jnp.asarray([jnp.nan, 1.0])}
    clipped, _ = clip_by_global_norm(bad, 1.0)
    assert np.all(np.asarray(clipped["a"]) == 0.0)


# -- checkpointing ------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"dense": {"kernel": np.ones((3, 2), np.float32)}},
            "step": np.int32(7)}
    path = str(tmp_path / "ckpt_1")
    save_checkpoint(path, tree, metadata={"speaker_ids": {"a": 0}})
    restored, meta = load_checkpoint(path)
    np.testing.assert_array_equal(
        restored["params"]["dense"]["kernel"], tree["params"]["dense"]["kernel"])
    assert meta["speaker_ids"] == {"a": 0}


def test_warm_start_shape_filter():
    params = {"enc": {"kernel": np.zeros((3, 2), np.float32)},
              "dec": {"kernel": np.zeros((4, 4), np.float32)}}
    restored = {"enc": {"kernel": np.ones((3, 2), np.float32)},
                "dec": {"kernel": np.ones((9, 9), np.float32)}}  # mismatch
    out, loaded, skipped = warm_start(params, restored)
    assert loaded == 1 and skipped == 1
    assert np.all(out["enc"]["kernel"] == 1.0)
    assert np.all(out["dec"]["kernel"] == 0.0)


def test_warm_start_ignore_layers():
    params = {"enc": {"kernel": np.zeros((2,), np.float32)}}
    restored = {"enc": {"kernel": np.ones((2,), np.float32)}}
    out, loaded, skipped = warm_start(params, restored,
                                      ignore_layers=("enc",))
    assert loaded == 0 and np.all(out["enc"]["kernel"] == 0.0)


def test_checkpointer_best_tracking(tmp_path):
    ck = Checkpointer(str(tmp_path), keep_last=2)
    tree = {"x": np.zeros(1)}
    for step in (10, 20, 30):
        ck.save_periodic(step, tree)
    names = sorted(os.listdir(str(tmp_path)))
    assert "checkpoint_10" not in names and "checkpoint_30" in names
    assert ck.maybe_save_best_val(1.0, tree)
    assert not ck.maybe_save_best_val(2.0, tree)
    assert ck.maybe_save_best_val(0.5, tree)
    assert ck.maybe_save_best_attsc(0.7, tree)
    assert not ck.maybe_save_best_attsc(0.6, tree)
    assert ck.latest().endswith("checkpoint_30")


def test_manual_save_trigger(tmp_path):
    ck = Checkpointer(str(tmp_path))
    assert not ck.manual_save_requested()
    open(os.path.join(str(tmp_path), "save"), "w").close()
    assert ck.manual_save_requested()
    assert not ck.manual_save_requested()   # consumed


# -- live config ---------------------------------------------------------------

def test_live_config_reload(tmp_path):
    p = str(tmp_path / "run_every_epoch.py")
    with open(p, "w") as f:
        f.write("A_ = 2e-3\ngrad_clip_thresh = 5.0\n")
    lc = LiveConfig(p)
    assert lc["A_"] == 2e-3 and lc["grad_clip_thresh"] == 5.0
    # edit + mtime bump -> reload
    with open(p, "w") as f:
        f.write("A_ = 7e-4\n")
    os.utime(p, (os.path.getmtime(p) + 5, os.path.getmtime(p) + 5))
    assert lc.poll()
    assert lc["A_"] == 7e-4
    # broken file keeps previous values
    with open(p, "w") as f:
        f.write("A_ = this is not python")
    os.utime(p, (os.path.getmtime(p) + 10, os.path.getmtime(p) + 10))
    lc.poll()
    assert lc["A_"] == 7e-4


def test_live_config_file_using_iteration_applies_at_init(tmp_path):
    """A reference-style run_every_epoch file that references the
    documented loop variables (iteration/epoch) must apply from its
    FIRST read: the init poll used to exec with an empty namespace,
    NameError, record the mtime, and never retry."""
    p = str(tmp_path / "run_every_epoch.py")
    with open(p, "w") as f:
        f.write("A_ = 1e-3 if iteration < 5000 else 2e-4\n")
    lc = LiveConfig(p)
    assert lc["A_"] == 1e-3
    # in-loop polls re-exec on change with the real iteration
    with open(p, "w") as f:
        f.write("A_ = 5e-4 if iteration < 5000 else 2e-4\n")
    os.utime(p, (os.path.getmtime(p) + 5, os.path.getmtime(p) + 5))
    assert lc.poll({"iteration": 9000})
    assert lc["A_"] == 2e-4


def test_live_config_iteration_schedule_stays_live(tmp_path):
    """A file whose expressions read ``iteration`` is re-exec'd on EVERY
    poll even with an unchanged mtime — the reference exec's
    run_every_epoch.py every 5 iterations precisely so schedules over the
    loop variables keep updating (train.py:646-661). A static file still
    short-circuits on mtime."""
    p = str(tmp_path / "run_every_epoch.py")
    with open(p, "w") as f:
        f.write("loss_scalars = {'diag_att_weight': "
                "0.05 if iteration < 100 else 0.0}\n")
    lc = LiveConfig(p)
    assert lc["loss_scalars"]["diag_att_weight"] == 0.05
    # same mtime, later iteration -> schedule advances
    assert lc.poll({"iteration": 200})
    assert lc["loss_scalars"]["diag_att_weight"] == 0.0
    # static file: unchanged mtime short-circuits
    with open(p, "w") as f:
        f.write("A_ = 3e-4\n")
    os.utime(p, (os.path.getmtime(p) + 5, os.path.getmtime(p) + 5))
    assert lc.poll({"iteration": 300})
    assert lc["A_"] == 3e-4
    assert not lc.poll({"iteration": 400})
    # a broken DYNAMIC file keeps the previous good values but STAYS
    # dynamic (round-5 review: a schedule raising transiently at one
    # iteration must not silently freeze for the rest of the run; the
    # error prints once per file version, not per poll)
    with open(p, "w") as f:
        f.write("A_ = iteration +\n")
    os.utime(p, (os.path.getmtime(p) + 10, os.path.getmtime(p) + 10))
    assert not lc.poll({"iteration": 500})
    assert lc["A_"] == 3e-4
    assert lc._dynamic
    assert not lc.poll({"iteration": 600})   # still broken, values kept
    assert lc["A_"] == 3e-4


def test_plateau_min_lr_floors_effective_lr():
    """min_lr floors the EFFECTIVE lr like torch (Trainer applies
    max(base*scale, min(min_lr, base))) — the old clamp floored the
    MULTIPLIER, allowing base_lr * 1e-6."""
    from cookietts_tpu.runtime.optim import ReduceLROnPlateau
    sched = ReduceLROnPlateau(factor=0.5, patience=0, min_lr=1e-6)
    for _ in range(40):                    # forever-plateaued metric
        sched.step(1.0)
    base_lr = 1e-4
    lr = max(base_lr * sched.scale, min(sched.min_lr, base_lr))
    assert lr == 1e-6                      # floored at min_lr, not 1e-10
    # and a base schedule already below the floor is never RAISED
    tiny_base = 1e-8
    lr2 = max(tiny_base * sched.scale, min(sched.min_lr, tiny_base))
    assert lr2 == tiny_base


def test_lr_schedule_shapes():
    cfg = {"A_": 1e-3, "B_": 1000.0, "C_": 0.0, "warmup_start": 0,
           "warmup_end": 100, "warmup_start_lr": 1e-4, "decay_start": 200}
    assert piecewise_warmup_decay_lr(0, cfg) == 1e-4
    assert abs(piecewise_warmup_decay_lr(100, cfg) - 1e-3) < 1e-9
    assert piecewise_warmup_decay_lr(150, cfg) == 1e-3
    assert piecewise_warmup_decay_lr(1200, cfg) < 1e-3


# -- file-loss DB ----------------------------------------------------------------

def test_file_loss_db_smoothing_and_filter(tmp_path):
    db = FileLossDB(smoothing=0.5)
    db.update(["a.wav", "b.wav"],
              {"att_score": np.asarray([0.9, 0.3]),
               "spec_MSE": np.asarray([0.1, 0.2])})
    db.update(["a.wav"], {"att_score": np.asarray([0.7])})
    assert abs(db.db["a.wav"]["att_score"] - 0.8) < 1e-6
    keep = db.filter_paths(min_att_score=0.5)
    assert keep == ["a.wav"]
    db.to_csv(str(tmp_path / "fl.csv"))
    assert os.path.getsize(str(tmp_path / "fl.csv")) > 0


def test_logger_histograms(tmp_path):
    """Param histograms (reference logger.py:57-58): summary stats land
    in the JSONL stream for every leaf of a nested params tree."""
    import json
    from cookietts_tpu.runtime.logging_util import MetricsLogger
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False)
    params = {"encoder": {"conv": {"kernel": np.arange(6.0)}},
              "gate": {"bias": np.asarray([1.0, -1.0])}}
    lg.log_histograms(7, params)
    lg.close()
    recs = [json.loads(ln) for ln in
            open(str(tmp_path / "events.jsonl"))]
    rec = [r for r in recs if r.get("prefix") == "params"][0]
    assert rec["step"] == 7
    lo, mean, hi, std = rec["encoder.conv.kernel"]
    assert (lo, hi) == (0.0, 5.0) and abs(mean - 2.5) < 1e-6
    assert rec["gate.bias"][1] == 0.0


# -- collate / TBPTT ----------------------------------------------------------------

def _items(lengths, n_mel=8):
    rng = np.random.default_rng(0)
    items = []
    for i, L in enumerate(lengths):
        items.append({
            "audiopath": f"f{i}.wav",
            "text": rng.integers(1, 30, (5 + i,)).astype(np.int32),
            "mel": rng.standard_normal((L, n_mel)).astype(np.float32),
            "speaker_id": i, "sylps": np.float32(4.0),
        })
    return items


def test_bucket_size():
    assert bucket_size(3, (32, 64)) == 32
    assert bucket_size(33, (32, 64)) == 64
    assert bucket_size(1000, (32, 64)) == 64


def test_collate_static_shapes_and_gate():
    cfg = DataConfig(text_buckets=(8, 16), mel_buckets=(16, 32))
    items = _items([10, 14])
    out = collate(items, cfg)
    assert out["text"].shape == (2, 8)
    assert out["mels"].shape == (2, 16, 8)
    # gate: 1.0 from last valid frame onward
    assert out["gate_target"][0, 9] == 1.0
    assert out["gate_target"][0, 8] == 0.0
    assert out["gate_target"][0, 15] == 1.0


def test_collate_tbptt_segments():
    cfg = DataConfig(text_buckets=(8,), mel_buckets=(8,),
                     max_segment_frames=8)
    items = _items([20, 20])
    segs = [Segment(0, 0, 3), Segment(1, 2, 3)]
    out = collate(items, cfg, segments=segs)
    # first item: segment 0 of 3 -> continuation follows, no gate
    assert out["pres_prev_state"][0] == 0.0
    assert out["cont_next_iter"][0] == 1.0
    assert np.all(out["gate_target"][0] == 0.0)
    # second item: final segment (frames 16:20 -> len 4), gate fires
    assert out["pres_prev_state"][1] == 1.0
    assert out["cont_next_iter"][1] == 0.0
    assert out["mel_lengths"][1] == 4
    assert out["gate_target"][1, 3] == 1.0


def test_tbptt_sampler_continuity():
    lengths = [25, 8, 17, 9, 30]
    sampler = TBPTTSampler(lengths, batch_size=2, max_segment_frames=10,
                           shuffle=False)
    batches = list(iter(sampler))
    # every lane must run segments of one file consecutively, in order
    lane_hist = [[], []]
    for batch in batches:
        for lane, seg in enumerate(batch):
            lane_hist[lane].append(seg)
    for hist in lane_hist:
        for prev, cur in zip(hist, hist[1:]):
            if cur.file_idx == prev.file_idx:
                assert cur.seg_idx == prev.seg_idx + 1
            else:
                assert prev.seg_idx == prev.n_segs - 1
                assert cur.seg_idx == 0
    # all segments of file 0 (3 segs of 25/10) appear exactly once
    seen = [(s.file_idx, s.seg_idx) for b in batches for s in b]
    assert len(seen) == len(set(seen))


# -- mesh ----------------------------------------------------------------------

def test_mesh_and_shard_batch():
    mesh = make_mesh(dp=-1, tp=1)
    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    sharded = shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


# -- prefetch ------------------------------------------------------------------

def test_prefetcher_order_and_exceptions():
    import time

    from cookietts_tpu.data.prefetch import Prefetcher

    def slow_double(x):
        time.sleep(0.02 if x % 3 == 0 else 0.0)   # jitter completion order
        return x * 2

    out = list(Prefetcher(slow_double, range(10), depth=3, workers=3))
    assert out == [x * 2 for x in range(10)]

    def boom(x):
        if x == 3:
            raise ValueError("bad item")
        return x

    loader = iter(Prefetcher(boom, range(6), depth=2, workers=2))
    got = [next(loader), next(loader), next(loader)]
    assert got == [0, 1, 2]
    try:
        next(loader)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_prefetcher_early_break_stops_workers():
    import threading

    from cookietts_tpu.data.prefetch import Prefetcher

    before = threading.active_count()
    for batch in Prefetcher(lambda x: x, range(100), depth=2, workers=2):
        if batch == 5:
            break
    # workers wind down after the consumer abandons the loop
    import time
    time.sleep(0.1)
    assert threading.active_count() <= before + 2


def test_checkpointer_async_save(tmp_path):
    """async_save overlaps serialization/IO with training on a background
    thread: latest()/wait() always observe landed, loadable files, and
    best-model tracking works identically."""
    import numpy as np

    from cookietts_tpu.runtime.checkpoint import Checkpointer, load_checkpoint

    ck = Checkpointer(str(tmp_path), keep_last=2, async_save=True)
    tree = {"params": {"w": np.arange(6, dtype=np.float32)}, "step": 0}
    for step in (1, 2, 3):
        tree = {"params": {"w": np.arange(6, dtype=np.float32) * step},
                "step": step}
        ck.save_periodic(step, tree, {"step": step})
    assert ck.maybe_save_best_val(0.5, tree, {"best": True})
    assert not ck.maybe_save_best_val(0.9, tree)
    latest = ck.latest()                      # waits for in-flight saves
    assert latest.endswith("checkpoint_3")
    got, meta = load_checkpoint(latest)
    np.testing.assert_array_equal(got["params"]["w"],
                                  np.arange(6, dtype=np.float32) * 3)
    assert meta["step"] == 3
    ck.wait()
    # gc kept only the last 2 periodic checkpoints; best model present
    import os
    names = sorted(os.listdir(str(tmp_path)))
    assert "checkpoint_1" not in names
    assert {"checkpoint_2", "checkpoint_3", "best_val_model"} <= set(names)
    # the snapshot is COPIED synchronously at submit time: mutating the
    # SAME tree right after save_periodic returns (while the background
    # thread may still be serializing it) must not leak into the file
    w = np.ones(3, np.float32)
    live = {"params": {"w": w}, "step": 4}
    ck.save_periodic(4, live, None)
    w *= 0.0                                # in-place, post-submit
    ck.wait()
    got, _ = load_checkpoint(str(tmp_path / "checkpoint_4"))
    np.testing.assert_array_equal(got["params"]["w"],
                                  np.ones(3, np.float32))


def test_checkpointer_async_failed_save_does_not_poison(tmp_path,
                                                        monkeypatch):
    """One failed background write raises ONCE at the next wait and the
    Checkpointer keeps working afterwards (regression: a stale pending
    future re-raised forever and dropped every later save)."""
    import numpy as np
    import pytest as _pytest

    from cookietts_tpu.runtime import checkpoint as ckpt_mod
    from cookietts_tpu.runtime.checkpoint import Checkpointer, load_checkpoint

    ck = Checkpointer(str(tmp_path), async_save=True)
    real_save = ckpt_mod.save_checkpoint
    calls = {"n": 0}

    def flaky(path, tree, metadata=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("disk full")
        return real_save(path, tree, metadata)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", flaky)
    tree = {"params": {"w": np.ones(3, np.float32)}, "step": 1}
    ck.save_periodic(1, tree, None)
    with _pytest.raises(OSError):
        ck.wait()
    ck.wait()                      # cleared: no re-raise
    ck.save_periodic(2, tree, None)
    ck.wait()
    got, _ = load_checkpoint(str(tmp_path / "checkpoint_2"))
    np.testing.assert_array_equal(got["params"]["w"], tree["params"]["w"])


def test_denoiser_resume_fills_missing_generator_heads(tmp_path):
    """--resume of an OLD-layout stage-0 denoiser checkpoint (generator
    saved as {wn, wn_end} before every head was materialized) into a
    stage>=1 state: the wn subtree restores, the absent heads start at
    their fresh init with ZEROED Adam moments, and an arbitrary missing
    subtree still fails loudly (the fillable head set is pinned)."""
    import pytest

    from cookietts_tpu.models.hifigan_denoiser import (
        DenoiserWN, HiFiGANDenoiserConfig)
    from cookietts_tpu.runtime.checkpoint import restore_any
    from cookietts_tpu.runtime.train_state import GANTrainState, TrainState

    cfg = HiFiGANDenoiserConfig(
        wn_layers=2, wn_channels=8, postnet_layers=2, postnet_channels=8,
        postnet_kernel_size=4, stage=1)
    gen = DenoiserWN(cfg)
    audio = jnp.zeros((1, 256), jnp.float32)
    params = jax.device_get(
        jax.jit(gen.init)(jax.random.PRNGKey(0), audio))["params"]
    assert set(params) == {"wn", "wn_end", "postnet", "postnet_end"}

    def fresh_states():
        return (TrainState.create(None, params, adam()),
                TrainState.create(None, {"dw": jnp.ones((2,))}, adam()))

    # old stage-0 layout: only {wn, wn_end}; wn values shifted +1 so the
    # restore is observable; pre-adversarial checkpoints carry no critics
    old_g = {"wn": jax.tree_util.tree_map(
        lambda a: np.asarray(a) + 1.0, params["wn"]),
        "wn_end": jax.tree_util.tree_map(np.asarray, params["wn_end"])}
    mom = lambda t, fill: jax.tree_util.tree_map(  # noqa: E731
        lambda a: np.full_like(a, fill), t)
    path = str(tmp_path / "checkpoint_3")
    save_checkpoint(path, {
        "step": 3, "params": old_g,
        "opt_state": {"step": 3, "mu": mom(old_g, 2.0),
                      "nu": mom(old_g, 4.0)},
        "d_params": [], "d_opt_state": {},
    }, metadata={"model": "hifigan_denoiser"})

    g_state, d_state = fresh_states()
    state, _ = restore_any(GANTrainState(g=g_state, d=d_state), path)
    got = jax.tree_util.tree_map(np.asarray, state.g.params)
    # wn restored from the checkpoint (shifted values)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(got["wn"])[0],
        np.asarray(jax.tree_util.tree_leaves(params["wn"])[0]) + 1.0)
    # absent heads = the fresh init, with zeroed Adam moments
    for head in ("postnet", "postnet_end"):
        np.testing.assert_array_equal(
            jax.tree_util.tree_leaves(got[head])[0],
            np.asarray(jax.tree_util.tree_leaves(params[head])[0]))
        mu = jax.tree_util.tree_map(np.asarray, state.g.opt_state.mu)
        assert float(np.abs(
            jax.tree_util.tree_leaves(mu[head])[0]).max()) == 0.0
    # restored moments for present subtrees kept
    mu_wn = jax.tree_util.tree_map(np.asarray, state.g.opt_state.mu)["wn"]
    assert float(jax.tree_util.tree_leaves(mu_wn)[0].min()) == 2.0
    assert int(state.g.step) == 3

    # a missing NON-head subtree (corrupt checkpoint) still fails loudly
    bad_g = {k: v for k, v in old_g.items() if k != "wn"}
    bad = str(tmp_path / "checkpoint_bad")
    save_checkpoint(bad, {
        "step": 3, "params": bad_g,
        "opt_state": {"step": 3, "mu": mom(bad_g, 0.0),
                      "nu": mom(bad_g, 0.0)},
        "d_params": [], "d_opt_state": {},
    }, metadata={"model": "hifigan_denoiser"})
    g_state, d_state = fresh_states()
    with pytest.raises(KeyError):
        restore_any(GANTrainState(g=g_state, d=d_state), bad)


def test_gan_resume_migrates_weightnorm_msd(tmp_path):
    """--resume of a pre-spectral-norm HiFi-GAN run: the checkpoint's
    scale-0 MSD convs are in flax WeightNorm layout (sibling Conv_j +
    wrapper 'Conv_j/kernel/scale'); restore folds w = v*g/||v|| into the
    SNConv kernel, zeroes the re-parametrized kernel Adam moments, and
    keeps bias moments (MIGRATION.md in-framework compatibility gap)."""
    from cookietts_tpu.models.hifigan import (HiFiGANConfig,
                                              MultiScaleDiscriminator)
    from cookietts_tpu.runtime.checkpoint import (restore_any,
                                                  save_checkpoint)
    from cookietts_tpu.runtime.train_state import GANTrainState, TrainState

    hcfg = HiFiGANConfig(n_mel_channels=8, msd_scales=2)
    msd = MultiScaleDiscriminator(hcfg)
    audio = jnp.zeros((1, 256), jnp.float32)
    msd_params = jax.jit(msd.init)(
        jax.random.PRNGKey(0), audio, audio)["params"]

    # build the OLD-layout checkpoint subtree for scale0 (new layout is
    # plain SNConv kernel/bias); arbitrary non-norm scales so the fold
    # actually changes values
    rng = np.random.default_rng(0)
    new0 = jax.tree_util.tree_map(np.asarray, msd_params["scale0"])
    old0, want0, mu_old0 = {}, {}, {}
    for j, (name, leafs) in enumerate(sorted(new0.items())):
        v = rng.standard_normal(leafs["kernel"].shape).astype(np.float32)
        g_scale = np.full(leafs["kernel"].shape[-1:], 0.7, np.float32)
        old0[f"Conv_{j}"] = {"kernel": v, "bias": leafs["bias"]}
        old0[name] = {f"Conv_{j}/kernel/scale": g_scale}
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        want0[name] = v * g_scale / norm
        mu_old0[f"Conv_{j}"] = {"kernel": np.ones_like(v),
                                "bias": np.full_like(leafs["bias"], 3.0)}
        mu_old0[name] = {f"Conv_{j}/kernel/scale": np.ones_like(g_scale)}
    old_msd = dict(jax.tree_util.tree_map(np.asarray, msd_params))
    old_msd["scale0"] = old0
    mu_msd = jax.tree_util.tree_map(np.zeros_like, old_msd)
    mu_msd["scale0"] = mu_old0

    g_state = TrainState.create(None, {"w": jnp.ones((2,))}, adam())
    d_state = TrainState.create(None, (msd_params,), adam())
    path = str(tmp_path / "checkpoint_5")
    save_checkpoint(path, {
        "step": 5, "params": {"w": np.full((2,), 2.0, np.float32)},
        "opt_state": {"step": 5, "mu": {"w": np.zeros(2, np.float32)},
                      "nu": {"w": np.zeros(2, np.float32)}},
        "d_params": [old_msd],
        "d_opt_state": {"step": 5, "mu": [mu_msd],
                        "nu": [jax.tree_util.tree_map(np.ones_like,
                                                      mu_msd)]},
    })

    state, _ = restore_any(GANTrainState(g=g_state, d=d_state), path)
    got = jax.tree_util.tree_map(np.asarray, state.d.params[0]["scale0"])
    for name, want in want0.items():
        np.testing.assert_allclose(got[name]["kernel"], want, rtol=1e-6)
    mu = jax.tree_util.tree_map(np.asarray,
                                state.d.opt_state.mu[0]["scale0"])
    for name in want0:
        assert float(np.abs(mu[name]["kernel"]).max()) == 0.0
        assert float(mu[name]["bias"].min()) == 3.0   # bias moments kept
    # non-migrated scales restore verbatim
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.d.params[0]["scale1"])[0]),
        np.asarray(jax.tree_util.tree_leaves(old_msd["scale1"])[0]))


# -- live config (round-5 review regressions) ----------------------------------

def test_live_config_guided_att_sigma_is_honored(tmp_path):
    """The overlay must carry guided_att_sigma (it silently dropped keys
    absent from DEFAULT_LIVE_CONFIG — the evidence recipe believed it was
    scheduling sigma while training ran the default)."""
    from cookietts_tpu.runtime.live_config import LiveConfig

    p = tmp_path / "live.py"
    p.write_text("guided_att_sigma = 0.3\ndrop_frame_rate = 0.1\n")
    live = LiveConfig(str(p))
    assert live.get("guided_att_sigma") == 0.3
    assert live.get("drop_frame_rate") == 0.1


def test_live_config_transient_error_keeps_dynamic_schedule(tmp_path):
    """A schedule over `iteration` that raises at ONE iteration must keep
    re-exec'ing afterwards (a transient error used to permanently freeze
    the schedule by clearing the dynamic flag)."""
    from cookietts_tpu.runtime.live_config import LiveConfig

    p = tmp_path / "live.py"
    p.write_text("A_ = 1.0 / (2 - iteration)\n")
    live = LiveConfig(str(p))          # iteration=0 -> A_=0.5
    assert live.get("A_") == 0.5
    assert not live.poll({"iteration": 2})   # raises ZeroDivisionError
    assert live.get("A_") == 0.5             # previous good value kept
    assert live.poll({"iteration": 4})       # MUST still be re-exec'd
    assert live.get("A_") == 1.0 / (2 - 4)
