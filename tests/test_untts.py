"""UnTTS NAR flow TTS tests: length regulator, flow invertibility,
training loss, parallel inference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.models.untts import (
    UnTTS, UnTTSConfig, length_regulate, untts_loss)


def tiny_cfg(**kw):
    base = dict(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=12,
        enc_layers=1, enc_heads=2, enc_ffn_dim=24,
        predictor_filter_size=8, predictor_layers=1,
        dec_n_flows=2, dec_n_layers=1, dec_n_channels=16,
    )
    base.update(kw)
    return UnTTSConfig(**base)


def test_length_regulate():
    feats = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    dur = jnp.asarray([[2, 1, 3]], jnp.int32)
    frames, mask = length_regulate(feats, dur, t_out=8)
    expect = np.array([[0, 1], [0, 1], [2, 3], [4, 5], [4, 5], [4, 5],
                       [0, 0], [0, 0]], np.float32)
    np.testing.assert_allclose(np.asarray(frames)[0], expect)
    assert np.asarray(mask)[0].tolist() == [True] * 6 + [False] * 2


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = UnTTS(cfg)
    rng = np.random.default_rng(0)
    B, N, T = 2, 7, 20
    durations = rng.integers(1, 4, (B, N)).astype(np.int32)
    batch = dict(
        text=jnp.asarray(rng.integers(1, cfg.n_symbols, (B, N)), jnp.int32),
        text_lengths=jnp.asarray([N, N - 2], jnp.int32),
        mels=jnp.asarray(rng.standard_normal((B, T, cfg.n_mel_channels)),
                         jnp.float32),
        mel_lengths=jnp.asarray(
            np.minimum(durations.sum(1), T), jnp.int32),
        speaker_id=jnp.asarray([0, 1], jnp.int32),
        durations=jnp.asarray(durations),
        f0=jnp.asarray(rng.standard_normal((B, N)), jnp.float32),
        energy=jnp.asarray(rng.standard_normal((B, N)), jnp.float32),
    )
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False)
    return cfg, model, variables, batch


def test_forward_and_loss(setup):
    cfg, model, variables, batch = setup

    @jax.jit
    def run(v):
        out = model.apply(v, **batch, deterministic=True)
        gt = {"durations": batch["durations"], "f0": batch["f0"],
              "energy": batch["energy"]}
        total, loss_dict = untts_loss(out, gt)
        return out, total, loss_dict

    out, total, loss_dict = run(variables)
    assert out["z"].shape == batch["mels"].shape
    assert np.isfinite(float(total))
    for k in ("flow_nll", "dur_MSE", "f0_MSE", "energy_MSE"):
        assert np.isfinite(float(loss_dict[k])), k


def test_decoder_invertibility(setup):
    cfg, model, variables, batch = setup

    @jax.jit
    def roundtrip(v):
        out = model.apply(v, **batch, deterministic=True)
        # rebuild cond exactly as the training path does
        enc, _ = model.apply(v, batch["text"], batch["text_lengths"],
                             batch["speaker_id"], True,
                             method=UnTTS._encode)
        T = batch["mels"].shape[1]
        from cookietts_tpu.models.untts import length_regulate
        frames, _ = length_regulate(enc, batch["durations"], T)
        cond = model.apply(v, frames,
                           method=lambda m, f: m.cond_proj(f))
        from cookietts_tpu.models.untts import MelFlowDecoder
        rec = model.apply(v, out["z"], cond,
                          method=lambda m, z, c: m.decoder.inverse(z, c))
        return out, rec

    out, rec = roundtrip(variables)
    mask = np.asarray(out["frame_mask"])[:, :, None]
    err = np.abs(np.asarray(rec) - np.asarray(batch["mels"])) * mask
    assert err.max() < 2e-3, err.max()


def test_parallel_inference(setup):
    cfg, model, variables, batch = setup

    infer = jax.jit(lambda v, key: model.apply(
        v, batch["text"], batch["text_lengths"], batch["speaker_id"],
        key=key, max_frames=64, method=UnTTS.inference))
    out = infer(variables, jax.random.PRNGKey(5))
    assert out["mel_outputs"].shape == (2, 64, cfg.n_mel_channels)
    assert np.all(np.isfinite(np.asarray(out["mel_outputs"])))
    lens = np.asarray(out["mel_lengths"])
    assert np.all(lens >= 0) and np.all(lens <= 64)


def test_duration_scale_changes_length(setup):
    cfg, model, variables, batch = setup

    def run(scale):
        out = model.apply(
            variables, batch["text"], batch["text_lengths"],
            batch["speaker_id"], key=jax.random.PRNGKey(1), max_frames=64,
            duration_scale=scale, method=UnTTS.inference)
        return np.asarray(out["mel_lengths"])
    # use apply unjitted once each (compile cache shared via jit omitted)
    short = run(0.5)
    long = run(2.0)
    assert np.all(long >= short)


def test_varglow_roundtrip_and_sampling():
    from cookietts_tpu.models.untts import VarGlow, varglow_loss
    model = VarGlow(n_channels_in=2, n_group=4, n_flows=2, wn_layers=1,
                    wn_channels=8)
    rng = np.random.default_rng(0)
    B, N, D = 2, 16, 10
    values = jnp.asarray(rng.standard_normal((B, N, 2)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, values, feats, method=VarGlow.forward))(
        jax.random.PRNGKey(0))

    @jax.jit
    def roundtrip(v):
        z, ls, lw, n = model.apply(v, values, feats,
                                   method=VarGlow.forward)
        rec = model.apply(v, z, feats, method=VarGlow.inverse)
        return z, ls, lw, n, rec

    z, ls, lw, n, rec = roundtrip(variables)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(values),
                               atol=2e-3, rtol=1e-3)
    nll = varglow_loss(z, ls, lw, n)
    assert np.isfinite(float(nll))

    sample = jax.jit(lambda v, k: model.apply(
        v, feats, k, method=VarGlow.sample))(
        variables, jax.random.PRNGKey(5))
    assert sample.shape == (B, N, 2)
    assert np.all(np.isfinite(np.asarray(sample)))


def test_untts_with_varglow_prosody():
    cfg = tiny_cfg(use_varglow=True, varglow_n_group=4, varglow_n_flows=2,
                   predict_energy=False)
    model = UnTTS(cfg)
    rng = np.random.default_rng(3)
    B, N, T = 2, 8, 20
    durations = rng.integers(1, 4, (B, N)).astype(np.int32)
    batch = dict(
        text=jnp.asarray(rng.integers(1, cfg.n_symbols, (B, N)), jnp.int32),
        text_lengths=jnp.asarray([N, N - 2], jnp.int32),
        mels=jnp.asarray(rng.standard_normal((B, T, cfg.n_mel_channels)),
                         jnp.float32),
        mel_lengths=jnp.asarray(np.minimum(durations.sum(1), T), jnp.int32),
        speaker_id=jnp.asarray([0, 1], jnp.int32),
        durations=jnp.asarray(durations),
        f0=jnp.asarray(rng.standard_normal((B, N)), jnp.float32),
    )
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False)
    out = jax.jit(
        lambda v: model.apply(v, **batch, deterministic=True))(variables)
    assert "varglow_z" in out
    from cookietts_tpu.models.untts import varglow_loss
    nll = varglow_loss(out["varglow_z"], out["varglow_log_s"],
                       out["varglow_logdet_w"], out["varglow_n"])
    assert np.isfinite(float(nll))

    # sampled-prosody inference produces finite mels and varying lengths
    infer = jax.jit(
        lambda v, key: model.apply(
            v, batch["text"], batch["text_lengths"], batch["speaker_id"],
            key=key, max_frames=64, sample_prosody=True,
            method=UnTTS.inference),
        static_argnames=())
    o1 = infer(variables, jax.random.PRNGKey(1))
    o2 = infer(variables, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(o1["mel_outputs"])))
    # different keys -> (almost surely) different sampled durations
    assert not np.array_equal(np.asarray(o1["durations"]),
                              np.asarray(o2["durations"]))


def test_varglow_tail_chars_not_truncated():
    """N % n_group chars used to be silently DROPPED: untrained in the
    NLL and forced to 1 frame at sampled inference. The flow now pads
    the tail group (edge values, group-masked NLL) and sample() covers
    every char."""
    from cookietts_tpu.models.untts import VarGlow
    model = VarGlow(n_channels_in=1, n_group=4, n_flows=2, wn_layers=1,
                    wn_channels=8)
    rng = np.random.default_rng(0)
    B, N, D = 2, 6, 10                       # N % g == 2
    values = jnp.asarray(rng.standard_normal((B, N, 1)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], bool)
    variables = model.init(jax.random.PRNGKey(0), values, feats, mask,
                           method=VarGlow.forward)
    z, ls, lw, n = model.apply(variables, values, feats, mask,
                               method=VarGlow.forward)
    assert z.shape[1] == 2                   # ceil(6/4) groups
    assert np.isfinite(float(ls)) and float(n) > 0
    # roundtrip still exact on the REAL chars
    rec = model.apply(variables, z, feats, method=VarGlow.inverse)
    assert rec.shape[1] >= N
    # row 0: all 6 chars valid -> all reconstruct; z row 1's second
    # group was zero-masked so only its first group reconstructs
    np.testing.assert_allclose(np.asarray(rec)[0, :N, 0],
                               np.asarray(values)[0, :, 0],
                               atol=2e-3, rtol=1e-3)
    sample = model.apply(variables, feats, jax.random.PRNGKey(5),
                         method=VarGlow.sample)
    assert sample.shape[1] >= N              # every char gets a value
    assert np.all(np.isfinite(np.asarray(sample)))
    # NLL no longer depends on the amount of PADDING: same valid chars,
    # more pad columns -> identical masked sums
    pad = 6
    values_p = jnp.pad(values, ((0, 0), (0, pad), (0, 0)))
    feats_p = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    mask_p = jnp.pad(mask, ((0, 0), (0, pad)))
    _, ls2, lw2, n2 = model.apply(variables, values_p, feats_p, mask_p,
                                  method=VarGlow.forward)
    np.testing.assert_allclose(float(ls2), float(ls), rtol=1e-5)
    assert float(n2) == float(n)


def test_untts_prosody_conditions_decoder(setup):
    """Frame-level f0/energy now condition the mel flow (reference
    model.py:437,538): changing frame_f0 changes z; inference with
    predicted prosody stays finite and differs from zeroed prosody."""
    cfg, model, variables, batch = setup
    # the WN end layer is ZERO-INIT (identity flow), so at init cond has
    # no effect on z by construction — randomize it so sensitivity shows
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    for k in range(cfg.dec_n_flows):
        end = params["decoder"][f"wn{k}"]["end"]
        end["kernel"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(7 + k), end["kernel"].shape)
    variables = {"params": params}
    run = jax.jit(lambda v, **kw: model.apply(v, **kw,
                                              deterministic=True))
    B, T = batch["mels"].shape[:2]
    f0a = jnp.zeros((B, T), jnp.float32)
    f0b = jnp.ones((B, T), jnp.float32) * 2.0
    out_a = run(variables, **batch, frame_f0=f0a)
    out_b = run(variables, **batch, frame_f0=f0b)
    assert not np.allclose(np.asarray(out_a["z"]), np.asarray(out_b["z"]))
    # inference with predictor-driven prosody runs and differs from the
    # same decode without prosody heads... (covered via finiteness here;
    # the wiring is proven by the training-side sensitivity above)
    o = jax.jit(lambda v, k: model.apply(
        v, batch["text"], batch["text_lengths"], batch["speaker_id"],
        key=k, max_frames=32, method=UnTTS.inference))(
        variables, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(o["mel_outputs"])))


# -- MFA-duration data path + runtime train step -------------------------------

def test_duration_helpers():
    from cookietts_tpu.data.dataset import (char_average, fit_durations,
                                            uniform_durations)
    d = fit_durations(np.array([3, 5, 2]), 4, 8)
    assert d.sum() == 8 and len(d) == 4
    d2 = fit_durations(np.array([1, 1]), 5, 12)   # too short: pad + absorb
    assert d2.sum() == 12 and len(d2) == 5
    u = uniform_durations(3, 10)
    assert u.sum() == 10 and len(u) == 3
    vals = np.arange(10, dtype=np.float32)
    ca = char_average(vals, np.array([2, 3, 5]))
    np.testing.assert_allclose(ca, [0.5, 3.0, 7.0])


def test_dataset_durations_from_textgrid(tmp_path):
    from cookietts_tpu.data.dataset import DataConfig, TTSDataset
    cfg = DataConfig(sampling_rate=16000, hop_length=160)
    ds = TTSDataset([{"path": "x.wav", "quote": "hi"}], cfg,
                    features=("text", "mel", "durations"))
    wav = str(tmp_path / "a.wav")
    tg = str(tmp_path / "a.TextGrid")
    with open(tg, "w") as f:
        f.write('item [1]:\n  class = "IntervalTier"\n  name = "phones"\n'
                '  intervals [1]:\n    xmin = 0.0\n    xmax = 0.1\n'
                '    text = "HH"\n'
                '  intervals [2]:\n    xmin = 0.1\n    xmax = 0.3\n'
                '    text = "AY"\n')
    # 0.1s @ 10ms hop = 10 frames, 0.2s = 20 frames
    dur = ds._get_durations(wav, t_mel=30, n_text=2)
    np.testing.assert_array_equal(dur, [10, 20])
    # sidecar .dur.npy takes precedence
    np.save(wav + ".dur.npy", np.array([5, 25]))
    np.testing.assert_array_equal(ds._get_durations(wav, 30, 2), [5, 25])
    # uniform fallback when no alignment exists
    u = ds._get_durations(str(tmp_path / "none.wav"), 9, 3)
    np.testing.assert_array_equal(u, [3, 3, 3])


def test_untts_train_step_decreases_loss(setup):
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.train_state import TrainState
    from cookietts_tpu.runtime.trainer import (make_untts_train_step,
                                               scalars_to_arrays)
    cfg, model, variables, batch = setup
    state = TrainState.create(model.apply, variables["params"], adam())
    step = make_untts_train_step(model, donate=False)
    ctrl = scalars_to_arrays({"lr": 5e-3, "grad_clip": 10.0})
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), ctrl)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_flowtts_positional_attention_variant():
    """Flow-TTS mode (reference flowtts/model.py:113): soft positional
    attention replaces the hard duration expansion; durations only set
    the total inference length. Train step reaches a finite loss and
    inference produces mels of the predicted length."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cookietts_tpu.models.untts import UnTTS, UnTTSConfig, untts_loss

    cfg = UnTTSConfig(
        n_symbols=30, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=10, enc_layers=1,
        enc_heads=2, enc_ffn_dim=32, predictor_filter_size=16,
        predictor_layers=1, predict_f0=False, predict_energy=False,
        dec_n_flows=2, dec_n_layers=1, dec_n_channels=16,
        use_positional_attention=True, pos_attention_heads=2)
    model = UnTTS(cfg)
    rng = np.random.default_rng(0)
    B, N, T = 2, 7, 20
    batch = dict(
        text=jnp.asarray(rng.integers(1, 30, (B, N)), jnp.int32),
        text_lengths=jnp.asarray([N, N - 2], jnp.int32),
        mels=jnp.asarray(rng.standard_normal((B, T, 10)), jnp.float32),
        mel_lengths=jnp.asarray([T, T - 6], jnp.int32),
        speaker_id=jnp.zeros((B,), jnp.int32),
        durations=jnp.asarray(rng.integers(1, 4, (B, N)), jnp.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, deterministic=False)
    out = model.apply(variables, **batch, deterministic=True)
    total, loss_dict = untts_loss(out, {"durations": batch["durations"]})
    assert np.isfinite(float(total)), loss_dict

    inf = model.apply(variables, batch["text"], batch["text_lengths"],
                      batch["speaker_id"], key=jax.random.PRNGKey(2),
                      max_frames=32, method=UnTTS.inference)
    assert inf["mel_outputs"].shape == (B, 32, 10)
    lens = np.asarray(inf["mel_lengths"])
    assert np.all(lens >= 1) and np.all(lens <= 32)
    # frames past the predicted length are zero (masked cond/mel)
    mel = np.asarray(inf["mel_outputs"])
    for b in range(B):
        assert np.allclose(mel[b, lens[b]:], 0.0, atol=1e-5)


def test_encoder_is_position_sensitive():
    """Positional embeddings make the FFT encoder order-aware: swapping
    two tokens must change the encoding at OTHER positions too
    (reference FFTransformer pos_emb, transformer.py:298,318-321)."""
    import jax

    from cookietts_tpu.models.untts import UnTTS, UnTTSConfig
    from cookietts_tpu.text import N_SYMBOLS

    cfg = UnTTSConfig(
        n_symbols=N_SYMBOLS, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=8, enc_layers=1,
        enc_heads=2, enc_ffn_dim=24, predictor_filter_size=8,
        predictor_layers=1, predict_f0=False, predict_energy=False,
        dec_n_flows=2, dec_n_layers=1, dec_n_channels=16)
    model = UnTTS(cfg)
    text = jnp.asarray([[5, 9, 13, 17, 21, 25]], jnp.int32)
    swapped = jnp.asarray([[5, 13, 9, 17, 21, 25]], jnp.int32)
    lengths = jnp.asarray([6], jnp.int32)
    spk = jnp.asarray([0], jnp.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        text=text, text_lengths=lengths,
        mels=jnp.zeros((1, 16, 8)), mel_lengths=jnp.asarray([16]),
        speaker_id=spk, durations=jnp.full((1, 6), 2, jnp.int32),
        deterministic=True)

    def enc(t):
        return model.apply(variables, t, lengths, spk,
                           deterministic=True, method=UnTTS._encode)[0]

    a, b = np.asarray(enc(text)), np.asarray(enc(swapped))
    # position 0 sees different *relative* context despite identical
    # token -> its encoding must differ (order-blind encoders would
    # produce the same value there up to attention-sum invariance)
    assert not np.allclose(a[0, 0], b[0, 0], atol=1e-6)
