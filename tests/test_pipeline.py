"""Pipeline tests: text segmentation, speaker matching, T2S end-to-end
(tiny model, no vocoder), GTA durations, server handler."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.pipeline.gta import (
    durations_from_alignment, extreme_gta_offsets)
from cookietts_tpu.pipeline.text2speech import (
    T2S, T2SConfig, fuzzy_match_speaker, interleave_speakers,
    parse_text_into_segments)


def test_parse_segments_sentences():
    segs = parse_text_into_segments(
        "Hello world. This is a test! Short.", target_segment_length=20)
    assert segs == ["Hello world.", "This is a test!", "Short."]


def test_parse_segments_quotes_kept_together():
    segs = parse_text_into_segments(
        'She said "Come here. Now." and left.', target_segment_length=200)
    assert any(s.startswith('"') and s.endswith('"') for s in segs)


def test_parse_segments_long_packing():
    text = " ".join(["word"] * 300) + "."
    segs = parse_text_into_segments(text, target_segment_length=100,
                                    max_segment_length=120)
    assert all(len(s) <= 120 for s in segs)
    assert sum(len(s.split()) for s in segs) == 300


def test_parse_segments_empty():
    assert parse_text_into_segments("") == []


def test_parse_segments_smart_quotes():
    """Word processors auto-curl quotes; dialogue in “...” must split
    out like ASCII quotes so speaker_mode='quotes' voices it."""
    segs = parse_text_into_segments(
        'She said “Come here. Now.” and left.',
        target_segment_length=200)
    assert any(s.startswith('"') for s in segs)
    from cookietts_tpu.pipeline.text2speech import interleave_speakers
    voices = interleave_speakers(segs, ["Narrator", "Alice"],
                                 mode="quotes")
    assert "Alice" in voices and "Narrator" in voices


def test_fuzzy_match():
    known = ["Twilight Sparkle", "Rainbow Dash", "Nancy"]
    assert fuzzy_match_speaker("twilight", known) == "Twilight Sparkle"
    assert fuzzy_match_speaker("rainbow dsh", known) == "Rainbow Dash"


def test_interleave_modes():
    assert interleave_speakers(4, ["a", "b"], "cycle next") == \
        ["a", "b", "a", "b"]
    r = interleave_speakers(10, ["a", "b"], "random",
                            np.random.default_rng(0))
    assert set(r) <= {"a", "b"}


def test_gta_durations():
    B, T_dec, T_enc = 1, 6, 3
    a = np.zeros((B, T_dec, T_enc))
    a[0, :, 0] = 1.0
    a[0, 3:, 1] = 2.0   # frames 3.. attend char 1
    durs = durations_from_alignment(
        a, np.asarray([3]), np.asarray([6]))
    np.testing.assert_array_equal(durs[0], [3, 3, 0])


def test_extreme_gta_offsets():
    assert extreme_gta_offsets(512, 128) == [0, 128, 256, 384]
    with pytest.raises(AssertionError):
        extreme_gta_offsets(512, 100)


@pytest.fixture(scope="module")
def tiny_t2s():
    from tests.test_tacotron2 import tiny_cfg
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.text import N_SYMBOLS
    cfg = tiny_cfg(max_decoder_steps=64, n_symbols=N_SYMBOLS)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    B, T_txt, T_mel = 2, 12, 16
    batch = dict(
        text=jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T_txt)),
                         jnp.int32),
        text_lengths=jnp.asarray([T_txt, T_txt - 2], jnp.int32),
        mels=jnp.asarray(rng.standard_normal(
            (B, T_mel, cfg.n_mel_channels)), jnp.float32),
        mel_lengths=jnp.asarray([T_mel, T_mel - 3], jnp.int32),
        speaker_id=jnp.asarray([0, 1], jnp.int32),
        sylps=jnp.full((B,), 4.0),
        torchmoji_hidden=jnp.asarray(
            rng.standard_normal((B, cfg.torchmoji_dim)), jnp.float32))
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)
    t2s_cfg = T2SConfig(batch_size=4, max_attempts=2, step_buckets=(48,),
                        max_decoder_steps=48, target_score=0.99,
                        target_segment_length=16)
    return T2S(t2s_cfg, model, variables,
               speaker_ids={"Alice": 0, "Bob": 1})


def test_t2s_infer_end_to_end(tiny_t2s):
    result = tiny_t2s.infer("Hello there. How are you?",
                            speaker=["alice", "bob"], seed=3)
    assert len(result["segments"]) == 2
    assert result["speakers"] == ["Alice", "Bob"]
    assert all(m is not None and m.ndim == 2 for m in result["mels"])
    assert np.all(result["attempts"] >= 1)
    assert np.all(np.isfinite(result["scores"]))
    assert result["xrt"] > 0


def test_t2s_per_request_caps(tiny_t2s):
    """max_duration_s compiles ONLY at step-bucket shapes (the cap
    clamps mel_lengths post-decode), dyna_max_duration_s is the
    reference's per-char hard cap (text2speech.py:411), and explicit
    zero/negative control values raise instead of silently becoming
    defaults."""
    import pytest

    sr, hop = tiny_t2s.sample_rate, tiny_t2s.hop_length
    r = tiny_t2s.infer("Hello there friend.", speaker=["alice"],
                       max_duration_s=3 * hop / sr, seed=1)
    # jit cache keys stay inside the bucket set (no per-duration shape)
    buckets = set(tiny_t2s.cfg.step_buckets) | {
        tiny_t2s.cfg.max_decoder_steps}
    assert set(tiny_t2s._infer_cache) <= buckets
    # the duration cap clamps the OUTPUT (3 frames of audio)
    assert (np.asarray(r["mel_lengths"]) <= 3).all()

    from cookietts_tpu.text import text_to_sequence
    n_tok = len(text_to_sequence("Hello there friend.",
                                 tiny_t2s.cfg.text_cleaners))
    r2 = tiny_t2s.infer("Hello there friend.", speaker=["alice"],
                        dyna_max_duration_s=0.2 * hop / sr, seed=1)
    # ~0.2 frames/token * tokens + gate_delay bounds the output
    cap = int(n_tok * 0.2) + tiny_t2s.cfg.gate_delay
    assert (np.asarray(r2["mel_lengths"]) <= cap).all()
    assert set(tiny_t2s._infer_cache) <= buckets

    for bad in (dict(max_attempts=0), dict(batch_size=-1),
                dict(max_decoder_steps=0)):
        with pytest.raises(ValueError, match="positive"):
            tiny_t2s.infer("Hi.", speaker=["alice"], **bad)


def test_server_stats_endpoint(tiny_t2s):
    import tornado.httpserver
    import tornado.testing
    from cookietts_tpu.pipeline.server import make_app

    class ServerTest(tornado.testing.AsyncHTTPTestCase):
        def get_app(self):
            return make_app(tiny_t2s, default_speaker="Alice")

        def runTest(self):
            resp = self.fetch("/")
            assert resp.code == 200 and b"cookietts_tpu" in resp.body
            resp = self.fetch(
                "/tts", method="POST",
                body="input_text=Hi there.&stats_only=1&batch_size=4"
                     "&max_attempts=1&target_score=0.1")
            assert resp.code == 200, resp.body
            stats = json.loads(resp.body)
            assert stats["segments"] == ["Hi there."]
            assert "xrt" in stats
            # CLEARED form boxes post empty strings — numeric fields
            # must fall back to defaults, not 500 on float('')
            resp = self.fetch(
                "/tts", method="POST",
                body="input_text=Hi there.&stats_only=1&batch_size=4"
                     "&max_attempts=1&input_target_score="
                     "&gate_delay=&input_cat_silence_s=&target_score=0.1")
            assert resp.code == 200, resp.body

    test = ServerTest()
    test.setUp()
    try:
        test.runTest()
    finally:
        test.tearDown()


def test_t2s_with_vocoder_end_to_end(tiny_t2s):
    """The SURVEY §7 minimum slice: text -> mel (Tacotron2) -> audio
    (WaveGlow inverse) through the T2S worker."""
    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig

    n_mel = tiny_t2s.model.cfg.n_mel_channels
    hop = 64
    wcfg = WaveGlowConfig(
        n_mel_channels=n_mel, n_flows=2, n_group=4, n_early_every=0,
        n_layers=1, n_channels=8, hop_length=hop, upsample_strides=(4, 4),
        upsample_channels=8, memory_efficient=False)
    voc = WaveGlow(wcfg)
    rng = np.random.default_rng(0)
    mel0 = jnp.asarray(rng.standard_normal((1, 8, n_mel)), jnp.float32)
    audio0 = jnp.asarray(rng.standard_normal((1, 8 * hop)), jnp.float32)
    vvars = jax.jit(voc.init)(jax.random.PRNGKey(0), audio0, mel0)
    voc_fn = jax.jit(lambda m: voc.apply(
        vvars, m, jax.random.PRNGKey(1), method=WaveGlow.infer))

    tiny_t2s.vocoder_fn = voc_fn
    tiny_t2s.hop_length = hop
    try:
        result = tiny_t2s.infer("Testing the full pipeline now.",
                                speaker=["alice"], seed=7)
        assert len(result["audio"]) > 0
        assert np.all(np.isfinite(result["audio"]))
        expected = int(result["mel_lengths"].sum()) * hop
        assert len(result["audio"]) == expected
    finally:
        tiny_t2s.vocoder_fn = None


def test_gta_offset_naming_roundtrip(tmp_path):
    """GTAGenerator's '.mel{N}.npy' suffix is parsed back by Mel2Samp,
    which trims the audio by the offset (ADVICE round-1: the writer and
    parser previously disagreed, silently never applying the offset)."""
    import numpy as np
    from cookietts_tpu.data import audio_io
    from cookietts_tpu.data.mel2samp import Mel2Samp, Mel2SampConfig

    sr = 48000
    audio = (np.arange(sr, dtype=np.float32) / sr * 0.5)   # ramp: position
    wav = str(tmp_path / "a.wav")                          # is readable from
    audio_io.save_wav(wav, audio, sr)                      # sample value

    cfg = Mel2SampConfig(segment_length=2400, filter_length=240,
                         hop_length=60, win_length=240, n_mel_channels=8,
                         load_mel_from_disk=1.0, load_from_disk_dtw=False)
    gta = np.zeros((790, 8), np.float32)
    np.save(wav + ".mel333.npy", gta)   # GTAGenerator suffix for offset=333
    np.save(wav + ".mel.npy", gta)      # offset-0 twin

    ds_off = Mel2Samp([(wav, wav + ".mel333.npy", 0)], cfg, seed=7)
    ds_base = Mel2Samp([(wav, wav + ".mel.npy", 0)], cfg, seed=7)
    a_off = ds_off[0]["audio"]
    a_base = ds_base[0]["audio"]
    # same rng seed -> same segment start; the offset-named mel must shift
    # the audio stream by exactly 333 samples
    idx_base = int(round(float(a_base[0]) * 2 * sr))
    idx_off = int(round(float(a_off[0]) * 2 * sr))
    # ±1 tolerance: int16 wav quantization blurs the value->index inverse
    assert abs((idx_off - idx_base) - 333) <= 1, (idx_base, idx_off)


def test_offset_item_mels_shifts_audio(tmp_path):
    import numpy as np
    from cookietts_tpu.data import audio_io
    from cookietts_tpu.data.dataset import DataConfig, TTSDataset
    from cookietts_tpu.pipeline.gta import offset_item_mels

    sr = 22050
    t = np.arange(sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    wav = str(tmp_path / "b.wav")
    audio_io.save_wav(wav, audio, sr)
    cfg = DataConfig(sampling_rate=sr, filter_length=512, hop_length=128,
                     win_length=512, n_mel_channels=8, mel_fmax=8000.0,
                     trim_enable=False, target_lufs=None, cache_mels=False)
    ds = TTSDataset([{"path": wav, "quote": "hi"}], cfg,
                    features=("text", "mel"))
    items = [ds[0]]
    same = offset_item_mels(ds, items, 0)
    assert same[0] is items[0] or np.allclose(same[0]["mel"], items[0]["mel"])
    shifted = offset_item_mels(ds, items, 64)
    assert shifted[0]["mel"].shape[0] <= items[0]["mel"].shape[0]
    expect = ds.stft.mel_spectrogram_np(ds.load_audio(wav)[64:])
    np.testing.assert_allclose(shifted[0]["mel"], expect, atol=1e-5)


def test_collate_never_truncates_full_utterances():
    """Mels longer than the largest bucket must extend the pad width (and
    keep gate=1 at the TRUE end) when collating whole utterances — the GTA
    path pairs these mels with full-length wavs (ADVICE round-1)."""
    import numpy as np
    from cookietts_tpu.data.dataset import (DataConfig, Segment, collate)

    cfg = DataConfig(text_buckets=[8], mel_buckets=[16],
                     max_segment_frames=16)
    item = {"audiopath": "x.wav",
            "text": np.arange(1, 6, dtype=np.int32),
            "mel": np.ones((50, 4), np.float32)}
    out = collate([item], cfg)
    assert out["mels"].shape[1] == 64          # extended, not clamped to 16
    assert int(out["mel_lengths"][0]) == 50    # nothing dropped
    assert out["gate_target"][0, 49] == 1.0
    assert out["gate_target"][0, 48] == 0.0
    # TBPTT segments still slice to the fixed window
    seg = Segment(file_idx=0, seg_idx=1, n_segs=4)
    out2 = collate([item], cfg, segments=[seg])
    assert out2["mels"].shape[1] == 16


def test_interleave_quote_mode():
    segs = ["He walked in.", '"Hello!"', "She replied,", '"Goodbye."']
    out = interleave_speakers(segs, ["Narrator", "A", "B"], "quotes")
    assert out == ["Narrator", "A", "Narrator", "B"]
    # single speaker: narrator voices everything including quotes
    assert interleave_speakers(segs, ["Solo"], "quotes") == ["Solo"] * 4


def test_t2s_use_arpabet_and_gate_fields(tiny_t2s):
    """use_arpabet substitutes {ARPA} before encoding (reference
    text2speech.py:527-528 — round 1 accepted and IGNORED it), and the
    per-request gate_delay actually changes output lengths."""
    calls = []

    def fake_arpa(s):
        calls.append(s)
        return "{HH AH0 L OW1} " + s

    tiny_t2s.arpa_fn = fake_arpa
    r1 = tiny_t2s.infer("Hello there.", speaker=["alice"],
                        use_arpabet=True, max_attempts=1, seed=1)
    assert calls == ["Hello there."]
    assert np.all(np.isfinite(r1["scores"]))
    r0 = tiny_t2s.infer("Hello there.", speaker=["alice"],
                        use_arpabet=False, max_attempts=1, seed=1)
    assert calls == ["Hello there."]        # not called again

    # gate controls: absurd threshold -> decode runs to the step cap
    r_long = tiny_t2s.infer("Hello there.", speaker=["alice"],
                            max_attempts=1, gate_threshold=0.9999,
                            gate_delay=0, seed=1)
    r_short = tiny_t2s.infer("Hello there.", speaker=["alice"],
                             max_attempts=1, gate_threshold=0.01,
                             gate_delay=0, seed=1)
    assert int(r_long["mel_lengths"][0]) > int(r_short["mel_lengths"][0])


def test_server_full_field_surface(tiny_t2s, tmp_path):
    """Reference form fields (app.py:32-51), model hot-swap
    (app.py:55-58), and the /<voice> download route (app.py:154-170)."""
    import tornado.testing
    from cookietts_tpu.pipeline.server import ModelRegistry, make_app

    registry = ModelRegistry({"m1": tiny_t2s, "m2": lambda: tiny_t2s}, "m1")
    outdir = str(tmp_path / "out")

    class ServerTest(tornado.testing.AsyncHTTPTestCase):
        def get_app(self):
            return make_app(registry=registry, output_dir=outdir,
                            default_speaker="Alice")

        def runTest(self):
            body = ("input_text=Hi there.&stats_only=1"
                    "&input_speaker=alice&input_multispeaker_mode=quotes"
                    "&input_target_score=0.1&input_batch_size=4"
                    "&input_max_attempts=1&input_max_duration_s=5"
                    "&input_cat_silence_s=0.05&input_use_arpabet=on"
                    "&gate_threshold=0.2&gate_delay=3"
                    "&input_ttm_current=m2")
            resp = self.fetch("/tts", method="POST", body=body)
            assert resp.code == 200, resp.body
            stats = json.loads(resp.body)
            assert stats["model"] == "m2"          # hot-swap happened
            assert stats["segments"] == ["Hi there."]

            # /<voice> serves files from the output dir (and only those)
            import os as _os
            wav_name = "probe.wav"
            with open(_os.path.join(outdir, wav_name), "wb") as f:
                f.write(b"RIFFxxxx")
            resp = self.fetch(f"/{wav_name}")
            assert resp.code == 200 and resp.body.startswith(b"RIFF")
            resp = self.fetch("/../escape.wav")
            assert resp.code in (403, 404)

    t = ServerTest()
    t.setUp()
    try:
        t.runTest()
    finally:
        t.tearDown()


def test_t2s_gst_torchmoji_style_path():
    """The GST "TP" inference path in serving: a use_gst model conditions
    on torchMoji hidden states through the style-token attention
    (reference text2speech.py:497-509 + TPGST ref_mode=3) — different
    torchMoji embeddings must change the generated mel."""
    from tests.test_tacotron2 import tiny_cfg
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from cookietts_tpu.text import N_SYMBOLS

    cfg = tiny_cfg(max_decoder_steps=16, n_symbols=N_SYMBOLS,
                   use_gst=True, gst_token_num=4,
                   gst_token_embedding_size=8, gst_num_heads=2,
                   p_prenet_dropout=0.0)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    B, T_txt, T_mel = 2, 10, 12
    batch = dict(
        text=jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T_txt)),
                         jnp.int32),
        text_lengths=jnp.full((B,), T_txt, jnp.int32),
        mels=jnp.asarray(rng.standard_normal((B, T_mel,
                                              cfg.n_mel_channels)),
                         jnp.float32),
        mel_lengths=jnp.full((B,), T_mel, jnp.int32),
        speaker_id=jnp.asarray([0, 1], jnp.int32),
        sylps=jnp.full((B,), 4.0),
        torchmoji_hidden=jnp.asarray(
            rng.standard_normal((B, cfg.torchmoji_dim)), jnp.float32))
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)

    t2s_cfg = T2SConfig(batch_size=2, max_attempts=1, step_buckets=(16,),
                        max_decoder_steps=16, target_score=0.0,
                        target_segment_length=64)

    def tm_fn_a(text):
        return np.full(cfg.torchmoji_dim, 0.5, np.float32)

    def tm_fn_b(text):
        return np.full(cfg.torchmoji_dim, -1.5, np.float32)

    t2s_a = T2S(t2s_cfg, model, variables, {"Alice": 0},
                torchmoji_fn=tm_fn_a)
    t2s_b = T2S(t2s_cfg, model, variables, {"Alice": 0},
                torchmoji_fn=tm_fn_b)
    r_a = t2s_a.infer("Hello world.", speaker=["Alice"], seed=5)
    r_b = t2s_b.infer("Hello world.", speaker=["Alice"], seed=5)
    assert np.all(np.isfinite(r_a["mels"][0]))
    n = min(r_a["mels"][0].shape[0], r_b["mels"][0].shape[0])
    assert not np.allclose(r_a["mels"][0][:n], r_b["mels"][0][:n]), \
        "torchMoji style embedding must condition GST generation"


def test_streaming_vocode_bit_exact():
    """Chunked HiFi-GAN vocoding with receptive-field halos reproduces
    the full-utterance waveform EXACTLY (clamped slices mean sequence
    edges see the generator's own zero padding like the full run)."""
    import jax

    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig
    from cookietts_tpu.pipeline.streaming import (streaming_vocode,
                                                  vocode_streamed)

    cfg = HiFiGANConfig(
        n_mel_channels=12, resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
        upsample_initial_channel=24)
    gen = Generator(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 173                       # deliberately not chunk-aligned
    mel = jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), mel[:, :8])
    voc = jax.jit(lambda m: gen.apply(variables, m))

    shapes = []

    def voc_spy(m):
        shapes.append(m.shape)
        return voc(m)

    full = np.asarray(voc(mel))
    got = vocode_streamed(voc_spy, mel, chunk_frames=48, halo_frames=24)
    assert got.shape == full.shape
    np.testing.assert_array_equal(got, full)
    # every chunk shares ONE shape (one compiled program per batch)
    assert len(set(shapes)) == 1, shapes

    # pieces arrive in order with correct sample offsets
    offs = [o for o, _ in streaming_vocode(voc, mel, 48, 24)]
    hop = full.shape[1] // T
    assert offs == [i * 48 * hop for i in range(len(offs))]

    # too-small halo must actually break exactness (the test would be
    # vacuous if the halo didn't matter at these dims)
    loose = vocode_streamed(voc, mel, chunk_frames=48, halo_frames=1)
    assert not np.array_equal(loose, full)


def test_t2s_streaming_vocode_matches_batch(tiny_t2s):
    """T2SConfig.streaming_over_frames: long segments vocode through
    halo-overlapped chunks with audio identical to the whole-mel run."""
    import dataclasses

    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig

    n_mel = tiny_t2s.model.cfg.n_mel_channels
    hcfg = HiFiGANConfig(
        n_mel_channels=n_mel, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8), upsample_initial_channel=16)
    gen = Generator(hcfg)
    gvars = gen.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 8, n_mel), jnp.float32))
    voc_fn = jax.jit(lambda m: gen.apply(gvars, m))

    old_cfg, old_voc, old_hop = (tiny_t2s.cfg, tiny_t2s.vocoder_fn,
                                 tiny_t2s.hop_length)
    try:
        tiny_t2s.vocoder_fn = voc_fn
        tiny_t2s.hop_length = 16
        ref = tiny_t2s.infer("Streaming test sentence.",
                             speaker=["alice"], seed=3)
        tiny_t2s.cfg = dataclasses.replace(
            tiny_t2s.cfg, streaming_over_frames=16,
            streaming_chunk_frames=16, streaming_halo_frames=16)
        got = tiny_t2s.infer("Streaming test sentence.",
                             speaker=["alice"], seed=3)
        np.testing.assert_array_equal(got["audio"], ref["audio"])
        assert len(got["audio"]) > 0
    finally:
        tiny_t2s.cfg, tiny_t2s.vocoder_fn, tiny_t2s.hop_length = (
            old_cfg, old_voc, old_hop)


def test_quote_continuation_keeps_quote_marker():
    """A long quote re-packed into several segments keeps its quote
    marker on every piece, so the 'quotes' speaker mode never hands a
    quote's continuation to the narrator voice."""
    from cookietts_tpu.pipeline.text2speech import (
        interleave_speakers, parse_text_into_segments)

    text = ('Narration before. "First quoted sentence that is long. '
            'Second quoted sentence, also fairly long indeed. Third one '
            'keeps going for a while too." Narration after.')
    segs = parse_text_into_segments(text, target_segment_length=40)
    quoted = [s for s in segs if s.startswith('"')]
    assert len(quoted) >= 2                       # quote was re-split
    voices = interleave_speakers(segs, ["narrator", "alice"],
                                 mode="quotes")
    for s, v in zip(segs, voices):
        assert (v == "alice") == s.startswith('"'), (s, v)


def test_t2s_splits_token_overflow_segments(tiny_t2s):
    """Segments whose TOKEN count exceeds max_text_len are split at a
    space instead of silently truncating trailing words."""
    import dataclasses

    old = tiny_t2s.cfg
    try:
        tiny_t2s.cfg = dataclasses.replace(tiny_t2s.cfg, max_text_len=16)
        res = tiny_t2s.infer(
            "A fairly long sentence that certainly tokenizes past "
            "sixteen symbols in total.", speaker=["alice"], seed=2)
        assert len(res["segments"]) >= 2
        joined = " ".join(res["segments"])
        assert "total" in joined            # the tail words survived
    finally:
        tiny_t2s.cfg = old


def test_t2s_token_resplit_keeps_quote_marker(tiny_t2s):
    """The token-level never-truncate re-split stamps the quote marker
    on BOTH halves of a split quoted segment, so speaker_mode='quotes'
    keeps the quote's continuation on the quote voice (ADVICE r3)."""
    import dataclasses

    old = tiny_t2s.cfg
    try:
        tiny_t2s.cfg = dataclasses.replace(
            tiny_t2s.cfg, max_text_len=16, split_at_quotes=True)
        res = tiny_t2s.infer(
            'She said "this quoted sentence certainly tokenizes well '
            'past sixteen symbols in total somehow."',
            speaker=["Bob", "Alice"], speaker_mode="quotes", seed=2)
        quoted = [s for s in res["segments"] if s.startswith(('"', "“"))]
        assert len(quoted) >= 2             # the quote was re-split
        for s, v in zip(res["segments"], res["speakers"]):
            assert (v == "Alice") == s.startswith(('"', "“")), (s, v)
    finally:
        tiny_t2s.cfg = old


def test_streaming_tts_end_to_end_matches_full_pipeline():
    """streaming_tts: chunked AR decode + halo-exact chunked postnet +
    chunked vocode reproduces the full pipeline's waveform exactly (the
    decoder scan is causal and draws the same per-step keys; postnet and
    vocoder windows carry their receptive-field halos). First audio
    arrives after ONE decode chunk instead of the whole utterance."""
    import jax

    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig
    from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
    from cookietts_tpu.pipeline.streaming import streaming_tts

    tcfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, encoder_speaker_embed_dim=4,
        encoder_conv_hidden_dim=16, encoder_lstm_dim=16,
        encoder_n_convolutions=1, torchmoji_dim=8, torchmoji_crushed_dim=4,
        memory_bottleneck_dim=16, prenet_dim=8, attention_rnn_dim=16,
        decoder_rnn_dim=16, second_decoder_rnn_dim=0, attention_dim=8,
        windowed_attention_range=4, postnet_embedding_dim=16,
        postnet_n_convolutions=2, postnet_residual_connections=0,
        n_mel_channels=12, max_decoder_steps=96)
    hcfg = HiFiGANConfig(
        n_mel_channels=12, resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
        upsample_initial_channel=24)
    taco, gen = Tacotron2(tcfg), Generator(hcfg)
    rng = np.random.default_rng(0)
    B, T_txt = 2, 10
    text = jnp.asarray(rng.integers(1, 40, (B, T_txt)), jnp.int32)
    text_lengths = jnp.asarray([10, 7], jnp.int32)
    speaker_id = jnp.asarray([0, 1], jnp.int32)
    mels_init = jnp.asarray(rng.standard_normal((B, 8, 12)), jnp.float32)
    tvars = jax.jit(taco.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text=text, text_lengths=text_lengths, mels=mels_init,
        mel_lengths=jnp.full((B,), 8, jnp.int32), speaker_id=speaker_id,
        sylps=jnp.full((B,), 4.0), key=jax.random.PRNGKey(2),
        deterministic=False)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(3),
                              jnp.zeros((B, 8, 12), jnp.float32))
    voc = jax.jit(lambda m: gen.apply(gvars, m))

    key = jax.random.PRNGKey(7)
    # full pipeline: one fixed-length decode + postnet + one vocode
    full = taco.apply(tvars, text, text_lengths, speaker_id, key=key,
                      max_decoder_steps=96, method=Tacotron2.inference)
    full_audio = np.asarray(voc(full["mel_outputs_postnet"]), np.float32)

    # streamed: gate_threshold=2.0 (sigmoid < 1 always) forces the full
    # 96 frames so every sample has a full-run counterpart to compare
    pieces = list(streaming_tts(
        taco, tvars, voc, text=text, text_lengths=text_lengths,
        speaker_id=speaker_id, key=key, max_decoder_steps=96,
        decode_chunk_steps=24, vocoder_halo=24, hop_length=32,
        gate_threshold=2.0, gate_delay=4))
    assert len(pieces) >= 2, "stream must yield before decode finishes"
    offs = [o for o, _ in pieces]
    assert offs[0] == 0 and offs == sorted(offs)
    streamed = np.concatenate([p for _, p in pieces], axis=1)
    assert streamed.shape == full_audio.shape
    np.testing.assert_allclose(streamed, full_audio, atol=1e-5)

    # regression (round-5 review): when max_decoder_steps is NOT a
    # multiple of decode_chunk_steps the last chunk overshoots the step
    # budget — the stream must DROP the overshoot frames the full scan
    # never decodes, not emit extra audio
    full90 = taco.apply(tvars, text, text_lengths, speaker_id, key=key,
                        max_decoder_steps=90, method=Tacotron2.inference)
    full90_audio = np.asarray(voc(full90["mel_outputs_postnet"]),
                              np.float32)
    pieces90 = list(streaming_tts(
        taco, tvars, voc, text=text, text_lengths=text_lengths,
        speaker_id=speaker_id, key=key, max_decoder_steps=90,
        decode_chunk_steps=24, vocoder_halo=24, hop_length=32,
        gate_threshold=2.0, gate_delay=4))
    streamed90 = np.concatenate([p for _, p in pieces90], axis=1)
    assert streamed90.shape == full90_audio.shape, (
        "stream emitted frames beyond the decoder-step budget")
    np.testing.assert_allclose(streamed90, full90_audio, atol=1e-5)
