"""Tensor parallelism: a (dp=4, tp=2) mesh must produce the same losses
and updated params as the dp-only (8, 1) mesh — TP only changes WHERE the
matmuls run, never the math. Runs on the 8-virtual-device CPU mesh from
conftest.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.parallel import (TACOTRON2_TP_RULES, WAVEGLOW_TP_RULES,
                                    make_mesh, shard_batch, tree_shardings)
from cookietts_tpu.runtime.optim import adam
from cookietts_tpu.runtime.train_state import TrainState
from cookietts_tpu.runtime.trainer import (make_tacotron2_train_step,
                                           make_waveglow_train_step,
                                           scalars_to_arrays)


def _leaves_close(a, b, atol):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_waveglow_tp_matches_dp():
    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig

    cfg = WaveGlowConfig(
        n_mel_channels=16, n_flows=2, n_group=4, n_early_every=4,
        n_early_size=2, n_layers=2, n_channels=32, hop_length=32,
        upsample_strides=(4, 2), upsample_channels=24,
        memory_efficient=False)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    B, t_mel = 8, 6
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal((B, t_mel * cfg.hop_length)), jnp.float32),
        "mels": jnp.asarray(
            rng.standard_normal((B, t_mel, cfg.n_mel_channels)), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["audio"],
                           batch["mels"])
    ctrl = scalars_to_arrays({"lr": 1e-3, "grad_clip": 100.0})
    key = jax.random.PRNGKey(1)

    results = {}
    for name, (dp, tp, rules) in {
        "dp": (8, 1, None), "tp": (4, 2, WAVEGLOW_TP_RULES),
    }.items():
        mesh = make_mesh(dp=dp, tp=tp)
        state = TrainState.create(model.apply, variables["params"], adam())
        step = make_waveglow_train_step(model, mesh=mesh, donate=False,
                                        tp_rules=rules)
        with mesh:
            new_state, metrics = step(state, shard_batch(batch, mesh),
                                      key, ctrl)
        results[name] = (float(metrics["loss"]),
                         jax.device_get(new_state.params))

    # something actually got tp-sharded
    mesh = make_mesh(dp=4, tp=2)
    shd = tree_shardings(variables["params"], mesh, WAVEGLOW_TP_RULES)
    n_sharded = sum(
        any(s is not None for s in s_.spec)
        for s_ in jax.tree_util.tree_leaves(shd))
    assert n_sharded > 0, "no weight matched the WaveGlow tp rules"

    assert np.isclose(results["dp"][0], results["tp"][0], atol=1e-4)
    _leaves_close(results["dp"][1], results["tp"][1], atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tacotron2_tp_matches_dp():
    from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
    from cookietts_tpu.losses import DEFAULT_LOSS_SCALARS

    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=10,
        encoder_speaker_embed_dim=4, encoder_conv_hidden_dim=16,
        encoder_lstm_dim=16, encoder_n_convolutions=1,
        torchmoji_dim=12, torchmoji_crushed_dim=4,
        memory_bottleneck_dim=16, prenet_dim=8, attention_rnn_dim=16,
        decoder_rnn_dim=12, second_decoder_rnn_dim=0, attention_dim=8,
        windowed_attention_range=4, postnet_embedding_dim=16,
        postnet_n_convolutions=2, postnet_residual_connections=0)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    B, T_txt, T_mel = 8, 12, 16
    batch = dict(
        text=jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T_txt)),
                         jnp.int32),
        text_lengths=jnp.full((B,), T_txt, jnp.int32),
        mels=jnp.asarray(
            rng.standard_normal((B, T_mel, cfg.n_mel_channels)), jnp.float32),
        mel_lengths=jnp.full((B,), T_mel, jnp.int32),
        speaker_id=jnp.zeros((B,), jnp.int32),
        sylps=jnp.full((B,), 4.0, jnp.float32),
        torchmoji=jnp.asarray(rng.standard_normal((B, cfg.torchmoji_dim)),
                              jnp.float32),
        gate_target=(jnp.arange(T_mel)[None, :]
                     >= T_mel - 1).astype(jnp.float32)
        * jnp.ones((B, 1), jnp.float32),
        pres_prev_state=jnp.zeros((B,), jnp.float32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text=batch["text"], text_lengths=batch["text_lengths"],
        mels=batch["mels"], mel_lengths=batch["mel_lengths"],
        speaker_id=batch["speaker_id"], sylps=batch["sylps"],
        torchmoji_hidden=batch["torchmoji"], key=jax.random.PRNGKey(2),
        deterministic=False)
    params = variables["params"]
    mutables = {k: v for k, v in variables.items() if k != "params"}
    ctrl = scalars_to_arrays({
        "lr": 1e-4, "grad_clip": 1.0, "p_teacher_forcing": 1.0,
        "teacher_force_till": 20, "drop_frame_rate": 0.0,
        **DEFAULT_LOSS_SCALARS})
    key = jax.random.PRNGKey(3)

    losses = {}
    for name, (dp, tp, rules) in {
        "dp": (8, 1, None), "tp": (4, 2, TACOTRON2_TP_RULES),
    }.items():
        mesh = make_mesh(dp=dp, tp=tp)
        state = TrainState.create(model.apply, params, adam(), mutables)
        step = make_tacotron2_train_step(model, mesh=mesh, donate=False,
                                         tp_rules=rules)
        with mesh:
            _, loss_dict, _, _ = step(state, shard_batch(batch, mesh),
                                      key, ctrl)
        losses[name] = float(loss_dict["loss"])

    assert np.isclose(losses["dp"], losses["tp"], atol=1e-4), losses


def test_launch_helpers_single_process():
    """initialize() no-ops off-pod; global_batch_slice covers the batch."""
    from cookietts_tpu.parallel import global_batch_slice, initialize

    assert initialize() in (False, True)     # no crash, no hang
    s = global_batch_slice(16)
    assert (s.stop - s.start) * jax.process_count() == 16
    assert s.start == jax.process_index() * (s.stop - s.start)


def test_shard_batch_process_local_assembly():
    """The multi-host leaf path (make_array_from_process_local_data)
    produces the same global array device_put does single-process."""
    from cookietts_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(dp=8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    a = jax.make_array_from_process_local_data(batch_sharding(mesh), x)
    assert a.shape == (16, 3)
    assert a.sharding.is_equivalent_to(batch_sharding(mesh), 2)
    assert np.allclose(np.asarray(a), x)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_waveglow_sp_matches_dp():
    """Sequence parallelism: sharding the audio/mel TIME axis over sp
    (flows are pointwise-in-time given cond; GSPMD inserts the conv halo
    exchanges) must reproduce the dp-only loss and updated params."""
    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig

    cfg = WaveGlowConfig(
        n_mel_channels=16, n_flows=2, n_group=4, n_early_every=4,
        n_early_size=2, n_layers=2, n_channels=32, hop_length=32,
        upsample_strides=(4, 2), upsample_channels=24,
        memory_efficient=False)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    B, t_mel = 4, 16
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal((B, t_mel * cfg.hop_length)), jnp.float32),
        "mels": jnp.asarray(
            rng.standard_normal((B, t_mel, cfg.n_mel_channels)), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["audio"],
                           batch["mels"])
    ctrl = scalars_to_arrays({"lr": 1e-3, "grad_clip": 100.0})
    key = jax.random.PRNGKey(1)

    results = {}
    for name, (dp, sp) in {"dp": (4, 1), "sp": (2, 4)}.items():
        mesh = make_mesh(dp=dp, tp=1, sp=sp,
                         devices=jax.devices()[:dp * sp])
        state = TrainState.create(model.apply, variables["params"], adam())
        step = make_waveglow_train_step(model, mesh=mesh, donate=False)
        with mesh:
            sharded = shard_batch(batch, mesh,
                                  time_axes={"audio": 1, "mels": 1})
            new_state, metrics = step(state, sharded, key, ctrl)
        results[name] = (float(metrics["loss"]),
                         jax.device_get(new_state.params))

    # the sp batch really is time-sharded across devices
    mesh = make_mesh(dp=2, tp=1, sp=4)
    sharded = shard_batch(batch, mesh, time_axes={"audio": 1, "mels": 1})
    spec = sharded["audio"].sharding.spec
    assert "sp" in str(spec), spec

    assert np.isclose(results["dp"][0], results["sp"][0], atol=1e-4)
    _leaves_close(results["dp"][1], results["sp"][1], atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_waveglow_sp_inference_matches_single_device():
    """Batch-1 WaveGlow inference with the mel time axis sharded over
    sp=8: one long utterance scales across chips, output matches the
    single-device inverse."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig

    cfg = WaveGlowConfig(
        n_mel_channels=16, n_flows=2, n_group=4, n_early_every=4,
        n_early_size=2, n_layers=2, n_channels=32, hop_length=32,
        upsample_strides=(4, 2), upsample_channels=24,
        memory_efficient=False)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    t_mel = 32
    mel = jnp.asarray(rng.standard_normal((1, t_mel, cfg.n_mel_channels)),
                      jnp.float32)
    audio = jnp.asarray(
        rng.standard_normal((1, t_mel * cfg.hop_length)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), audio, mel)
    key = jax.random.PRNGKey(7)

    def infer(variables, mel):
        return model.apply(variables, mel, key, 0.8, method=WaveGlow.infer)

    ref = np.asarray(jax.jit(infer)(variables, mel))

    mesh = make_mesh(dp=1, tp=1, sp=8)
    mel_sp = jax.device_put(mel, NamedSharding(mesh, P(None, "sp", None)))
    with mesh:
        out = np.asarray(jax.jit(infer)(variables, mel_sp))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_hifigan_gan_steps_dp_matches_single_device():
    """GAN training shards over dp like the reference's hifigan DDP
    (train.py:66-69): a dp8 mesh reproduces the single-device d/g losses
    and updated params."""
    from cookietts_tpu.models.hifigan import (Generator, HiFiGANConfig,
                                              MultiPeriodDiscriminator,
                                              MultiScaleDiscriminator)
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.trainer import make_hifigan_train_steps

    cfg = HiFiGANConfig(
        n_mel_channels=8, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=16,
        mpd_periods=(2,), msd_scales=1)
    gen = Generator(cfg)
    mpd = MultiPeriodDiscriminator(cfg)
    msd = MultiScaleDiscriminator(cfg)
    rng = np.random.default_rng(0)
    B, T_mel = 8, 16
    mels = jnp.asarray(rng.standard_normal((B, T_mel, 8)), jnp.float32)
    audio = jnp.asarray(
        rng.standard_normal((B, T_mel * 8)) * 0.3, jnp.float32)
    batch = {"mels": mels, "audio": audio}
    gv = gen.init(jax.random.PRNGKey(0), mels)
    pv = mpd.init(jax.random.PRNGKey(1), audio, audio)
    sv = msd.init(jax.random.PRNGKey(2), audio, audio)
    mel_fn = lambda a: a.reshape(B, T_mel, 8)        # noqa: E731
    ctrl = scalars_to_arrays({"lr": 1e-4, "grad_clip": 100.0})

    results = {}
    for name, mesh in (("single", None),
                       ("dp", make_mesh(dp=8, devices=jax.devices()[:8]))):
        d_step, g_step = make_hifigan_train_steps(gen, mpd, msd, mel_fn,
                                                  mesh=mesh)
        g_state = TrainState.create(gen.apply, gv["params"], adam())
        d_state = TrainState.create(
            None, (pv["params"], sv["params"]), adam())
        b = shard_batch(batch, mesh) if mesh is not None else batch
        if mesh is not None:
            with mesh:
                d_state, d_m = d_step(d_state, g_state, b, ctrl)
                g_state, g_m = g_step(g_state, d_state, b, ctrl)
        else:
            d_state, d_m = d_step(d_state, g_state, b, ctrl)
            g_state, g_m = g_step(g_state, d_state, b, ctrl)
        results[name] = (float(d_m["d_loss"]), float(g_m["g_loss"]),
                         jax.device_get(g_state.params))

    assert np.isclose(results["single"][0], results["dp"][0], atol=1e-5)
    assert np.isclose(results["single"][1], results["dp"][1], atol=2e-4)
    _leaves_close(results["single"][2], results["dp"][2], atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_hifigan_sp_inference_matches_single_device():
    """HiFi-GAN inference with the mel TIME axis sharded over sp=8 (one
    long utterance across chips; GSPMD halo-exchanges the convs) matches
    the single-device waveform."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(
        n_mel_channels=8, resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16)
    gen = Generator(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 64, 8)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), mel[:, :8])

    infer = lambda v, m: gen.apply(v, m)                 # noqa: E731
    ref = np.asarray(jax.jit(infer)(variables, mel))

    mesh = make_mesh(dp=1, tp=1, sp=8)
    mel_sp = jax.device_put(mel, NamedSharding(mesh, P(None, "sp", None)))
    with mesh:
        out = np.asarray(jax.jit(infer)(variables, mel_sp))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
