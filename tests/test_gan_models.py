"""HiFi-GAN, GANTTS, and Denoiser tests (tiny dims)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.models.hifigan import (
    Generator, HiFiGANConfig, MultiPeriodDiscriminator,
    MultiScaleDiscriminator, discriminator_loss, feature_loss,
    generator_loss, mel_l1_loss)


def hifi_cfg():
    return HiFiGANConfig(
        n_mel_channels=16,
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, mpd_periods=(2, 3), msd_scales=2)


@pytest.fixture(scope="module")
def hifi():
    cfg = hifi_cfg()
    gen = Generator(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    return cfg, gen, gvars, mel


def test_hifigan_generator_shape(hifi):
    cfg, gen, gvars, mel = hifi
    audio = jax.jit(gen.apply)(gvars, mel)
    assert audio.shape == (2, 12 * 16)          # T_mel * prod(rates)
    a = np.asarray(audio)
    assert np.all(np.isfinite(a)) and np.abs(a).max() <= 1.0


def test_hifigan_discriminators_and_losses(hifi):
    cfg, gen, gvars, mel = hifi
    real = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 12 * 16)), jnp.float32) * 0.1
    fake = jax.jit(gen.apply)(gvars, mel)

    mpd = MultiPeriodDiscriminator(cfg)
    dvars = jax.jit(mpd.init)(jax.random.PRNGKey(1), real, fake)
    rl, fl, rf, ff = jax.jit(mpd.apply)(dvars, real, fake)
    assert len(rl) == 2 and len(rf[0]) == 6

    msd = MultiScaleDiscriminator(cfg)
    svars = jax.jit(msd.init)(jax.random.PRNGKey(2), real, fake)
    rl2, fl2, rf2, ff2 = jax.jit(msd.apply)(svars, real, fake)
    assert len(rl2) == 2

    d_loss = discriminator_loss(rl + rl2, fl + fl2)
    g_loss = generator_loss(fl + fl2)
    f_loss = feature_loss(rf + rf2, ff + ff2)
    m_loss = mel_l1_loss(mel, mel + 0.1)
    for v in (d_loss, g_loss, f_loss, m_loss):
        assert np.isfinite(float(v))
    np.testing.assert_allclose(float(m_loss), 0.1, rtol=1e-4)


def test_gantts_generator_and_discriminator():
    from cookietts_tpu.models.gantts import (
        GANTTSConfig, GANTTSDiscriminator, GANTTSGenerator)
    cfg = GANTTSConfig(
        n_symbols=40, symbols_embedding_dim=16, speaker_embedding_dim=8,
        n_mel_channels=12, z_dim=8, enc_layers=1, enc_heads=2,
        enc_ffn_dim=24, g_channels=(16, 16), d_channels=(8, 8),
        d_windows=(8, 16))
    rng = np.random.default_rng(0)
    B, N = 2, 6
    text = jnp.asarray(rng.integers(1, 40, (B, N)), jnp.int32)
    lens = jnp.asarray([6, 4], jnp.int32)
    spk = jnp.asarray([0, 1], jnp.int32)
    dur = jnp.asarray(rng.integers(1, 5, (B, N)), jnp.int32)

    gen = GANTTSGenerator(cfg)
    gvars = jax.jit(gen.init, static_argnames=("t_out", "deterministic"))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, lens, spk, dur, t_out=32, deterministic=True)
    mel, mask = jax.jit(
        gen.apply, static_argnames=("t_out", "deterministic"))(
        gvars, text, lens, spk, dur, t_out=32, deterministic=True)
    assert mel.shape == (B, 32, 12)
    # frames past total duration are zeroed
    total0 = int(np.asarray(dur)[0].sum())
    assert np.all(np.asarray(mel)[0, min(total0, 32):] == 0.0)

    disc = GANTTSDiscriminator(cfg)
    dvars = jax.jit(disc.init)(jax.random.PRNGKey(2), mel)
    logits = jax.jit(disc.apply)(dvars, mel)
    assert len(logits) == 2
    assert all(l.shape == (B,) for l in logits)


def test_gantts_train_steps():
    """Alternating BCE D/G steps (reference GANTTS/train.py:344-395):
    losses finite, D separates real from fake, mel anchor decreases."""
    from cookietts_tpu.models.gantts import (
        GANTTSConfig, GANTTSDiscriminator, GANTTSGenerator)
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.train_state import TrainState
    from cookietts_tpu.runtime.trainer import (make_gantts_train_steps,
                                               scalars_to_arrays)

    cfg = GANTTSConfig(
        n_symbols=40, symbols_embedding_dim=16, speaker_embedding_dim=8,
        n_mel_channels=12, z_dim=8, enc_layers=1, enc_heads=2,
        enc_ffn_dim=24, g_channels=(16, 16), d_channels=(8, 8),
        d_windows=(8, 16))
    rng = np.random.default_rng(0)
    B, N, T = 2, 6, 32
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, N)), jnp.int32),
        "text_lengths": jnp.asarray([6, 4], jnp.int32),
        "speaker_id": jnp.asarray([0, 1], jnp.int32),
        "durations": jnp.full((B, N), 5, jnp.int32),
        "mels": jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32),
        "mel_lengths": jnp.asarray([30, 20], jnp.int32),
    }
    gen = GANTTSGenerator(cfg)
    disc = GANTTSDiscriminator(cfg)
    g_vars = jax.jit(gen.init, static_argnames=("t_out", "deterministic"))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["text"], batch["text_lengths"], batch["speaker_id"],
        batch["durations"], t_out=T, key=jax.random.PRNGKey(2),
        deterministic=False)
    d_vars = jax.jit(disc.init)(jax.random.PRNGKey(3), batch["mels"],
                                key=jax.random.PRNGKey(4))
    g_state = TrainState.create(gen.apply, g_vars["params"], adam())
    d_state = TrainState.create(disc.apply, d_vars["params"], adam())
    # heavy mel anchor so the reconstruction trend dominates the
    # adversarial noise (z resampled per step) in few iterations
    d_step, g_step = make_gantts_train_steps(gen, disc, mel_weight=5.0)

    ctrl = scalars_to_arrays({"lr": 2e-3, "grad_clip": 10.0})
    d_hist, mel_hist = [], []
    for it in range(24):
        key = jax.random.PRNGKey(it)
        d_state, d_m = d_step(d_state, g_state, batch, key, ctrl)
        g_state, g_m = g_step(g_state, d_state, batch, key, ctrl)
        for v in (*d_m.values(), *g_m.values()):
            assert np.isfinite(float(v))
        d_hist.append(float(d_m["d_loss"]))
        mel_hist.append(float(g_m["g_mel_l1"]))
    # healthy adversarial dynamics: D hovers near the BCE equilibrium
    # (neither collapses to 0 nor explodes) and the mel anchor pulls the
    # generator toward the targets (z is resampled per step, so compare
    # window means, not single steps)
    assert 0.3 < np.mean(d_hist[-5:]) < 4.0, d_hist
    assert np.mean(mel_hist[-5:]) < np.mean(mel_hist[:5]), mel_hist


def test_denoiser_reduces_bias():
    from cookietts_tpu.models.denoiser import Denoiser
    sr = 4000
    rng = np.random.default_rng(0)
    # fake vocoder with a constant 200 Hz tonal bias
    def infer_fn(mel, key):
        t = np.arange(mel.shape[1] * 10) / sr
        bias = 0.2 * np.sin(2 * np.pi * 200 * t)
        return jnp.asarray(bias[None], jnp.float32)

    den = Denoiser(infer_fn, sampling_rate=sr, n_mel_channels=8,
                   n_frames=20)
    t = np.arange(8000) / sr
    audio = (0.2 * np.sin(2 * np.pi * 200 * t)      # the bias tone
             + 0.3 * np.sin(2 * np.pi * 700 * t))   # the "real" signal
    out = np.asarray(den(jnp.asarray(audio[None], jnp.float32),
                         strength=1.0))[0]

    def band_power(x, f):
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), 1 / sr)
        return spec[np.argmin(np.abs(freqs - f))]

    n = min(len(out), len(audio))
    assert band_power(out[:n], 200) < band_power(audio[:n], 200) * 0.5
    assert band_power(out[:n], 700) > band_power(audio[:n], 700) * 0.6


def test_gan_postnet_and_discriminator():
    from cookietts_tpu.models.gan_postnet import (
        GANDiscriminator, GANPostnet, GANPostnetConfig, gan_postnet_losses)
    cfg = GANPostnetConfig(n_mel_channels=12, speaker_embedding_dim=6,
                           noise_dim=4, n_convolutions=3, embedding_dim=16,
                           residual_connections=2)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 18, 12)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32)

    post = GANPostnet(cfg)
    pvars = jax.jit(post.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), mel, spk, deterministic=True)
    refined = jax.jit(post.apply, static_argnames=("deterministic",))(
        pvars, mel, spk, key=jax.random.PRNGKey(1), deterministic=True)
    assert refined.shape == mel.shape

    disc = GANDiscriminator(cfg)
    dvars = jax.jit(disc.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(2), mel, spk, deterministic=True)
    fakeness = jax.jit(disc.apply, static_argnames=("deterministic",))(
        dvars, refined, spk, deterministic=True)
    assert fakeness.shape == (2,)
    f = np.asarray(fakeness)
    assert np.all((f >= 0) & (f <= 1))

    g_loss, d_loss = gan_postnet_losses(
        jnp.asarray([0.1, 0.2]), fakeness)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))


def test_gan_postnet_train_steps_adversarial_dynamics(tmp_path):
    """G/D steps for the ssvae adversarial postnet: the discriminator
    learns to separate real/fake; the generator's mel MSE decreases
    (reference tacotron2_ssvae/model.py:183-316)."""
    from cookietts_tpu.models.gan_postnet import (GANDiscriminator,
                                                  GANPostnet,
                                                  GANPostnetConfig)
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.train_state import TrainState
    from cookietts_tpu.runtime.trainer import (
        make_gan_postnet_train_steps, scalars_to_arrays)

    cfg = GANPostnetConfig(n_mel_channels=8, speaker_embedding_dim=4,
                           noise_dim=4, n_convolutions=3, embedding_dim=12,
                           residual_connections=0)
    post = GANPostnet(cfg)
    disc = GANDiscriminator(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 10
    batch = {
        "decoder_mel": jnp.asarray(
            rng.standard_normal((B, T, 8)), jnp.float32),
        "gt_mel": jnp.asarray(rng.standard_normal((B, T, 8)), jnp.float32),
        "speaker_embed": jnp.asarray(
            rng.standard_normal((B, 4)), jnp.float32),
    }
    gvars = post.init({"params": jax.random.PRNGKey(0)},
                      batch["decoder_mel"], batch["speaker_embed"],
                      key=jax.random.PRNGKey(1), deterministic=False)
    dvars = disc.init({"params": jax.random.PRNGKey(2)}, batch["gt_mel"],
                      batch["speaker_embed"], deterministic=False)
    g_state = TrainState.create(
        post.apply, gvars["params"], adam(),
        {k: v for k, v in gvars.items() if k != "params"})
    d_state = TrainState.create(
        disc.apply, dvars["params"], adam(),
        {k: v for k, v in dvars.items() if k != "params"})
    d_step, g_step = make_gan_postnet_train_steps(post, disc)
    ctrl = scalars_to_arrays({"lr": 2e-3, "grad_clip": 10.0})

    m0 = None
    for i in range(12):
        key = jax.random.PRNGKey(i)
        d_state, d_m = d_step(d_state, g_state, batch, key, ctrl)
        g_state, g_m = g_step(g_state, d_state, batch, key, ctrl)
        if m0 is None:
            m0 = float(g_m["g_mel_MSE"])
    assert np.isfinite(float(g_m["g_loss"]))
    assert np.isfinite(float(d_m["d_loss"]))
    assert float(g_m["g_mel_MSE"]) < m0           # refinement learns
    # discriminator separates: real fakeness < fake fakeness
    assert float(d_m["d_real"]) < float(d_m["d_fake"])


def test_hifigan_denoiser_staged_training():
    """Stage 0 trains spectral-only (D untouched); stage 2 is pure
    adversarial BCE over the SUMMED critic logits
    (reference HiFiGAN_Denoiser/model.py:59-175)."""
    from cookietts_tpu.models.hifigan_denoiser import (
        DenoiserWN, HiFiGANDenoiserConfig, MultiResSpect,
        SpectDiscriminator, WaveDiscriminator, log_compress)
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.train_state import TrainState
    from cookietts_tpu.runtime.trainer import (
        make_hifigan_denoiser_train_steps, scalars_to_arrays)

    cfg = HiFiGANDenoiserConfig(
        wn_layers=2, wn_channels=8, wn_dilations=None,
        postnet_layers=2, postnet_channels=8, postnet_kernel_size=4,
        window_lengths=(64, 128), hop_lengths=(16, 32),
        dw_n_discriminators=2, dw_kernel_sizes=(5, 3),
        dw_strides=(2, 1), dw_channels=(4, 1), dw_group_sizes=(1, 1),
        ds_block_confs=((2, 3, 1, 2, 4),))
    gen, dw, ds = DenoiserWN(cfg), WaveDiscriminator(cfg), \
        SpectDiscriminator(cfg)
    mrs = MultiResSpect(cfg.window_lengths, cfg.hop_lengths)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(0.3 * np.sin(
        2 * np.pi * 100 * np.arange(512) / 512)[None, :], jnp.float32)
    noisy = clean + jnp.asarray(
        0.05 * rng.standard_normal((1, 512)), jnp.float32)
    batch = {"noisy": noisy, "clean": clean}

    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), noisy)
    dwv = jax.jit(dw.init)(jax.random.PRNGKey(1), clean)
    dsv = jax.jit(ds.init)(jax.random.PRNGKey(2),
                           log_compress(mrs(clean)))
    g_state = TrainState.create(gen.apply, gvars["params"], adam())
    d_state = TrainState.create(None, (dwv["params"], dsv["params"]),
                                adam())
    ctrl = scalars_to_arrays({"lr": 1e-3, "grad_clip": 10.0})

    # stage 0: spectral-only, d_step is a no-op
    d0, g0 = make_hifigan_denoiser_train_steps(gen, dw, ds, mrs, stage=0)
    d_state2, d_m = d0(d_state, g_state, batch, ctrl)
    assert d_state2 is d_state and float(d_m["d_loss"]) == 0.0
    losses = []
    for i in range(6):
        g_state, g_m = g0(g_state, d_state, batch, ctrl)
        losses.append(float(g_m["loss"]))
    assert losses[-1] < losses[0]
    assert "adv" not in g_m

    # stage 2: adversarial terms appear and both sides step
    d2, g2 = make_hifigan_denoiser_train_steps(gen, dw, ds, mrs, stage=2)
    d_state, d_m = d2(d_state, g_state, batch, ctrl)
    g_state, g_m = g2(g_state, d_state, batch, ctrl)
    assert np.isfinite(float(d_m["d_loss"])) and float(d_m["d_loss"]) > 0
    assert "adv" in g_m and np.isfinite(float(g_m["adv"]))


def test_hifigan_fused_resblocks_match_stock():
    """The inference-only fused Pallas MRF path (infer=True,
    ops/pallas_kernels.hifigan_resblock) equals the stock generator —
    interpret mode on CPU (weight-norm folding included)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig
    cfg = HiFiGANConfig(
        n_mel_channels=8, upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5), resblock_dilations=((1, 2), (1, 2)),
        pallas_tile=256, pallas_resblocks=True)
    g = Generator(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 40, 8)), jnp.float32)
    v = g.init(jax.random.PRNGKey(0), mel)
    y_ref = g.apply(v, mel)
    y_fused = g.apply(v, mel, infer=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-6, rtol=1e-5)
