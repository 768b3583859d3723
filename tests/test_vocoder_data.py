"""DTW alignment + Mel2Samp dataset + vocoder train/val step tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.data import audio_io
from cookietts_tpu.data.mel2samp import (
    Mel2Samp, Mel2SampConfig, collate_mel2samp, load_map_file)
from cookietts_tpu.ops.dtw import dtw_align


def test_dtw_recovers_shift():
    """A mel shifted by 1 frame must be re-aligned (almost) exactly."""
    rng = np.random.default_rng(0)
    target = rng.standard_normal((1, 20, 4)).astype(np.float32)
    pred = np.roll(target, 1, axis=1)         # shifted by +1 frame
    aligned = np.asarray(dtw_align(jnp.asarray(pred), jnp.asarray(target),
                                   scale_factor=1, range_=3))
    base_err = np.abs(pred - target).mean()
    new_err = np.abs(aligned - target).mean()
    assert new_err < base_err * 0.2


def test_dtw_identity_unchanged():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 4)).astype(np.float32)
    aligned = np.asarray(dtw_align(jnp.asarray(x), jnp.asarray(x),
                                   scale_factor=3, range_=3))
    np.testing.assert_allclose(aligned, x, atol=1e-5)


@pytest.fixture
def wav_dataset(tmp_path):
    """Two tiny 48 kHz wavs + one GTA mel + a map file."""
    cfg = Mel2SampConfig(segment_length=2400, sampling_rate=48000,
                         filter_length=512, hop_length=120, win_length=512,
                         n_mel_channels=20, mel_fmax=16000.0,
                         load_from_disk_dtw=False)
    rng = np.random.default_rng(0)
    entries = []
    for i in range(2):
        wav = str(tmp_path / f"a{i}.wav")
        audio = (0.3 * np.sin(2 * np.pi * 220 * (1 + i)
                              * np.arange(9600) / 48000)).astype(np.float32)
        audio += 0.01 * rng.standard_normal(9600).astype(np.float32)
        audio_io.save_wav(wav, audio, 48000)
        entries.append((wav, None, i))
    ds = Mel2Samp(entries, cfg, seed=7)
    # GTA mel sidecar for file 0
    audio0, _ = audio_io.load_wav(entries[0][0])
    gta = ds.get_mel(audio0) + 0.01
    mel_path = entries[0][0] + ".mel.npy"
    np.save(mel_path, gta)
    entries[0] = (entries[0][0], mel_path, 0)
    map_path = str(tmp_path / "map_train_0.txt")
    with open(map_path, "w") as f:
        for wav, mel, spk in entries:
            f.write(f"{wav}|{mel or ''}|{spk}\n")
    return cfg, entries, ds, map_path


def test_map_file_roundtrip(wav_dataset):
    cfg, entries, ds, map_path = wav_dataset
    loaded = load_map_file(map_path)
    assert loaded[0][1] is not None and loaded[1][1] is None
    assert [e[2] for e in loaded] == [0, 1]


def test_mel2samp_segments(wav_dataset):
    cfg, entries, ds, _ = wav_dataset
    item = ds[1]
    assert item["audio"].shape == (cfg.segment_length,)
    assert item["mel"].shape[1] == cfg.n_mel_channels
    assert item["mel"].shape[0] >= cfg.segment_length // cfg.hop_length
    assert np.std(item["audio"]) > 0   # silence rejection worked


def test_mel2samp_gta_probability(wav_dataset):
    cfg, entries, ds, _ = wav_dataset
    ds.cfg.load_mel_from_disk = 1.0    # always use GTA mel
    ds.entries = entries
    item = ds[0]
    assert item["mel"].shape[1] == cfg.n_mel_channels


def test_mel2samp_rejection_resamples_not_crashes(wav_dataset, tmp_path):
    """A GTA segment over max_l1_err substitutes a DIFFERENT random
    entry (the reference's FileNotSuitable loop) instead of killing the
    training run; thresholds that reject everything raise one clear
    diagnosis."""
    import dataclasses

    import pytest

    from cookietts_tpu.data.mel2samp import (FileNotSuitableException,
                                             Mel2Samp)
    cfg, entries, ds, _ = wav_dataset
    # entry 0: a garbage GTA mel that always misses the L1 gate
    bad_mel = str(tmp_path / "bad.mel.npy")
    audio0, _ = audio_io.load_wav(entries[0][0])
    np.save(bad_mel, ds.get_mel(audio0) + 50.0)
    ents = [(entries[0][0], bad_mel, 0), entries[1]]
    cfg2 = dataclasses.replace(cfg, load_mel_from_disk=1.0,
                               load_from_disk_dtw=False, max_l1_err=1.0)
    ds2 = Mel2Samp(ents, cfg2, seed=3)
    item = ds2[0]                       # resampled to the clean entry
    assert item["audiopath"] == ents[1][0]
    # every entry rejected -> a diagnosis, not a bare exception
    ds3 = Mel2Samp([ents[0]], cfg2, seed=3)
    with pytest.raises(FileNotSuitableException, match="thresholds"):
        ds3[0]


def test_mel2samp_short_gta_mel_keeps_static_shape(wav_dataset, tmp_path):
    """A GTA dump a few frames short of len(audio)//hop must still yield
    the full mel_seg rows (a short slice would make collate min-crop the
    WHOLE batch and change the jit shape per batch)."""
    import dataclasses

    from cookietts_tpu.data.mel2samp import Mel2Samp
    cfg, entries, ds, _ = wav_dataset
    audio0, _ = audio_io.load_wav(entries[0][0])
    short = ds.get_mel(audio0)[:-5]           # 5 frames short
    short_mel = str(tmp_path / "short.mel.npy")
    np.save(short_mel, short)
    cfg2 = dataclasses.replace(cfg, load_mel_from_disk=1.0,
                               load_from_disk_dtw=False)
    ds2 = Mel2Samp([(entries[0][0], short_mel, 0)], cfg2, seed=5)
    mel_seg = cfg.segment_length // cfg.hop_length + 1
    for _ in range(4):
        assert ds2[0]["mel"].shape[0] == mel_seg


def test_collate(wav_dataset):
    cfg, entries, ds, _ = wav_dataset
    batch = collate_mel2samp([ds[0], ds[1]])
    assert batch["audio"].shape[0] == 2
    assert batch["mels"].shape[0] == 2
    assert batch["speaker_id"].tolist() == [0, 1]


def test_waveglow_train_and_val_step(wav_dataset):
    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.train_state import TrainState
    from cookietts_tpu.runtime.trainer import (
        make_waveglow_train_step, make_waveglow_val_step,
        scalars_to_arrays)

    cfg, entries, ds, _ = wav_dataset
    wg_cfg = WaveGlowConfig(
        n_mel_channels=20, n_flows=2, n_group=4, n_early_every=0,
        n_layers=1, n_channels=8, hop_length=120, upsample_strides=(5, 6),
        upsample_channels=8, memory_efficient=False)
    model = WaveGlow(wg_cfg)
    batch = collate_mel2samp([ds[0], ds[1]])
    batch_dev = {"audio": jnp.asarray(batch["audio"]),
                 "mels": jnp.asarray(batch["mels"])}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch_dev["audio"], batch_dev["mels"])
    state = TrainState.create(model.apply, variables["params"], adam())

    train_step = make_waveglow_train_step(model, donate=False)
    ctrl = scalars_to_arrays({"lr": 1e-4, "grad_clip": 100.0})
    losses = []
    for i in range(3):
        state, metrics = train_step(state, batch_dev,
                                    jax.random.PRNGKey(i), ctrl)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]      # NLL decreases on repeated batch

    val_step = make_waveglow_val_step(
        model, stft_windows=((256, 64, 256),))
    val = val_step(state, batch_dev, jax.random.PRNGKey(9))
    assert np.isfinite(float(val["val_MSE"]))
    assert np.isfinite(float(val["val_MAE"]))


def test_gaussian_blur_mel():
    from cookietts_tpu.data.mel2samp import gaussian_blur_mel
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((6, 20)).astype(np.float32)
    out = gaussian_blur_mel(mel, strength=1.0)
    assert out.shape == mel.shape
    # smoothing reduces channel-axis variation
    assert np.abs(np.diff(out, axis=1)).mean() < \
        np.abs(np.diff(mel, axis=1)).mean()
    # kernel is (nearly) mass-preserving on a constant input
    const = np.ones((3, 16), np.float32)
    np.testing.assert_allclose(gaussian_blur_mel(const), const, atol=1e-2)


def test_mel2samp_hidden_state_conditioning(tmp_path):
    """'.hdn{offset}.npy' files replace the mel as vocoder conditioning,
    with the offset trimming the audio (reference mel2samp.py:274-292)."""
    from cookietts_tpu.data import audio_io
    from cookietts_tpu.data.mel2samp import (Mel2Samp, Mel2SampConfig,
                                             load_map_file)
    sr = 48000
    audio = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
             ).astype(np.float32)
    wav = str(tmp_path / "h.wav")
    audio_io.save_wav(wav, audio, sr)
    hdn = np.random.default_rng(0).standard_normal((799, 24)
                                                   ).astype(np.float32)
    hdn_path = wav + ".hdn.npy"
    np.save(hdn_path, hdn)
    map_path = str(tmp_path / "map.txt")
    with open(map_path, "w") as f:
        f.write(f"{wav}||3|{hdn_path}\n")
    entries = load_map_file(map_path)
    assert entries[0][3] == hdn_path
    cfg = Mel2SampConfig(segment_length=2400, filter_length=240,
                         hop_length=60, win_length=240, n_mel_channels=8,
                         load_hidden_from_disk=True)
    ds = Mel2Samp(entries, cfg)
    item = ds[0]
    assert item["mel"].shape[1] == 24          # hidden dim, not n_mel
    assert item["audio"].shape[0] == 2400
    assert item["speaker_id"] == 3
