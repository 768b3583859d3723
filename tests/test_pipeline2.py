"""Tests for preprocess/filelist/extract/mfa-parse/plotting +
HiFiGAN train steps + HiFiGAN-denoiser pieces."""
import dataclasses
import os
import tarfile
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.data import audio_io
from cookietts_tpu.data.extract import extract, is_archive
from cookietts_tpu.data.filelist import (
    generate_filelist_from_datasets, load_filelist, write_filelists)
from cookietts_tpu.data.mfa import (
    durations_from_textgrid, oov_words, parse_textgrid)
from cookietts_tpu.pipeline.preprocess import (
    PreprocessConfig, extract_archives_recursively,
    process_audio_multiprocess, run_preprocess)


def _make_lj_dataset(root, n=4, sr=22050, dur_s=1.2):
    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        t = np.arange(int(sr * dur_s)) / sr
        audio = (0.2 * np.sin(2 * np.pi * 200 * (i + 1) * t)
                 + 0.005 * rng.standard_normal(len(t))).astype(np.float32)
        p = os.path.join(root, "wavs", f"LJ-{i:04d}.wav")
        audio_io.save_wav(p, audio, sr)
        lines.append(f"wavs/LJ-{i:04d}.wav|Transcript number {i} here.|x")
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("\n".join(lines))


def test_extract_zip_and_tar(tmp_path):
    src = tmp_path / "data.txt"
    src.write_text("hello")
    zpath = str(tmp_path / "a.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(str(src), "data.txt")
    tpath = str(tmp_path / "b.tar.gz")
    with tarfile.open(tpath, "w:gz") as t:
        t.add(str(src), "data2.txt")
    out = str(tmp_path / "out")
    assert is_archive(zpath) and is_archive(tpath)
    extract(zpath, out)
    extract(tpath, out)
    assert (tmp_path / "out" / "data.txt").exists()
    assert (tmp_path / "out" / "data2.txt").exists()


def test_preprocess_end_to_end(tmp_path):
    root = str(tmp_path / "LJ")
    _make_lj_dataset(root)
    cfg = PreprocessConfig(dataset_dirs=(root,), target_sr=16000,
                           highpass_hz=(40.0,), trim_passes=1,
                           min_duration=0.2,
                           out_dir=str(tmp_path / "out"))
    result = run_preprocess(cfg)
    # audio got resampled
    a, sr = audio_io.load_wav(os.path.join(root, "wavs", "LJ-0000.wav"))
    assert sr == 16000
    # filelists written and parseable
    train = load_filelist(str(tmp_path / "out" / "filelist_train.txt"))
    val = load_filelist(str(tmp_path / "out" / "filelist_validation.txt"))
    assert len(train) + len(val) == 4
    assert all("Transcript" in e["quote"] for e in train + val)
    assert os.path.exists(str(tmp_path / "out" / "speaker_info.txt"))
    assert os.path.exists(str(tmp_path / "out" / "meta_dump.json"))


def test_filelist_speaker_ids(tmp_path):
    root = str(tmp_path / "LJ2")
    _make_lj_dataset(root)
    result = generate_filelist_from_datasets(
        [root], min_duration=0.2, val_fraction=0.25)
    assert result["speaker_ids"] == {"LJ2": 0}
    assert all(m["speaker_id"] == 0
               for m in result["train"] + result["validation"])
    assert len(result["validation"]) >= 1


def test_filelist_mixed_emotion_datasets(tmp_path):
    """Clipper datasets carry emotion labels; everything else defaults
    emotions=["unknown"] (metadata.py:172). Mixing them must not hand
    every unlabeled clip a REAL supervised class — unlabeled stays -1,
    the semi-supervised 'unknown' id, through the filelist write/load
    roundtrip. '|' in transcripts is escaped so columns never shift."""
    import wave

    lj = str(tmp_path / "LJ3")
    _make_lj_dataset(lj)
    clip = tmp_path / "clipper" / "Sliced Dialogue"
    name = "00_00_05_Twilight_Neutral__Hello there.wav"
    sr = 22050
    audio = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
             ).astype(np.float32)
    os.makedirs(str(clip), exist_ok=True)
    audio_io.save_wav(str(clip / name), audio, sr)
    with open(str(clip / (name[:-4] + ".txt")), "w") as f:
        f.write("Hello there | friend.")      # embedded separator

    result = generate_filelist_from_datasets(
        [lj, str(tmp_path / "clipper")], min_duration=0.2,
        val_fraction=0.0, val_min_per_speaker=0)
    assert result["emotion_ids"] == {"neutral": 0}
    by_ds = {}
    for m in result["train"] + result["validation"]:
        by_ds.setdefault(m["dataset"], []).append(m)
    assert all(m["emotion_id"] == -1 for m in by_ds["LJ3"])
    assert all(m["emotion_id"] == 0 for m in by_ds["clipper"])

    out = str(tmp_path / "out_mixed")
    write_filelists(result, out, per_dataset=False)
    loaded = load_filelist(os.path.join(out, "filelist_train.txt"))
    assert len(loaded) == len(result["train"])
    for e in loaded:
        assert isinstance(e["speaker_id"], int)
        if "Hello there" in e["quote"]:
            assert "|" not in e["quote"]           # escaped to '/'
            assert e["emotion_id"] == 0
        elif "Transcript" in e["quote"]:
            assert e.get("emotion_id", -1) == -1   # unlabeled


_TEXTGRID = '''File type = "ooTextFile"
Object class = "TextGrid"
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        intervals [1]:
            xmin = 0.0
            xmax = 0.5
            text = "hello"
        intervals [2]:
            xmin = 0.5
            xmax = 1.0
            text = "world"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        intervals [1]:
            xmin = 0.0
            xmax = 0.25
            text = "HH"
        intervals [2]:
            xmin = 0.25
            xmax = 1.0
            text = "AH0"
'''


def test_parse_textgrid_and_durations(tmp_path):
    p = str(tmp_path / "x.TextGrid")
    with open(p, "w") as f:
        f.write(_TEXTGRID)
    tiers = parse_textgrid(p)
    assert [t[2] for t in tiers["words"]] == ["hello", "world"]
    durs = durations_from_textgrid(tiers, "phones", hop_seconds=0.05)
    assert durs == [5, 15]


def test_oov_words():
    lex = {"HELLO": "HH AH L OW"}
    assert oov_words(["Hello zorp"], lex) == ["zorp"]


def test_denoiser_dataset(tmp_path):
    """Noisy/clean pair synthesis (reference HiFiGAN_Denoiser
    mel2samp.py:216-248): static segment shapes, corruption applied,
    SNR-scaled noise mixing when noise files are given."""
    from cookietts_tpu.data import audio_io
    from cookietts_tpu.data.denoiser_data import (DenoiserDataConfig,
                                                  DenoiserDataset,
                                                  collate_denoiser)

    sr = 8000
    t = np.arange(sr) / sr
    clean_path = str(tmp_path / "c.wav")
    audio_io.save_wav(clean_path,
                      (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32),
                      sr)
    noise_path = str(tmp_path / "n.wav")
    rng = np.random.default_rng(0)
    audio_io.save_wav(noise_path,
                      (0.2 * rng.standard_normal(sr // 4)).astype(np.float32),
                      sr)   # shorter than a segment -> exercises tiling

    cfg = DenoiserDataConfig(
        segment_length=2048, sampling_rate=sr, min_snr_db=0.0,
        max_snr_db=10.0, min_augmented_sample_rate=4000,
        max_augmented_sample_rate=sr)
    ds = DenoiserDataset([clean_path], cfg, noise_files=[noise_path])
    batch = collate_denoiser([ds[0], ds[0]])
    assert batch["noisy"].shape == batch["clean"].shape == (2, 2048)
    assert np.all(np.abs(batch["noisy"]) <= 1.0)
    # corruption actually happened and differs between draws
    assert not np.allclose(batch["noisy"][0], batch["clean"][0])
    assert not np.allclose(batch["noisy"][0], batch["noisy"][1])


def test_arpa_from_alignment():
    from cookietts_tpu.data.mfa import arpa_from_alignment

    words = [(0.0, 0.4, "hello"), (0.4, 0.5, ""), (0.5, 1.0, "world")]
    phones = [(0.0, 0.2, "HH"), (0.2, 0.4, "AH0"), (0.4, 0.5, "sp"),
              (0.5, 0.7, "W"), (0.7, 1.0, "ER1")]
    out = arpa_from_alignment('Hello, "world!"', words, phones)
    # punctuation peeled and re-attached around the phone groups
    assert out == '{HH AH0}, "{W ER1}!"'
    # words with no remaining alignment stay as graphemes
    assert arpa_from_alignment("hello world extra", words, phones) \
        == "{HH AH0} {W ER1} extra"
    # standalone punctuation / empty tokens must NOT consume a phone
    # group (they have no MFA word interval)
    assert arpa_from_alignment("hello - world", words, phones) \
        == "{HH AH0} - {W ER1}"
    assert arpa_from_alignment("hello  world", words, phones) \
        == "{HH AH0}  {W ER1}"


def test_ensure_mfa_reuses_existing(tmp_path):
    from cookietts_tpu.data.mfa import ensure_mfa

    binary = tmp_path / "montreal-forced-aligner" / "bin" / "mfa_align"
    binary.parent.mkdir(parents=True)
    binary.write_text("#!/bin/sh\n")
    assert ensure_mfa(str(tmp_path)) == str(binary)


def test_plotting_images():
    from cookietts_tpu.runtime.plotting import (
        plot_alignment, plot_gate, plot_spectrogram)
    a = np.random.default_rng(0).random((20, 10))
    img = plot_alignment(a, info="test")
    assert img.ndim == 3 and img.shape[2] == 3
    img2 = plot_spectrogram(np.random.default_rng(1).random((30, 8)))
    assert img2.ndim == 3
    img3 = plot_gate(np.zeros(20), np.linspace(-3, 3, 20))
    assert img3.ndim == 3


def test_hifigan_train_steps():
    from cookietts_tpu.models.hifigan import (
        Generator, HiFiGANConfig, MultiPeriodDiscriminator,
        MultiScaleDiscriminator)
    from cookietts_tpu.runtime.optim import adam
    from cookietts_tpu.runtime.train_state import TrainState
    from cookietts_tpu.runtime.trainer import (
        make_hifigan_train_steps, scalars_to_arrays)

    cfg = HiFiGANConfig(
        n_mel_channels=8, resblock_kernel_sizes=(3,),
        resblock_dilations=((1,),), upsample_rates=(4,),
        upsample_kernel_sizes=(8,), upsample_initial_channel=16,
        mpd_periods=(2,), msd_scales=1)
    gen = Generator(cfg)
    mpd = MultiPeriodDiscriminator(cfg)
    msd = MultiScaleDiscriminator(cfg)

    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((2, 64)) * 0.1, jnp.float32)
    batch = {"mels": mels, "audio": audio}

    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mels)
    fake = gen.apply(gvars, mels)
    mpd_vars = jax.jit(mpd.init)(jax.random.PRNGKey(1), audio, fake)
    msd_vars = jax.jit(msd.init)(jax.random.PRNGKey(2), audio, fake)

    g_state = TrainState.create(gen.apply, gvars["params"], adam())
    d_state = TrainState.create(
        None, (mpd_vars["params"], msd_vars["params"]), adam())

    def mel_fn(a):   # toy mel: framed abs-mean, keeps the loss jittable
        return jnp.abs(a).reshape(a.shape[0], 16, 4).mean(-1, keepdims=True)

    d_step, g_step = make_hifigan_train_steps(gen, mpd, msd, mel_fn)
    ctrl = scalars_to_arrays({"lr": 2e-4, "grad_clip": 100.0})
    d_state, d_metrics = d_step(d_state, g_state, batch, ctrl)
    g_state, g_metrics = g_step(g_state, d_state, batch, ctrl)
    for k in ("d_loss",):
        assert np.isfinite(float(d_metrics[k]))
    for k in ("g_adv", "g_fm", "g_mel_l1", "g_loss"):
        assert np.isfinite(float(g_metrics[k]))


def test_hifigan_denoiser():
    from cookietts_tpu.models.hifigan_denoiser import (
        DenoiserWN, HiFiGANDenoiserConfig, MultiResSpect,
        SpectDiscriminator, WaveDiscriminator, denoiser_loss,
        log_compress)
    cfg = HiFiGANDenoiserConfig(
        wn_layers=2, wn_channels=8, wn_dilations=None,
        postnet_layers=2, postnet_channels=8, postnet_kernel_size=4,
        window_lengths=(64, 128), hop_lengths=(16, 32),
        dw_n_discriminators=2, dw_kernel_sizes=(5, 3),
        dw_strides=(2, 1), dw_channels=(4, 1), dw_group_sizes=(1, 1),
        ds_block_confs=((2, 3, 1, 2, 4),))
    rng = np.random.default_rng(0)
    clean = jnp.asarray(0.3 * np.sin(
        2 * np.pi * 100 * np.arange(512) / 4000)[None], jnp.float32)
    noisy = clean + 0.05 * jnp.asarray(
        rng.standard_normal((1, 512)), jnp.float32)

    model = DenoiserWN(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), noisy)
    out = jax.jit(model.apply)(variables, noisy)
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()

    # stage >= 1 routes through the PostNet head
    cfg1 = dataclasses.replace(cfg, stage=1)
    out1 = jax.jit(DenoiserWN(cfg1).apply)(
        jax.jit(DenoiserWN(cfg1).init)(jax.random.PRNGKey(0), noisy),
        noisy)
    assert out1.shape == noisy.shape

    mrs = MultiResSpect(cfg.window_lengths, cfg.hop_lengths)
    dw = WaveDiscriminator(cfg)
    ds = SpectDiscriminator(cfg)
    dw_vars = jax.jit(dw.init)(jax.random.PRNGKey(1), out)
    spect = log_compress(mrs(out))
    ds_vars = jax.jit(ds.init)(jax.random.PRNGKey(2), spect)
    dw_logit = dw.apply(dw_vars, out)
    ds_logit = ds.apply(ds_vars, spect)
    assert dw_logit.shape == (1,) and ds_logit.shape == (1,)
    total, ld = denoiser_loss(mrs, out, clean, stage=2,
                              dw_fake=dw_logit, ds_fake=ds_logit)
    assert np.isfinite(float(total))
    assert "adv" in ld
    # pre-adversarial loss carries the reference's spectral + audio L1
    total0, ld0 = denoiser_loss(mrs, out, clean, stage=0)
    assert "spec_L1" in ld0 and "audio_L1" in ld0


def test_preprocess_output_inventory_and_fixes(tmp_path):
    """run_preprocess reproduces the reference driver's output-file
    inventory (start_preprocess.py:416-675): all-in-one + per-dataset
    filelists, speaker/emotion info, meta_dump.json, missing_vocab.txt;
    dataset-specific fixes delete Clipper noisy clips and pick a VCTK mic."""
    import numpy as np
    from cookietts_tpu.data import audio_io
    from cookietts_tpu.pipeline.preprocess import (PreprocessConfig,
                                                   run_preprocess)

    sr = 22050
    t = np.arange(sr) / sr

    def wav(path, f=220.0):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        audio_io.save_wav(path, (0.3 * np.sin(2 * np.pi * f * t)
                                 ).astype(np.float32), sr)

    # Clipper-style dataset with a noisy clip that must be deleted
    clip = tmp_path / "Clipper_MLP"
    good = "00_00_00_Twilight_Neutral__Hello there friend"
    noisy = "00_00_01_Twilight_Neutral_Noisy_Bad clip here"
    for stem in (good, noisy):
        wav(str(clip / f"{stem}.wav"))
        with open(str(clip / f"{stem}.txt"), "w") as f:
            f.write(stem.split("_")[-1] + ".")

    # VCTK-style dataset with mic1/mic2 variants
    vctk = tmp_path / "VCTK"
    wav(str(vctk / "p225" / "p225_001_mic1.wav"), 300.0)
    wav(str(vctk / "p225" / "p225_001_mic2.wav"), 300.0)
    with open(str(vctk / "p225" / "p225_001.txt"), "w") as f:
        f.write("Please call Stella.")

    # tiny lexicon so the missing-vocab dump has something to check
    lex = str(tmp_path / "merged.dict")
    with open(lex, "w") as f:
        f.write("HELLO HH AH0 L OW1\nPLEASE P L IY1 Z\nCALL K AO1 L\n")

    out = str(tmp_path / "out")
    cfg = PreprocessConfig(
        dataset_dirs=[str(clip), str(vctk)], target_sr=sr,
        min_duration=0.2, out_dir=out, delete_noisy=True,
        delete_very_noisy=True, arpa_dict_path=lex, trim_passes=1)
    result = run_preprocess(cfg)

    # fixes applied
    assert not any("Noisy" in p for p in os.listdir(str(clip)))
    assert os.path.exists(str(vctk / "p225" / "p225_001.wav"))
    assert not os.path.exists(str(vctk / "p225" / "p225_001_mic2.wav"))

    # output inventory
    for fname in ("filelist_train.txt", "filelist_validation.txt",
                  "speaker_info.txt", "emotion_info.txt", "meta_dump.json",
                  "missing_vocab.txt", "preprocess_config.json"):
        assert os.path.exists(os.path.join(out, fname)), fname
    # per-dataset filelists
    assert os.path.exists(os.path.join(out, "Clipper_MLP",
                                       "filelist_train.txt"))
    # missing vocab: words not in the tiny lexicon
    missing = open(os.path.join(out, "missing_vocab.txt")).read()
    assert "stella" in missing and "hello" not in missing

    # phoneme transcripts survive a filelist round-trip
    entries = load_filelist(os.path.join(out, "filelist_train.txt")) + \
        load_filelist(os.path.join(out, "filelist_validation.txt"))
    assert any("{HH AH0 L OW1}" in e.get("phoneme_transcript", "")
               for e in entries)


def test_download_url_selection_and_methods(tmp_path, monkeypatch):
    """LibriTTS clean/other split selection (start_download.py:56-68) and
    the Clipper master-folder dispatch (download_clipper.py:22-30)."""
    from cookietts_tpu.pipeline import download as dl

    fetched = []
    monkeypatch.setattr(dl, "download_http",
                        lambda url, dest, progress=None: (
                            fetched.append(url), dest)[1])
    entry = {"name": "LibriTTS", "dest": str(tmp_path / "lt"),
             "urls_clean": ["http://x/clean1.tar", "http://x/clean2.tar"],
             "urls_other": ["http://x/other.tar"],
             "download_clean": True, "download_other": False,
             "extract": False}
    dl.download_dataset(entry)
    assert fetched == ["http://x/clean1.tar", "http://x/clean2.tar"]

    fetched.clear()
    entry["download_other"] = True
    # already-"downloaded" files are skipped, so point at a fresh dest
    entry["dest"] = str(tmp_path / "lt2")
    dl.download_dataset(entry)
    assert "http://x/other.tar" in fetched

    # clipper master folder dispatches to mega
    called = {}
    monkeypatch.setattr(dl, "download_mega",
                        lambda url, dest: called.update(url=url) or dest)
    dl.download_dataset({"name": "Clipper_MLP", "method": "clipper_master",
                         "dest": str(tmp_path / "clip"),
                         "url": "mega://folder"})
    assert called["url"] == "mega://folder"


def test_preprocess_on_device_feature_dump_feeds_dataset_cache(tmp_path):
    """The fused on-device feature step writes REAL TTSDataset cache
    sidecars: the hash-keyed mel matches the host mirror INCLUDING tail
    frames (each bucket row is padded with the clip's own reflection),
    the len sidecar matches, .gt.f0/.gt.energy ride the same frame grid,
    and a TTSDataset with the matching DataConfig serves the mel from
    cache without recomputing."""
    import numpy as np
    from cookietts_tpu.audio.stft import TacotronSTFT
    from cookietts_tpu.data import audio_io
    from cookietts_tpu.data.dataset import (DataConfig, TTSDataset,
                                            mel_cache_hash)
    from cookietts_tpu.pipeline.preprocess import (PreprocessConfig,
                                                   dump_features_on_device)

    sr = 16000
    paths = []
    for i, secs in enumerate((0.5, 0.9)):
        t = np.arange(int(sr * secs)) / sr
        audio = (0.3 * np.sin(2 * np.pi * 220 * (i + 1) * t)).astype(
            np.float32)
        p = str(tmp_path / f"c{i}.wav")
        audio_io.save_wav(p, audio, sr)
        paths.append(p)

    cfg = PreprocessConfig(
        target_sr=sr, target_lufs=None, on_device_features=True,
        feature_batch=2, filter_length=512, hop_length=128,
        win_length=512, n_mel_channels=20, mel_fmin=0.0, mel_fmax=8000.0)
    n = dump_features_on_device(paths, cfg)
    assert n == 2

    dcfg = DataConfig(sampling_rate=sr, filter_length=512, hop_length=128,
                      win_length=512, n_mel_channels=20, mel_fmin=0.0,
                      mel_fmax=8000.0, trim_enable=False, target_lufs=None,
                      p_arpabet=0.0)
    h = mel_cache_hash(dcfg)
    stft = TacotronSTFT(512, 128, 512, 20, sr, 0.0, 8000.0)
    for p in paths:
        mel = np.load(p + f".{h}.mel.npy")
        f0 = np.load(p + ".gt.f0.npy")
        energy = np.load(p + ".gt.energy.npy")
        assert mel.shape[0] == f0.shape[0] == energy.shape[0]
        assert int(np.load(p + f".{h}.len.npy")) == mel.shape[0]
        audio, _ = audio_io.load_wav(p, target_sr=sr)
        host = stft.mel_spectrogram_np(audio_io.remove_dc_offset(audio))
        # FULL parity incl. the boundary frames: the bucket pad carries
        # each clip's own tail reflection, so the device windows see
        # exactly what the host reflect-pad produces
        m = min(len(host), len(mel))
        assert m == len(mel)
        np.testing.assert_allclose(mel[:m], host[:m], atol=2e-3, rtol=1e-3)

    # the dataset HITS the cache: mel computation never runs
    entries = [{"path": p, "quote": "hi", "speaker_id": 0} for p in paths]
    ds = TTSDataset(entries, dcfg, features=["text", "mel"])
    ds.stft.mel_spectrogram_np = lambda *_a, **_k: (_ for _ in ()).throw(
        AssertionError("mel recomputed despite preprocess cache"))
    for i, p in enumerate(paths):
        item = ds[i]
        np.testing.assert_allclose(item["mel"],
                                   np.load(p + f".{h}.mel.npy"),
                                   atol=1e-6)
