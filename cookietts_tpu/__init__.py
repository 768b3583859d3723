"""cookietts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-speech framework.

A ground-up rebuild of the capabilities of the CookiePPP/cookietts stack
(reference layout documented in /root/repo/SURVEY.md):

- ``audio``   : fused on-device DSP (conv-STFT, mel, Griffin-Lim, ISO-226,
                resample/filter/trim/loudness) — pure JAX, jittable.
- ``text``    : grapheme/ARPAbet frontend (cleaners, numbers, CMUdict).
- ``data``    : dataset-layout autodiscovery, filelist generation, feature
                factory with static-shape bucketing, TBPTT segment scheduling.
- ``ops``     : layer zoo (zoneout-LSTM scan cells, attention variants,
                masked norm layers) + Pallas TPU kernels for the hot paths.
- ``models``  : Tacotron2 (AR attention TTS), WaveGlow/WaveFlow invertible
                flow vocoders, HiFi-GAN, GST/SylpsNet/EmotionNet heads.
- ``losses``  : masked spectrogram losses, gate BCE, guided attention,
                alignment diagnostics, flow NLL, GAN losses.
- ``parallel``: mesh construction + sharding rules (dp/tp axes over ICI).
- ``runtime`` : the single shared trainer (replaces the reference's
                per-model-directory copies of train.py/distributed.py/...).
- ``pipeline``: download / preprocess / GTA / inference-server stages.

Unlike the reference (one trainer copy per model directory), there is ONE
training runtime here; models plug in via a small TrainTask protocol.
"""

__version__ = "0.1.0"
