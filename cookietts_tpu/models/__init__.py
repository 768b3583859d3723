"""Model zoo (flax.linen, scan-based AR decode, static shapes).

- :mod:`tacotron2` — AR attention TTS (reference _2_ttm/tacotron2_tm).
- :mod:`sylpsnet`  — syllables/sec VAE conditioning head.
- :mod:`waveglow`  — unified WaveGlow/WaveFlow invertible flow vocoder
                     (reference _4_mtw/waveglow).
- :mod:`hifigan`   — HiFi-GAN generator + discriminators.
"""
from .sylpsnet import SylpsNet  # noqa: F401
from .tacotron2 import Tacotron2, Tacotron2Config  # noqa: F401

# heavier families are imported lazily by their module paths:
# .waveglow (WaveGlow/WaveFlow), .hifigan, .hifigan_denoiser, .untts,
# .gantts, .gst, .emotionnet, .gan_postnet, .torchmoji, .denoiser
