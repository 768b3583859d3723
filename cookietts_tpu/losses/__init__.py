"""Loss suite.

- :mod:`tacotron2_loss` — masked spectrogram MSE/MFSE, gate BCE, SylpsNet
  KLD, guided attention, metric reporting (reference
  _2_ttm/tacotron2_tm/loss_function.py).
- :mod:`flow_loss` — WaveGlow/WaveFlow NLL (reference
  _4_mtw/waveglow/efficient_loss.py).
- :mod:`gan_loss` — HiFi-GAN feature/generator/discriminator losses.
"""
from .tacotron2_loss import (  # noqa: F401
    DEFAULT_LOSS_SCALARS,
    guided_attention_loss,
    tacotron2_loss,
)
