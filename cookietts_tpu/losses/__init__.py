"""Loss suite.

- :func:`tacotron2_loss` — masked spectrogram MSE/MFSE, gate BCE, SylpsNet
  KLD, guided attention, ssvae emotion terms, metric reporting
  (reference _2_ttm/tacotron2_tm/loss_function.py).
- flow NLL lives next to its model (``models.waveglow.waveglow_loss``,
  ``models.untts.untts_loss``), GAN losses next to theirs
  (``models.hifigan``, ``models.gan_postnet``,
  ``models.hifigan_denoiser``); re-exported here for discoverability.
"""
from .tacotron2_loss import (  # noqa: F401
    DEFAULT_LOSS_SCALARS,
    guided_attention_loss,
    tacotron2_loss,
)


def __getattr__(name):
    # lazy re-exports to avoid importing every model family eagerly
    if name == "waveglow_loss":
        from ..models.waveglow import waveglow_loss
        return waveglow_loss
    if name == "untts_loss":
        from ..models.untts import untts_loss
        return untts_loss
    if name in ("discriminator_loss", "generator_loss", "feature_loss",
                "mel_l1_loss"):
        from ..models import hifigan
        return getattr(hifigan, name)
    if name == "gan_postnet_losses":
        from ..models.gan_postnet import gan_postnet_losses
        return gan_postnet_losses
    raise AttributeError(name)
