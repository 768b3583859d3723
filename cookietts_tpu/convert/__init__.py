"""Checkpoint converters: load reference (torch) checkpoints into this
framework's params so existing trained models carry over."""
from .gst_torch import (  # noqa: F401
    convert_auxemotionnet_state_dict,
    convert_emotionnet_state_dict,
    convert_gst_state_dict,
)
from .hifigan_torch import (convert_hifigan_state_dict,  # noqa: F401
                            convert_hifigan_discriminators)  # noqa: F401
from .tacotron2_torch import convert_tacotron2_state_dict  # noqa: F401
from .waveglow_torch import convert_waveglow_state_dict  # noqa: F401
