"""On-device audio DSP: STFT/mel frontend, Griffin-Lim, ISO-226, filters."""
from .mel import mel_filterbank  # noqa: F401
from .processing import (  # noqa: F401
    dynamic_range_compression,
    dynamic_range_decompression,
    window_sumsquare,
)
from .stft import STFT, TacotronSTFT  # noqa: F401
from .features import (  # noqa: F401
    estimate_f0,
    fused_frontend,
    measure_loudness,
)
