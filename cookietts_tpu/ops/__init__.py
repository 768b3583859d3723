"""Layer zoo + TPU kernels.

Rebuilds the reference's layer zoo (CookieTTS/utils/model/layers.py and
utils/model/utils.py) as functional JAX / flax.linen modules designed for
`lax.scan` decode loops and static-shape masking:

- :mod:`masking`   — length masks, drop-frame, gate argmax.
- :mod:`lstm`      — zoneout LSTM scan cells (reference LSTMCellWithZoneout).
- :mod:`attention` — location-sensitive (windowed), GMM, and dynamic-
                     convolution attention variants.
- :mod:`metrics`   — alignment diagnostics (diagonality, focus, weighted score).
- :mod:`dtw`       — frame time-warp alignment for GTA mels.
- :mod:`mcd`       — mel-cepstral distortion + f0 eval metrics.
- :mod:`pallas_kernels` — fused TPU attention-step kernel.
"""
from .masking import (  # noqa: F401
    dropout_frame,
    get_first_over_thresh,
    get_mask_3d,
    get_mask_from_lengths,
)
from .dtw import dtw_align  # noqa: F401
from .lstm import ZoneoutLSTMCell  # noqa: F401
from .metrics import alignment_metric, weighted_score  # noqa: F401
