"""Layer zoo + TPU kernels.

Rebuilds the reference's layer zoo (CookieTTS/utils/model/layers.py and
utils/model/utils.py) as functional JAX / flax.linen modules designed for
`lax.scan` decode loops and static-shape masking:

- :mod:`masking`   — length masks, drop-frame, gate argmax.
- :mod:`lstm`      — zoneout LSTM scan cells (reference LSTMCellWithZoneout).
- :mod:`attention` — location-sensitive (windowed), GMM, and dynamic-
                     convolution attention variants.
- :mod:`metrics`   — alignment diagnostics (diagonality, focus, weighted score).
"""
from .masking import (  # noqa: F401
    dropout_frame,
    get_first_over_thresh,
    get_mask_3d,
    get_mask_from_lengths,
)
from .lstm import ZoneoutLSTMCell  # noqa: F401
from .metrics import alignment_metric  # noqa: F401
