"""Host-side data engineering.

- :mod:`metadata`  — dataset-layout autodiscovery (clipper / ljspeech /
                     tacotron / vctk transcript styles) + Clipper filename
                     metadata (reference utils/dataset/metadata.py).
- :mod:`audio_io`  — WAV I/O, int-normalize, resample, filters, trim,
                     BS.1770 loudness (self-contained numpy/scipy; the
                     reference shells out to librosa/soundfile/pyloudnorm).
- :mod:`filelist`  — filelist generation with speaker-ID assignment and
                     duration accounting (reference data_utils.py:37-254).
- :mod:`dataset`   — TTSDataset-equivalent feature factory producing
                     fixed-shape bucketed batches + TBPTT segment
                     scheduling (reference data_utils.py:329-905).
"""
from .metadata import get_dataset_meta, identify_transcript_storage  # noqa: F401
