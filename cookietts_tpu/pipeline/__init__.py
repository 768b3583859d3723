"""Pipeline stages (reference numbered directories _0 ... _5).

- :mod:`download`     — config-driven dataset acquisition (_0_download).
- :mod:`preprocess`   — audio preprocessing + filelist generation
                        (_1_preprocess).
- :mod:`gta`          — teacher-forced (GTA) mel dumps for vocoder
                        training (_3_generate_postnets).
- :mod:`text2speech`  — the T2S inference worker with best-of-N rejection
                        sampling (_5_infer/t2s_server/text2speech.py).
- :mod:`server`       — HTTP inference service (tornado; same form-field
                        API as the reference's Flask app).
"""
