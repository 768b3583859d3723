"""THE shared training runtime.

The reference duplicates train.py / distributed.py / fp16_optimizer.py /
loss_scaler.py / logger.py / run_every_epoch.py into every model directory
(SURVEY.md §2.7). Here they are ONE set of components:

- :mod:`optim`        — jitted Adam / LAMB, grad clipping, dynamic loss
                        scaling (replaces apex + hand-rolled FP16_Optimizer).
- :mod:`train_state`  — functional train state (params/opt/step/mutables).
- :mod:`checkpoint`   — save/resume/warm-start with shape-filtered partial
                        restore + best_val / best_inf_attsc tracking.
- :mod:`live_config`  — watched-file config overlay (the reference's
                        exec'd run_every_epoch.py, done safely).
- :mod:`logging_util` — tensorboardX writer + JSONL fallback + per-file
                        loss database for dataset curation.
- :mod:`trainer`      — the single train loop driving any TrainTask.
"""
from .optim import adam, lamb, clip_by_global_norm, DynamicLossScaler  # noqa: F401
from .train_state import TrainState  # noqa: F401
