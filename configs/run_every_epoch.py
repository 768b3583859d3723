# Live training config (hot-reloaded every 5 iterations; edit while
# training runs). Reference: _2_ttm/tacotron2_tm/run_every_epoch.py.
A_ = 1e-3                    # peak LR
B_ = 40000.0                 # exp decay time constant (iters)
C_ = 0.0                     # LR offset
warmup_start = 0
warmup_end = 1000
warmup_start_lr = 0.5e-3
decay_start = 40000

grad_clip_thresh = 1.0
LossExplosionThreshold = 1e3

drop_frame_rate = 0.25
p_teacher_forcing = 1.00
teacher_force_till = 20
val_p_teacher_forcing = 0.80
val_teacher_force_till = 20

validation_interval = 1000
checkpoint_interval = 5000

loss_scalars = {
    "spec_MFSE_weight": 1.0,
    "postnet_MFSE_weight": 1.0,
    "gate_loss_weight": 1.0,
    "sylps_kld_weight": 0.0025,
    "sylps_MSE_weight": 0.01,
    "diag_att_weight": 0.05,   # lower after alignment stabilizes
}
