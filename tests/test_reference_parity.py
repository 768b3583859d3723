"""DIRECT numerical parity against the reference implementation.

These tests import the actual CookiePPP/cookietts torch modules from
/root/reference (torch-only imports — the audio/text stacks need
librosa/unidecode which aren't installed) and assert our JAX rebuilds
produce the same numbers with mapped weights. This is the strongest
parity evidence available without reference checkpoints.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_zoneout_lstm_cell_matches_reference_eval():
    """ZoneoutLSTMCell (deterministic) == the reference's
    LSTMCellWithZoneout in eval mode (layers.py:351-372 — plain LSTM, no
    zoneout term at eval), with weights mapped:
      ours.gates.kernel = [weight_ih.T ; weight_hh.T]
      ours.gates.bias   = bias_ih + bias_hh − 1 on the forget block
    (our cell adds a +1 forget bias in-graph)."""
    from CookieTTS.utils.model.layers import LSTMCellWithZoneout

    from cookietts_tpu.ops.lstm import ZoneoutLSTMCell

    In, H, B = 12, 16, 3
    torch.manual_seed(0)
    ref = LSTMCellWithZoneout(In, H, bias=True, dropout=0.2, zoneout=0.1)
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, In)).astype(np.float32)
    h0 = rng.standard_normal((B, H)).astype(np.float32) * 0.3
    c0 = rng.standard_normal((B, H)).astype(np.float32) * 0.3

    with torch.no_grad():
        # ref.forward calls check_forward_input, removed in modern torch;
        # invoke the scripted cell body (the actual math) directly
        h_ref, c_ref = ref.lstm_cell(
            torch.from_numpy(x),
            (torch.from_numpy(h0), torch.from_numpy(c0)),
            ref.weight_ih, ref.weight_hh, ref.dropout, ref.zoneout,
            False, ref.bias_ih, ref.bias_hh)

    w_ih = ref.weight_ih.detach().numpy()          # [4H, In]
    w_hh = ref.weight_hh.detach().numpy()          # [4H, H]
    bias = (ref.bias_ih + ref.bias_hh).detach().numpy()    # [4H]
    kernel = np.concatenate([w_ih.T, w_hh.T], axis=0)      # [In+H, 4H]
    bias = bias.copy()
    bias[H:2 * H] -= 1.0        # cancel our in-graph forget +1

    cell = ZoneoutLSTMCell(H, zoneout=0.1, dropout=0.2)
    variables = {"params": {"gates": {"kernel": jnp.asarray(kernel),
                                      "bias": jnp.asarray(bias)}}}
    (c1, h1), y = cell.apply(variables,
                             (jnp.asarray(c0), jnp.asarray(h0)),
                             jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(h1), h_ref.numpy(),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), c_ref.numpy(),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), h_ref.numpy(),
                               atol=2e-6, rtol=1e-5)


def test_alignment_metric_matches_reference():
    """ops/metrics.py:alignment_metric == the reference's
    utils/model/utils.py:59-120 on random soft alignments with padding."""
    from CookieTTS.utils.model.utils import alignment_metric as ref_metric

    from cookietts_tpu.ops.metrics import alignment_metric

    rng = np.random.default_rng(1)
    B, T_dec, T_enc = 3, 25, 11
    logits = rng.standard_normal((B, T_dec, T_enc)).astype(np.float32) * 2
    att = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    in_len = np.array([11, 8, 5], np.int64)
    out_len = np.array([25, 19, 12], np.int64)

    ref = ref_metric(torch.from_numpy(att.copy()),
                     torch.from_numpy(in_len),
                     torch.from_numpy(out_len))
    ours = alignment_metric(jnp.asarray(att), jnp.asarray(in_len),
                            jnp.asarray(out_len))

    for key in ("diagonalitys", "avg_prob", "encoder_max_focus",
                "encoder_min_focus", "encoder_avg_focus", "p_missing_enc"):
        np.testing.assert_allclose(
            np.asarray(ours[key], np.float64),
            ref[key].numpy().astype(np.float64),
            atol=1e-4, rtol=1e-4, err_msg=key)


def test_gate_argmax_matches_reference():
    """get_first_over_thresh parity (utils/model/utils.py:47-56). The
    reference's torch-version sniffing (utils.py:53) crashes on modern
    torch ('2.13.0+cpu'), so its >=1.7 branch is inlined verbatim-in-
    behavior here."""
    from cookietts_tpu.ops.masking import get_first_over_thresh

    def ref_fn(x, threshold):      # utils.py:47-56, modern-torch branch
        x = x.clone().cpu().float()
        x[:, -1] = threshold
        x[x > threshold] = threshold
        return x.argmax(dim=1).int()

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (4, 30)).astype(np.float32)
    x[2] *= 0.3      # one row never crosses
    ref = ref_fn(torch.from_numpy(x.copy()), 0.5).numpy()
    ours = np.asarray(get_first_over_thresh(jnp.asarray(x), 0.5))
    crossed = (x >= 0.5).any(axis=1)
    np.testing.assert_array_equal(ours[crossed], ref[crossed])
    # documented deviation: never-crossing rows return T (exclusive stop)
    # where the reference clamps to T-1 (utils.py:51 sets the last frame
    # to threshold)
    np.testing.assert_array_equal(ours[~crossed], ref[~crossed] + 1)


def test_wn_coupling_network_matches_reference():
    """Our WN (models/waveglow.py:139-187) == the reference's WN
    (_4_mtw/waveglow/glow.py:110-222) with mapped weights.

    Mapping notes:
    - reference cond path is THREE k=1 convs with no nonlinearity
      (glow.py:152-166) -> composes into one linear map == our single
      fused cond_layer Dense.
    - reference WN returns (b, log_s) (end.chunk(2,1), coupling use at
      glow.py:305); ours returns (log_s, t) -> end-kernel halves swap.
    - torch convs are [out, in, k]; flax are [k, in, out].
    """
    from CookieTTS._4_mtw.waveglow.glow import WN as RefWN

    from cookietts_tpu.models.waveglow import WN

    C_half, mel, L, C, K = 4, 8, 3, 16, 3
    torch.manual_seed(0)
    ref = RefWN(n_in_channels=C_half, n_mel_channels=mel, n_layers=L,
                n_channels=C, kernel_size=K, speaker_embed_dim=0,
                rezero=False)
    ref.eval()
    for m in list(ref.in_layers) + list(ref.res_skip_layers) + \
            list(ref.cond_layers) + [ref.start]:
        torch.nn.utils.remove_weight_norm(m)
    # zero-init end does nothing interesting; randomize it
    with torch.no_grad():
        ref.end.weight.normal_(0, 0.3)
        ref.end.bias.normal_(0, 0.1)

    rng = np.random.default_rng(0)
    B, T = 2, 13
    x = rng.standard_normal((B, C_half, T)).astype(np.float32) * 0.5
    spect = rng.standard_normal((B, mel, T)).astype(np.float32)
    with torch.no_grad():
        b_ref, log_s_ref = ref(torch.from_numpy(x), torch.from_numpy(spect))

    def conv_w(m):      # torch [out, in, k] -> flax [k, in, out]
        return np.transpose(m.weight.detach().numpy(), (2, 1, 0))

    def lin_w(m):       # k=1 conv -> Dense kernel [in, out]
        return m.weight.detach().numpy()[:, :, 0].T

    # compose the reference's linear cond MLP into one Dense
    Ws = [m.weight.detach().numpy()[:, :, 0] for m in ref.cond_layers]
    bs = [m.bias.detach().numpy() for m in ref.cond_layers]
    W_eff, b_eff = Ws[0], bs[0]
    for Wn_, bn_ in zip(Ws[1:], bs[1:]):
        b_eff = Wn_ @ b_eff + bn_
        W_eff = Wn_ @ W_eff
    # end halves swapped: ref returns (b, log_s), ours (log_s, t=b)
    end_w = ref.end.weight.detach().numpy()[:, :, 0]   # [2*C_half, C]
    end_b = ref.end.bias.detach().numpy()
    end_w_sw = np.concatenate([end_w[C_half:], end_w[:C_half]], axis=0)
    end_b_sw = np.concatenate([end_b[C_half:], end_b[:C_half]])

    params = {
        "start": {"kernel": lin_w(ref.start),
                  "bias": ref.start.bias.detach().numpy()},
        "cond_layer": {"kernel": W_eff.T, "bias": b_eff},
        "end": {"kernel": end_w_sw.T, "bias": end_b_sw},
    }
    for i in range(L):
        params[f"in_layer{i}"] = {
            "kernel": conv_w(ref.in_layers[i]),
            "bias": ref.in_layers[i].bias.detach().numpy()}
        params[f"res_skip{i}"] = {
            "kernel": conv_w(ref.res_skip_layers[i]),
            "bias": ref.res_skip_layers[i].bias.detach().numpy()}

    wn = WN(n_in_channels=C_half, n_layers=L, n_channels=C, kernel_size=K,
            gated_unit="GTU")
    out = wn.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                   jnp.asarray(np.transpose(x, (0, 2, 1))),
                   jnp.asarray(np.transpose(spect, (0, 2, 1))))
    log_s_ours, t_ours = np.split(np.asarray(out), 2, axis=-1)
    np.testing.assert_allclose(np.transpose(log_s_ours, (0, 2, 1)),
                               log_s_ref.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.transpose(t_ours, (0, 2, 1)),
                               b_ref.numpy(), atol=2e-5, rtol=1e-4)


def test_waveglow_checkpoint_conversion_full_model():
    """convert_waveglow_state_dict: a randomly-initialized reference
    WaveGlow (glow.py:224-315) and our model with converted weights
    produce the same z and log-det totals on the same (mel, audio) —
    trained reference/NVIDIA checkpoints load directly."""
    from CookieTTS._4_mtw.waveglow.glow import WaveGlow as RefWaveGlow

    from cookietts_tpu.convert import convert_waveglow_state_dict
    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig

    mel_ch, n_flows, G = 8, 4, 8
    win, hop = 32, 8
    torch.manual_seed(0)
    ref = RefWaveGlow(
        None, None, n_mel_channels=mel_ch, n_flows=n_flows, n_group=G,
        n_early_every=2, n_early_size=2, memory_efficient=False,
        spect_scaling=False, upsample_mode="normal",
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3,
                       speaker_embed_dim=0, rezero=False),
        win_length=win, hop_length=hop)
    ref.eval()
    with torch.no_grad():        # end layers are zero-init; randomize
        for wn_m in ref.WN:
            wn_m.end.weight.normal_(0, 0.3)
            wn_m.end.bias.normal_(0, 0.1)

    rng = np.random.default_rng(0)
    B, T_mel = 2, 6
    spect = rng.standard_normal((B, mel_ch, T_mel)).astype(np.float32)
    audio = rng.standard_normal((B, T_mel * hop)).astype(np.float32) * 0.3
    with torch.no_grad():
        z_ref, log_s_list, log_det_list = ref(
            torch.from_numpy(spect.copy()), torch.from_numpy(audio))
    log_s_total = float(sum(ls.sum() for ls in log_s_list))
    log_det_total = float(sum(float(ld) for ld in log_det_list))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, hints = convert_waveglow_state_dict(sd)
    assert hints["n_flows"] == n_flows and hints["n_group"] == G
    assert hints["n_early_every"] == 2 and hints["n_early_size"] == 2
    assert hints["upsample_win_length"] == win

    cfg = WaveGlowConfig(
        n_mel_channels=mel_ch, n_flows=n_flows, n_group=G,
        n_early_every=2, n_early_size=2, n_layers=2, n_channels=16,
        kernel_size=3, hop_length=hop, upsample_mode="single",
        upsample_win_length=win, couple_transform="second",
        memory_efficient=False, n_speakers=0)
    model = WaveGlow(cfg)
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(audio), jnp.asarray(np.transpose(spect, (0, 2, 1))))

    z_ours = np.transpose(np.asarray(out["z"]), (0, 2, 1))   # [B, G, T/G]
    np.testing.assert_allclose(z_ours, z_ref.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(float(out["log_s_sum"]), log_s_total,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(out["logdet_w_sum"]), log_det_total,
                               rtol=1e-4, atol=1e-3)


def _ref_tacotron_hparams():
    """Reference create_hparams at tiny dims, all stochastic paths off.

    The reference text stack needs unidecode/inflect (not installed) —
    stub them before hparams import; only symbol COUNTS matter here.
    """
    import types
    sys.modules.setdefault(
        "unidecode", types.SimpleNamespace(unidecode=lambda s: s))
    sys.modules.setdefault("inflect", types.SimpleNamespace(
        engine=lambda: types.SimpleNamespace(
            number_to_words=lambda n, **k: str(n))))
    from CookieTTS._2_ttm.tacotron2_tm.hparams import create_hparams
    h = create_hparams()
    overrides = dict(
        n_symbols=40, symbols_embedding_dim=16,
        n_speakers=4, speaker_embedding_dim=8,
        n_mel_channels=10, n_frames_per_step=1,
        encoder_speaker_embed_dim=4,
        encoder_concat_speaker_embed="before_conv",
        encoder_kernel_size=5, encoder_n_convolutions=2,
        encoder_conv_hidden_dim=12, encoder_LSTM_dim=16,
        sylpsnet_layer_dims=[8, 8],
        torchMoji_attDim=12, torchMoji_crushedDim=4,
        torchMoji_BatchNorm=True,
        use_memory_bottleneck=True, memory_bottleneck_dim=16,
        memory_bottleneck_bias=False,
        prenet_dim=8, prenet_layers=2, p_prenet_dropout=0.0,
        prenet_batchnorm=False, prenet_noise=0.0,
        attention_rnn_dim=16, AttRNN_extra_decoder_input=True,
        AttRNN_hidden_dropout_type="dropout", p_AttRNN_hidden_dropout=0.0,
        decoder_rnn_dim=12, DecRNN_hidden_dropout_type="dropout",
        p_DecRNN_hidden_dropout=0.0, decoder_residual_connection=False,
        second_decoder_rnn_dim=12, second_decoder_residual_connection=True,
        attention_type=0, attention_dim=8,
        attention_location_n_filters=6, attention_location_kernel_size=5,
        windowed_attention_range=4, windowed_att_pos_learned=True,
        attention_learned_temperature=False,
        postnet_embedding_dim=16, postnet_kernel_size=5,
        postnet_n_convolutions=3, postnet_residual_connections=3,
        drop_frame_rate=0.0, p_teacher_forcing=1.0, teacher_force_till=0,
        context_frames=1, hide_startstop_tokens=False,
        mask_padding=False, fp16_run=False,
    )
    for k, v in overrides.items():
        setattr(h, k, v)
    return h


def test_tacotron2_checkpoint_conversion_full_model():
    """convert_tacotron2_state_dict: the reference Tacotron2
    (tacotron2_tm/model.py:919-1042) and our model with converted weights
    produce the same teacher-forced mels / gates / alignments (all
    dropout paths zeroed; full lengths — the reference does not mask
    padding inside its encoder convs, we do, so boundary halos differ on
    ragged batches by design)."""
    from CookieTTS._2_ttm.tacotron2_tm.model import Tacotron2 as RefT2
    from CookieTTS.utils.model.layers import LSTMCellWithZoneout

    from cookietts_tpu.convert import convert_tacotron2_state_dict
    from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

    # torch removed RNNCellBase.check_forward_* that the reference's
    # forward still calls — restore them as no-ops (validation only)
    LSTMCellWithZoneout.check_forward_input = lambda self, *a, **k: None
    LSTMCellWithZoneout.check_forward_hidden = lambda self, *a, **k: None

    h = _ref_tacotron_hparams()
    torch.manual_seed(0)
    ref = RefT2(h)
    ref.eval()

    rng = np.random.default_rng(0)
    B, T_txt, T_mel = 2, 9, 12
    text = rng.integers(1, 40, (B, T_txt)).astype(np.int64)
    text_lengths = np.full((B,), T_txt, np.int64)
    mels = rng.standard_normal((B, 10, T_mel)).astype(np.float32)
    mel_lengths = np.full((B,), T_mel, np.int64)
    speaker_id = np.array([1, 3], np.int64)
    sylps = np.array([4.0, 5.5], np.float32)
    tm_hdn = rng.standard_normal((B, 12)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(mels.copy()), torch.from_numpy(mel_lengths),
            torch.from_numpy(text), torch.from_numpy(text_lengths),
            torch.from_numpy(speaker_id), torch.from_numpy(sylps),
            torch.from_numpy(tm_hdn),
            pres_prev_state=torch.zeros(B), cont_next_iter=torch.zeros(B),
            init_mel=None, teacher_force_till=0, p_teacher_forcing=1.0,
            drop_frame_rate=0.0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_tacotron2_state_dict(sd)

    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=10,
        encoder_speaker_embed_dim=4,
        encoder_concat_speaker_embed="before_conv",
        encoder_kernel_size=5, encoder_n_convolutions=2,
        encoder_conv_hidden_dim=12, encoder_lstm_dim=16,
        sylpsnet_layer_dims=(8, 8), torchmoji_dim=12,
        torchmoji_crushed_dim=4, torchmoji_batchnorm=True,
        use_memory_bottleneck=True, memory_bottleneck_dim=16,
        memory_bottleneck_bias=False, prenet_dim=8, prenet_layers=2,
        p_prenet_dropout=0.0, attention_rnn_dim=16,
        attrnn_extra_decoder_input=True, p_attrnn_dropout=0.0,
        decoder_rnn_dim=12, p_decrnn_dropout=0.0,
        decoder_residual_connection=False, second_decoder_rnn_dim=12,
        second_decoder_residual_connection=True, attention_type=0,
        attention_dim=8, attention_location_n_filters=6,
        attention_location_kernel_size=5, windowed_attention_range=4,
        windowed_att_pos_learned=True,
        postnet_embedding_dim=16, postnet_kernel_size=5,
        postnet_n_convolutions=3, postnet_residual_connections=3)
    model = Tacotron2(cfg)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats),
    }
    (out, _), = [model.apply(
        variables,
        text=jnp.asarray(text, jnp.int32),
        text_lengths=jnp.asarray(text_lengths, jnp.int32),
        mels=jnp.asarray(np.transpose(mels, (0, 2, 1))),
        mel_lengths=jnp.asarray(mel_lengths, jnp.int32),
        speaker_id=jnp.asarray(speaker_id, jnp.int32),
        sylps=jnp.asarray(sylps),
        torchmoji_hidden=jnp.asarray(tm_hdn),
        key=jax.random.PRNGKey(0), p_teacher_forcing=1.0,
        teacher_force_till=10000, deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(1)})]

    np.testing.assert_allclose(
        np.transpose(np.asarray(out["mel_outputs"]), (0, 2, 1)),
        out_ref["pred_mel"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["gate_outputs"]),
        out_ref["pred_gate_logits"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["alignments"]),
        out_ref["alignments"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out["mel_outputs_postnet"]), (0, 2, 1)),
        out_ref["pred_mel_postnet"].numpy(), atol=5e-4, rtol=1e-3)


def test_cli_convert_roundtrip(tmp_path):
    """`cookietts_tpu convert` ingests a reference torch .pt checkpoint
    and writes a loadable framework checkpoint."""
    from CookieTTS._2_ttm.tacotron2_tm.model import Tacotron2 as RefT2

    from cookietts_tpu import cli
    from cookietts_tpu.runtime.checkpoint import load_checkpoint

    h = _ref_tacotron_hparams()
    torch.manual_seed(1)
    ref = RefT2(h)
    pt = str(tmp_path / "ref.pt")
    torch.save({"state_dict": ref.state_dict(), "iteration": 123}, pt)
    out = str(tmp_path / "converted.ckpt")
    cli.main(["convert", "--model", "tacotron2", "--torch_ckpt", pt,
              "-o", out])
    tree, _ = load_checkpoint(out)
    assert "params" in tree and "mutables" in tree
    assert tree["params"]["embedding"]["embedding"].shape == (40, 16)


def test_hifigan_checkpoint_conversion_full_model():
    """convert_hifigan_state_dict: the reference Generator
    (_4_mtw/hifigan/models.py:97-147 == upstream jik876/hifi-gan) and
    ours with converted weights produce the same waveform."""
    import types

    from CookieTTS._4_mtw.hifigan.models import Generator as RefGen

    from cookietts_tpu.convert import convert_hifigan_state_dict
    from cookietts_tpu.models.hifigan import Generator, HiFiGANConfig

    h = types.SimpleNamespace(
        num_mels=8, resblock="1", resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=16)
    torch.manual_seed(0)
    ref = RefGen(h)
    ref.eval()

    rng = np.random.default_rng(0)
    B, T_mel = 2, 7
    mel = rng.standard_normal((B, 8, T_mel)).astype(np.float32)
    with torch.no_grad():
        audio_ref = ref(torch.from_numpy(mel)).numpy()[:, 0, :]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, hints = convert_hifigan_state_dict(sd)
    assert hints["n_upsamples"] == 2 and hints["num_kernels"] == 2

    cfg = HiFiGANConfig(
        n_mel_channels=8, resblock_kernel_sizes=(3, 5),
        resblock_dilations=((1, 3, 5), (1, 3, 5)), upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=16)
    gen = Generator(cfg)
    audio = gen.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(np.transpose(mel, (0, 2, 1))))
    np.testing.assert_allclose(np.asarray(audio), audio_ref,
                               atol=5e-5, rtol=1e-3)


def test_gmm_attention_matches_reference():
    """GMMAttention single step == reference layers.py:149-246 (active
    erf-window branch) with mapped weights."""
    import types

    from CookieTTS.utils.model.layers import GMMAttention as RefGMM

    from cookietts_tpu.ops.attention import GMMAttention

    K, rnn_dim, att_dim, D = 3, 16, 8, 12
    h = types.SimpleNamespace(
        normalize_attention_input=True, delta_min_limit=0.0,
        delta_offset=0.005, lin_bias=False, initial_gain="relu")
    torch.manual_seed(0)
    ref = RefGMM(K, 1, rnn_dim, D, att_dim, 6, 5, h)
    ref.eval()

    rng = np.random.default_rng(0)
    B, T = 2, 11
    query = rng.standard_normal((B, rnn_dim)).astype(np.float32)
    memory = rng.standard_normal((B, T, D)).astype(np.float32)
    lengths = np.array([11, 7], np.int64)
    pad_mask = np.arange(T)[None, :] >= lengths[:, None]
    prev_loc = np.zeros((B, 1, K), np.float32)
    with torch.no_grad():
        ctx_ref, w_ref, loc_ref = ref(
            torch.from_numpy(query), torch.from_numpy(memory),
            torch.from_numpy(prev_loc), torch.from_numpy(pad_mask))

    params = {
        "F": {"kernel": ref.F[0].linear_layer.weight.detach().numpy().T,
              "bias": ref.F[0].linear_layer.bias.detach().numpy()},
        "lin": {"kernel": ref.F[2].weight.detach().numpy().T},
    }
    ours = GMMAttention(n_mixtures=K, attention_dim=att_dim,
                        delta_min=0.0, delta_offset=0.005,
                        attention_layers=1, lin_bias=False,
                        normalize_attention_input=True)
    state = ours.init_state(B, T)
    const = {"mask": jnp.asarray(~pad_mask)}
    ctx, w, new_state = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(query), jnp.asarray(memory), const, state)
    np.testing.assert_allclose(np.asarray(w), w_ref.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref.numpy(),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(new_state.mu),
                               loc_ref.numpy()[:, 0, :],
                               atol=2e-5, rtol=1e-4)


def test_tacotron2_loss_matches_reference(monkeypatch):
    """Every differentiable component of the Tacotron2 loss — masked
    spec/postnet MSE + MFSE, gate BCE w/ pos_weight, SylpsNet KLD, sylps
    MAE/MSE, guided diagonal attention — and the weighted total match the
    reference Tacotron2Loss (loss_function.py:167-247) on random inputs
    with mixed lengths."""
    from types import SimpleNamespace

    from CookieTTS._2_ttm.tacotron2_tm.loss_function import Tacotron2Loss

    from cookietts_tpu.losses.tacotron2_loss import tacotron2_loss

    # the reference parses torch.__version__ as int(''.join(split('.')))
    # (utils.py:53), which chokes on local suffixes like '2.1.30+cpu'
    monkeypatch.setattr(torch, "__version__", "9.9.9")

    B, T_dec, T_enc, M = 3, 14, 9, 6
    rng = np.random.default_rng(0)
    mel_lengths = np.array([14, 9, 11], np.int64)
    text_lengths = np.array([9, 5, 7], np.int64)
    gt_mel = rng.standard_normal((B, M, T_dec)).astype(np.float32)
    pred_mel = rng.standard_normal((B, M, T_dec)).astype(np.float32)
    pred_post = rng.standard_normal((B, M, T_dec)).astype(np.float32)
    gate_logits = rng.standard_normal((B, T_dec)).astype(np.float32)
    gate_target = (np.arange(T_dec)[None]
                   >= (mel_lengths - 1)[:, None]).astype(np.float32)
    align = rng.random((B, T_dec, T_enc)).astype(np.float32)
    align /= align.sum(-1, keepdims=True)
    syl_mu = rng.standard_normal((B,)).astype(np.float32)
    syl_logvar = (0.3 * rng.standard_normal((B,))).astype(np.float32)
    pred_sylps = rng.standard_normal((B,)).astype(np.float32)
    gt_sylps = rng.standard_normal((B,)).astype(np.float32)

    weights = {"spec_MSE_weight": 0.3, "spec_MFSE_weight": 1.0,
               "postnet_MSE_weight": 0.2, "postnet_MFSE_weight": 1.0,
               "gate_loss_weight": 1.0, "sylps_kld_weight": 0.002,
               "sylps_MSE_weight": 0.01, "sylps_MAE_weight": 0.05,
               "diag_att_weight": 0.05}

    hp = SimpleNamespace(gate_positive_weight=10, masked_select=True,
                         DiagonalGuidedAttention_sigma=0.5, **weights)
    ref_loss = Tacotron2Loss(hp)
    t = torch.tensor
    ref_pred = {
        "pred_mel": t(pred_mel), "pred_mel_postnet": t(pred_post),
        "pred_gate_logits": t(gate_logits), "alignments": t(align),
        "pred_sylps_mu": t(syl_mu), "pred_sylps_logvar": t(syl_logvar),
        "pred_sylps": t(pred_sylps)[:, None],
    }
    ref_gt = {
        "gt_mel": t(gt_mel), "mel_lengths": t(mel_lengths),
        "text_lengths": t(text_lengths),
        "gt_gate_logits": t(gate_target), "gt_sylps": t(gt_sylps),
        "pres_prev_state": t(np.zeros(B, np.float32)),
        "audiopath": [f"a{i}.wav" for i in range(B)],
        "speaker_id_ext": [str(i) for i in range(B)],
    }
    ref_dict, _ = ref_loss(ref_pred, ref_gt, dict(weights))

    ours_total, ours_dict, _ = tacotron2_loss(
        pred={"mel_outputs": jnp.asarray(pred_mel.transpose(0, 2, 1)),
              "mel_outputs_postnet": jnp.asarray(
                  pred_post.transpose(0, 2, 1)),
              "gate_outputs": jnp.asarray(gate_logits),
              "alignments": jnp.asarray(align),
              "syl_mu": jnp.asarray(syl_mu),
              "syl_logvar": jnp.asarray(syl_logvar),
              "pred_sylps": jnp.asarray(pred_sylps)},
        gt={"mels": jnp.asarray(gt_mel.transpose(0, 2, 1)),
            "mel_lengths": jnp.asarray(mel_lengths),
            "text_lengths": jnp.asarray(text_lengths),
            "gate_target": jnp.asarray(gate_target),
            "sylps": jnp.asarray(gt_sylps),
            "pres_prev_state": jnp.zeros((B,), jnp.float32)},
        loss_scalars=weights, gate_positive_weight=10.0,
        guided_att_sigma=0.5)

    for key in ("spec_MSE", "postnet_MSE", "spec_MFSE", "postnet_MFSE",
                "gate_loss", "sylps_kld", "sylps_MAE", "sylps_MSE",
                "diag_att", "loss"):
        ref_v = float(ref_dict[key])
        our_v = float(ours_dict[key])
        assert np.isclose(our_v, ref_v, rtol=2e-5, atol=2e-6), \
            (key, our_v, ref_v)


def test_gst_matches_reference():
    """GST (TPGST) with converted weights == the reference torch GST in
    eval mode: style tokens AND style embedding from a mel reference
    (TPGST.py:11-263). The reference's sibling `module` import needs its
    directory on sys.path; its MHA ignores hparams.gstAtt_dim and uses
    the default n_units=128."""
    from types import SimpleNamespace

    sys.path.insert(0, "/root/reference/CookieTTS/_2_ttm/tacotron2_ssvae")
    try:
        from TPGST import GST as RefGST
    finally:
        sys.path.pop(0)

    from cookietts_tpu.convert.gst_torch import convert_gst_state_dict
    from cookietts_tpu.models.gst import GST, GSTConfig

    E, N_TOK, HEADS, M, TM = 32, 5, 8, 24, 12
    hp = SimpleNamespace(
        token_embedding_size=E, token_num=N_TOK, num_heads=HEADS,
        gstAtt_dim=999,                    # dead in the reference
        n_frames_per_step=1, ref_enc_filters=[4, 4, 8],
        ss_vae_gst=False, gst_vae_mode=0, ss_vae_zu_dim=N_TOK,
        vae_classes=list(range(4)), token_activation_func="softmax",
        torchMoji_linear=True, torchMoji_attDim=TM,
        p_drop_tokens=0.0, drop_tokens_mode="zeros", n_speakers=4)
    torch.manual_seed(0)
    ref = RefGST(hp)
    ref.eval()
    # make BN running stats non-trivial so the parity is meaningful
    rng = np.random.default_rng(1)
    for conv in ref.ref_encoder.convs:
        bn = conv.batch_norm
        bn.running_mean.copy_(torch.tensor(
            rng.standard_normal(bn.running_mean.shape[0]), dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(
            0.5 + rng.random(bn.running_var.shape[0]), dtype=torch.float32))

    B, T = 2, 37                            # odd T exercises the padding
    mel = rng.standard_normal((B, M, T)).astype(np.float32)
    with torch.no_grad():
        ref_embed, ref_tokens = ref(torch.tensor(mel), ref_mode=1)
        # and the text-predicted (torchMoji map_lin) path, ref_mode=3
        tm_hidden = rng.standard_normal((B, TM)).astype(np.float32)
        ref_embed3, ref_tokens3 = ref(torch.tensor(tm_hidden), ref_mode=3)

    cfg = GSTConfig(token_embedding_size=E, token_num=N_TOK,
                    num_heads=HEADS, gst_att_dim=128,
                    ref_enc_filters=(4, 4, 8), n_mel_channels=M,
                    torchmoji_dim=TM)
    params, batch_stats = convert_gst_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    ours = GST(cfg)
    variables = {"params": params, "batch_stats": batch_stats}
    out = ours.apply(variables, jnp.asarray(mel.transpose(0, 2, 1)),
                     ref_mode=1, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["style_tokens"]),
                               ref_tokens.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["style_embedding"]),
                               ref_embed.numpy()[:, 0], rtol=2e-4,
                               atol=2e-5)
    out3 = ours.apply(variables, jnp.asarray(tm_hidden), ref_mode=3,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out3["style_tokens"]),
                               ref_tokens3.numpy(), rtol=2e-4, atol=2e-5)


def test_emotionnet_matches_reference():
    """EmotionNet with converted weights == the reference torch
    EmotionNet in eval mode: class log-probs (zs), semi-supervised
    override, and the VAE posterior (mu/logvar), incl. variable text
    lengths through the packed text GRU (nets/EmotionNet.py:66-124)."""
    from types import SimpleNamespace

    from CookieTTS._2_ttm.tacotron2_ssvae.nets.EmotionNet import (
        EmotionNet as RefEmotionNet)

    from cookietts_tpu.convert.gst_torch import (
        convert_emotionnet_state_dict)
    from cookietts_tpu.models.emotionnet import (EmotionNet,
                                                 EmotionNetConfig)

    C, LAT, E, R, SPK, M, ENC = 4, 6, 32, 16, 8, 24, 10
    hp = SimpleNamespace(
        n_frames_per_step=1, emotion_classes=list(range(C)),
        emotionnet_ref_enc_convs=[4, 4, 8],
        emotionnet_ref_enc_rnn_dim=E,
        emotionnet_ref_enc_use_bias=False,
        emotionnet_ref_enc_droprate=0.0,
        speaker_embedding_dim=SPK, emotionnet_RNN_dim=R,
        emotionnet_latent_dim=LAT,
        emotionnet_classifier_layer_dropout=0.0,
        emotionnet_encoder_outputs_dropout=0.0,
        encoder_LSTM_dim=ENC)
    torch.manual_seed(0)
    ref = RefEmotionNet(hp)
    ref.eval()
    rng = np.random.default_rng(2)
    for conv in ref.ref_enc.convs:
        bn = conv.batch_norm
        bn.running_mean.copy_(torch.tensor(
            rng.standard_normal(bn.running_mean.shape[0]),
            dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(
            0.5 + rng.random(bn.running_var.shape[0]),
            dtype=torch.float32))

    B, T_mel, T_txt = 3, 37, 7
    mel = rng.standard_normal((B, M, T_mel)).astype(np.float32)
    spk = rng.standard_normal((B, SPK)).astype(np.float32)
    enc = rng.standard_normal((B, T_txt, ENC)).astype(np.float32)
    text_lengths = np.array([7, 4, 6], np.int64)
    emotion_id = np.array([0, C, 2], np.int64)   # C == unknown
    onehot = np.zeros((B, C), np.float32)
    onehot[0, 0] = 1.0
    onehot[2, 2] = 1.0
    with torch.no_grad():
        zs, zu, zu_mu, zu_logvar, _ = ref(
            torch.tensor(mel), torch.tensor(spk), torch.tensor(enc),
            text_lengths=torch.tensor(text_lengths),
            emotion_id=torch.tensor(emotion_id),
            emotion_onehot=torch.tensor(onehot))

    cfg = EmotionNetConfig(
        n_classes=C, latent_dim=LAT, ref_enc_filters=(4, 4, 8),
        ref_enc_rnn_dim=E, rnn_dim=R, speaker_embedding_dim=SPK,
        n_mel_channels=M)
    params, batch_stats = convert_emotionnet_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    ours = EmotionNet(cfg)
    out = ours.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(spk),
        jnp.asarray(enc), text_lengths=jnp.asarray(text_lengths),
        emotion_id=jnp.asarray(emotion_id),
        emotion_onehot=jnp.asarray(onehot), deterministic=True)
    np.testing.assert_allclose(np.asarray(out["zs"]),
                               zs.numpy()[:, 0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["zu_mu"]),
                               zu_mu.numpy()[:, 0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["zu_logvar"]),
                               zu_logvar.numpy()[:, 0], rtol=2e-4,
                               atol=2e-5)
    # eval-mode zu == mu
    np.testing.assert_allclose(np.asarray(out["zu"]),
                               zu.numpy()[:, 0], rtol=2e-4, atol=2e-5)


def test_auxemotionnet_matches_reference():
    """AuxEmotionNet with converted weights == the reference torch
    AuxEmotionNet in eval mode: aux class log-probs and zu posterior
    from torchMoji hidden + speaker + text (nets/AuxEmotionNet.py)."""
    from types import SimpleNamespace

    from CookieTTS._2_ttm.tacotron2_ssvae.nets.AuxEmotionNet import (
        AuxEmotionNet as RefAux)

    from cookietts_tpu.convert.gst_torch import (
        convert_auxemotionnet_state_dict)
    from cookietts_tpu.models.emotionnet import (AuxEmotionNet,
                                                 EmotionNetConfig)

    C, LAT, R, SPK, TM, ENC = 4, 6, 16, 8, 12, 10
    hp = SimpleNamespace(
        auxemotionnet_layer_dims=[32],     # single layer: attDim->attDim
        torchMoji_attDim=TM, emotion_classes=list(range(C)),
        speaker_embedding_dim=SPK, auxemotionnet_RNN_dim=R,
        emotionnet_latent_dim=LAT,
        auxemotionnet_classifier_layer_dropout=0.0,
        auxemotionnet_encoder_outputs_dropout=0.0,
        encoder_LSTM_dim=ENC)
    torch.manual_seed(0)
    ref = RefAux(hp)
    ref.eval()

    rng = np.random.default_rng(3)
    B, T_txt = 3, 7
    tm = rng.standard_normal((B, TM)).astype(np.float32)
    spk = rng.standard_normal((B, SPK)).astype(np.float32)
    enc = rng.standard_normal((B, T_txt, ENC)).astype(np.float32)
    text_lengths = np.array([7, 4, 6], np.int64)
    with torch.no_grad():
        zs, zu_mu, zu_logvar, _ = ref(
            torch.tensor(tm), torch.tensor(spk), torch.tensor(enc),
            text_lengths=torch.tensor(text_lengths))

    cfg = EmotionNetConfig(
        n_classes=C, latent_dim=LAT, rnn_dim=R,
        speaker_embedding_dim=SPK, torchmoji_dim=TM,
        aux_layer_dims=(32,))
    params = convert_auxemotionnet_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    ours = AuxEmotionNet(cfg)
    out = ours.apply(
        {"params": params}, jnp.asarray(tm), jnp.asarray(spk),
        jnp.asarray(enc), text_lengths=jnp.asarray(text_lengths),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(out["zs"]),
                               zs.numpy()[:, 0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["zu_mu"]),
                               zu_mu.numpy()[:, 0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["zu_logvar"]),
                               zu_logvar.numpy()[:, 0], rtol=2e-4,
                               atol=2e-5)


def test_temporal_predictor_matches_reference():
    """UnTTS duration/f0/energy TemporalPredictor == the reference
    (untts/fastpitch/length_predictor.py:23 + ConvReLUNorm
    layers.py:484-499) with mapped weights and a ragged mask."""
    from types import SimpleNamespace

    from CookieTTS._2_ttm.untts.fastpitch.length_predictor import (
        TemporalPredictor as RefTP)

    from cookietts_tpu.models.untts import TemporalPredictor

    IN, F_DIM, K, L = 10, 8, 3, 2
    hp = SimpleNamespace(len_pred_filter_size=F_DIM, len_pred_kernel_size=K,
                         len_pred_dropout=0.0, len_pred_n_layers=L)
    torch.manual_seed(0)
    ref = RefTP(IN, hp)
    ref.eval()

    rng = np.random.default_rng(4)
    B, T = 3, 11
    x = rng.standard_normal((B, T, IN)).astype(np.float32)
    lengths = np.array([11, 7, 9])
    mask = (np.arange(T)[None] < lengths[:, None])
    with torch.no_grad():
        ref_out = ref(torch.tensor(x),
                      torch.tensor(mask[:, :, None].astype(np.float32)))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"fc": {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}}
    for i in range(L):
        params[f"conv{i}"] = {
            "kernel": sd[f"layers.{i}.conv.weight"].transpose(2, 1, 0),
            "bias": sd[f"layers.{i}.conv.bias"]}
        params[f"ln{i}"] = {"scale": sd[f"layers.{i}.norm.weight"],
                            "bias": sd[f"layers.{i}.norm.bias"]}

    ours = TemporalPredictor(filter_size=F_DIM, kernel_size=K, n_layers=L,
                             dropout=0.0)
    out = ours.apply({"params": params}, jnp.asarray(x),
                     jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-5, atol=2e-6)


def test_cli_convert_gst_roundtrip(tmp_path):
    """'convert --model gst' on a reference TPGST state dict produces a
    loadable checkpoint whose derived model_config reconstructs the
    right GSTConfig, and the loaded model reproduces the torch output."""
    from types import SimpleNamespace

    sys.path.insert(0, "/root/reference/CookieTTS/_2_ttm/tacotron2_ssvae")
    try:
        from TPGST import GST as RefGST
    finally:
        sys.path.pop(0)

    from cookietts_tpu import cli
    from cookietts_tpu.models.gst import GST, GSTConfig
    from cookietts_tpu.runtime.checkpoint import load_checkpoint

    hp = SimpleNamespace(
        token_embedding_size=32, token_num=5, num_heads=8, gstAtt_dim=0,
        n_frames_per_step=1, ref_enc_filters=[4, 4, 8], ss_vae_gst=False,
        gst_vae_mode=0, ss_vae_zu_dim=5, vae_classes=[0],
        token_activation_func="softmax", torchMoji_linear=True,
        torchMoji_attDim=12, p_drop_tokens=0.0, drop_tokens_mode="zeros",
        n_speakers=4)
    torch.manual_seed(1)
    ref = RefGST(hp)
    ref.eval()
    npz = str(tmp_path / "gst_sd.npz")
    np.savez(npz, **{k: v.detach().numpy()
                     for k, v in ref.state_dict().items()})
    out_path = str(tmp_path / "gst.ckpt")
    cli.main(["convert", "--model", "gst", "--torch_ckpt", npz,
              "-o", out_path])

    tree, meta = load_checkpoint(out_path)
    mc = meta["model_config"]
    assert mc["token_num"] == 5 and mc["num_heads"] == 8
    assert list(mc["ref_enc_filters"]) == [4, 4, 8]
    cfg = GSTConfig(token_embedding_size=mc["token_embedding_size"],
                    token_num=mc["token_num"], num_heads=mc["num_heads"],
                    gst_att_dim=mc["gst_att_dim"],
                    ref_enc_filters=tuple(mc["ref_enc_filters"]),
                    n_mel_channels=24, torchmoji_dim=12)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 24, 33)).astype(np.float32)
    with torch.no_grad():
        ref_embed, _ = ref(torch.tensor(mel), ref_mode=1)
    import jax.tree_util as jtu
    variables = {"params": jtu.tree_map(jnp.asarray, tree["params"]),
                 **jtu.tree_map(jnp.asarray, tree.get("mutables", {}))}
    out = GST(cfg).apply(variables, jnp.asarray(mel.transpose(0, 2, 1)),
                         ref_mode=1, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["style_embedding"]),
                               ref_embed.numpy()[:, 0], rtol=2e-4,
                               atol=2e-5)


def test_fft_block_matches_reference_transformer_layer():
    """Our FFTBlock == the reference untts TransformerLayer
    (transformer.py:266-281: fused-qkv MultiHeadAttn + PositionwiseConvFF,
    post-norm) in eval mode with mapped weights.

    BATCH SIZE 1 ONLY — the reference MultiHeadAttn has a real bug at
    B>1: it flattens (B, H) batch-major (`permute(0,2,1,3).reshape(-1,
    T, d_head)`, transformer.py:184-186) but un-flattens HEAD-major
    (`view(n_head, B, T, d_head)`, :200), scrambling head outputs
    ACROSS batch items. We implement the correct semantics (verified:
    flax matches the standard math to 1e-7 while torch deviates by
    ~0.7 at B=3); at B=1 the two coincide exactly."""
    from CookieTTS._2_ttm.untts.fastpitch.transformer import (
        TransformerLayer)

    from cookietts_tpu.models.untts import FFTBlock

    D, H, INNER, K = 16, 4, 24, 3
    DH = D // H
    torch.manual_seed(0)
    ref = TransformerLayer(H, D, DH, INNER, K, dropout=0.0, dropatt=0.0,
                           pre_lnorm=False)
    ref.eval()

    rng = np.random.default_rng(6)
    B, T = 1, 9
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    lengths = np.array([7])
    mask = (np.arange(T)[None] < lengths[:, None])
    with torch.no_grad():
        ref_out = ref(torch.tensor(x * mask[:, :, None]),
                      mask=torch.tensor(mask[:, :, None]))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    qkv_w = sd["dec_attn.qkv_net.weight"]          # [3*H*DH, D]
    qkv_b = sd["dec_attn.qkv_net.bias"]
    HD = H * DH

    def head_proj(w_rows, b_rows):
        # torch rows = output features ordered h*DH+d -> flax [D, H, DH]
        return {"kernel": w_rows.T.reshape(D, H, DH),
                "bias": b_rows.reshape(H, DH)}

    params = {
        "mha": {
            "query": head_proj(qkv_w[:HD], qkv_b[:HD]),
            "key": head_proj(qkv_w[HD:2 * HD], qkv_b[HD:2 * HD]),
            "value": head_proj(qkv_w[2 * HD:], qkv_b[2 * HD:]),
            "out": {"kernel": sd["dec_attn.o_net.weight"].T.reshape(
                        H, DH, D),
                    "bias": np.zeros(D, np.float32)},   # o_net bias=False
        },
        "ln1": {"scale": sd["dec_attn.layer_norm.weight"],
                "bias": sd["dec_attn.layer_norm.bias"]},
        "ffn1": {"kernel": sd["pos_ff.CoreNet.0.weight"].transpose(2, 1, 0),
                 "bias": sd["pos_ff.CoreNet.0.bias"]},
        "ffn2": {"kernel": sd["pos_ff.CoreNet.2.weight"].transpose(2, 1, 0),
                 "bias": sd["pos_ff.CoreNet.2.bias"]},
        "ln2": {"scale": sd["pos_ff.layer_norm.weight"],
                "bias": sd["pos_ff.layer_norm.bias"]},
    }
    ours = FFTBlock(dim=D, heads=H, ffn_dim=INNER, kernel_size=K,
                    dropout=0.0)
    out = ours.apply({"params": params},
                     jnp.asarray(x * mask[:, :, None]),
                     jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=3e-5, atol=3e-6)


def test_cli_convert_emotionnet_roundtrip(tmp_path):
    """'convert --model emotionnet' derives a config that reconstructs
    the model and reproduces the torch posterior."""
    from types import SimpleNamespace

    from CookieTTS._2_ttm.tacotron2_ssvae.nets.EmotionNet import (
        EmotionNet as RefEmotionNet)

    from cookietts_tpu import cli
    from cookietts_tpu.models.emotionnet import (EmotionNet,
                                                 EmotionNetConfig)
    from cookietts_tpu.runtime.checkpoint import load_checkpoint

    C, LAT, E, R, SPK, M, ENC = 4, 6, 32, 16, 8, 24, 10
    hp = SimpleNamespace(
        n_frames_per_step=1, emotion_classes=list(range(C)),
        emotionnet_ref_enc_convs=[4, 4, 8], emotionnet_ref_enc_rnn_dim=E,
        emotionnet_ref_enc_use_bias=False,
        emotionnet_ref_enc_droprate=0.0, speaker_embedding_dim=SPK,
        emotionnet_RNN_dim=R, emotionnet_latent_dim=LAT,
        emotionnet_classifier_layer_dropout=0.0,
        emotionnet_encoder_outputs_dropout=0.0, encoder_LSTM_dim=ENC)
    torch.manual_seed(2)
    ref = RefEmotionNet(hp)
    ref.eval()
    npz = str(tmp_path / "em_sd.npz")
    np.savez(npz, **{k: v.detach().numpy()
                     for k, v in ref.state_dict().items()})
    out_path = str(tmp_path / "em.ckpt")
    cli.main(["convert", "--model", "emotionnet", "--torch_ckpt", npz,
              "-o", out_path])

    tree, meta = load_checkpoint(out_path)
    mc = meta["model_config"]
    assert mc["n_classes"] == C and mc["latent_dim"] == LAT
    assert mc["speaker_embedding_dim"] == SPK
    cfg = EmotionNetConfig(
        n_classes=mc["n_classes"], latent_dim=mc["latent_dim"],
        ref_enc_filters=tuple(mc["ref_enc_filters"]),
        ref_enc_rnn_dim=mc["ref_enc_rnn_dim"], rnn_dim=mc["rnn_dim"],
        speaker_embedding_dim=mc["speaker_embedding_dim"],
        n_mel_channels=M)
    rng = np.random.default_rng(7)
    B, T_mel, T_txt = 2, 29, 6
    mel = rng.standard_normal((B, M, T_mel)).astype(np.float32)
    spk = rng.standard_normal((B, SPK)).astype(np.float32)
    enc = rng.standard_normal((B, T_txt, ENC)).astype(np.float32)
    emotion_id = np.full((B,), C, np.int64)        # all unknown
    onehot = np.zeros((B, C), np.float32)
    with torch.no_grad():
        zs, _, zu_mu, _, _ = ref(torch.tensor(mel), torch.tensor(spk),
                                 torch.tensor(enc),
                                 emotion_id=torch.tensor(emotion_id),
                                 emotion_onehot=torch.tensor(onehot))
    import jax.tree_util as jtu
    variables = {"params": jtu.tree_map(jnp.asarray, tree["params"]),
                 **jtu.tree_map(jnp.asarray, tree.get("mutables", {}))}
    out = EmotionNet(cfg).apply(
        variables, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(spk),
        jnp.asarray(enc), emotion_id=jnp.asarray(emotion_id),
        emotion_onehot=jnp.asarray(onehot), deterministic=True)
    np.testing.assert_allclose(np.asarray(out["zs"]), zs.numpy()[:, 0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["zu_mu"]),
                               zu_mu.numpy()[:, 0], rtol=2e-4, atol=2e-5)


def test_converted_gst_grafts_into_tacotron2(tmp_path):
    """Converted reference TPGST weights graft into a use_gst Tacotron2
    (subtree params['gst'] + batch_stats['gst']) and drive the style
    conditioning: the teacher-forced forward runs finite and reacts to
    the reference mel."""
    from types import SimpleNamespace

    sys.path.insert(0, "/root/reference/CookieTTS/_2_ttm/tacotron2_ssvae")
    try:
        from TPGST import GST as RefGST
    finally:
        sys.path.pop(0)

    from cookietts_tpu.convert.gst_torch import convert_gst_state_dict
    from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
    from cookietts_tpu.text import N_SYMBOLS

    M, E, N_TOK, HEADS = 20, 32, 5, 8
    hp = SimpleNamespace(
        token_embedding_size=E, token_num=N_TOK, num_heads=HEADS,
        gstAtt_dim=0, n_frames_per_step=1, ref_enc_filters=[4, 4, 8],
        ss_vae_gst=False, gst_vae_mode=0, ss_vae_zu_dim=N_TOK,
        vae_classes=[0], token_activation_func="softmax",
        torchMoji_linear=True, torchMoji_attDim=8, p_drop_tokens=0.0,
        drop_tokens_mode="zeros", n_speakers=4)
    torch.manual_seed(3)
    ref_gst = RefGST(hp)
    params_gst, bs_gst = convert_gst_state_dict(
        {k: v.detach().numpy() for k, v in ref_gst.state_dict().items()})

    cfg = Tacotron2Config(
        n_symbols=N_SYMBOLS, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, encoder_speaker_embed_dim=4,
        encoder_conv_hidden_dim=16, encoder_lstm_dim=16,
        encoder_n_convolutions=1, torchmoji_dim=8, torchmoji_crushed_dim=4,
        memory_bottleneck_dim=16, prenet_dim=8, attention_rnn_dim=16,
        decoder_rnn_dim=16, second_decoder_rnn_dim=0, attention_dim=8,
        windowed_attention_range=4, postnet_embedding_dim=16,
        postnet_n_convolutions=2, postnet_residual_connections=0,
        n_mel_channels=M, use_gst=True, gst_token_num=N_TOK,
        gst_token_embedding_size=E, gst_num_heads=HEADS,
        gst_ref_enc_filters=(4, 4, 8))
    model = Tacotron2(cfg)
    rng = np.random.default_rng(8)
    B, T_txt, T_mel = 2, 10, 24
    batch = dict(
        text=jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T_txt)),
                         jnp.int32),
        text_lengths=jnp.asarray([10, 7], jnp.int32),
        mels=jnp.asarray(rng.standard_normal((B, T_mel, M)), jnp.float32),
        mel_lengths=jnp.asarray([24, 16], jnp.int32),
        speaker_id=jnp.asarray([0, 1], jnp.int32),
        sylps=jnp.full((B,), 4.0))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)

    # graft the converted GST subtree
    params = dict(variables["params"])
    assert set(params_gst) <= set(params["gst"]) | {"map_lin",
                                                    "ss_vae_layers"}
    params["gst"] = {**params["gst"], **params_gst}
    bstats = dict(variables.get("batch_stats", {}))
    bstats["gst"] = {**bstats.get("gst", {}), **bs_gst}
    grafted = {"params": params, "batch_stats": bstats,
               **{k: v for k, v in variables.items()
                  if k not in ("params", "batch_stats")}}

    (out, _), _ = model.apply(
        grafted, **batch, key=jax.random.PRNGKey(3), deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(4)}, mutable=["batch_stats"])
    mel_out = np.asarray(out["mel_outputs_postnet"])
    assert np.isfinite(mel_out).all()

    # the grafted GST actually conditions the output: zeroing ONLY the
    # grafted token embeddings (same mels, same rngs) must change the
    # prediction — comparing different ref mels would be vacuous since
    # they also feed the teacher-forced decoder
    dead = {**grafted, "params": {**params, "gst": {
        **params["gst"],
        "token_embedding": np.zeros_like(params["gst"]["token_embedding"]),
    }}}
    (out2, _), _ = model.apply(
        dead, **batch, key=jax.random.PRNGKey(3), deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(4)}, mutable=["batch_stats"])
    assert not np.allclose(mel_out,
                           np.asarray(out2["mel_outputs_postnet"]))


def test_wn2d_parity_with_reference():
    """Our WN2D (models/waveglow.py) == the reference's causal-height
    WN_2d (_4_mtw/waveglow/glow_ax.py:421-635) with mapped weights, in
    BOTH execution modes: the parallel forward and the streaming
    conv-queue row mode (the fused matmul row step).

    Causality-convention mapping: the reference's height conv covers the
    CURRENT row (causal pad kh-1, kernel reaches rows h-kh+1..h) with the
    one-row shift living in the coupling; ours shifts inside the WN
    (__call__ pads+drops one row; row_step takes the PREVIOUS row). So
    ours(x) == ref(shift_down(x)), and our row h step == ref queue-mode
    fed x[h-1].
    """
    from CookieTTS._4_mtw.waveglow.glow_ax import WN_2d as RefWN2d

    from cookietts_tpu.models.waveglow import WN2D

    B, H, W, L, C, CC = 2, 6, 12, 3, 8, 10
    torch.manual_seed(0)
    ref = RefWN2d(
        n_in_channels=1, cond_in_channels=CC, cond_layers=1,
        cond_hidden_channels=0, cond_kernel_size=1,
        cond_padding_mode="zeros", seperable_conv=False,
        merge_res_skip=False, upsample_mode="linear",
        n_layers=L, n_channels=C, kernel_size_w=3, kernel_size_h=3,
        speaker_embed_dim=0, rezero=False, n_layers_dilations_h=1,
        res_skip=True, upsample_first=True, gated_unit="GTU")
    ref.eval()
    with torch.no_grad():                  # zero-init end is trivial
        ref.end.weight.normal_(0, 0.3)
        ref.end.bias.normal_(0, 0.1)
    for m in [ref.start, *ref.in_layers, *ref.res_skip_layers,
              *ref.cond_layers]:
        torch.nn.utils.remove_weight_norm(m)

    def conv2d_kernel(m):                  # torch [out,in,kh,kw] -> flax
        return np.transpose(m.weight.detach().numpy(), (2, 3, 1, 0))

    params = {
        "start": {"kernel": conv2d_kernel(ref.start),
                  "bias": ref.start.bias.detach().numpy()},
        "cond_layer": {
            "kernel": ref.cond_layers[0].weight.detach().numpy()[:, :, 0].T,
            "bias": ref.cond_layers[0].bias.detach().numpy()},
        "end": {"kernel": conv2d_kernel(ref.end),
                "bias": ref.end.bias.detach().numpy()},
    }
    for i in range(L):
        params[f"in_layer{i}"] = {
            "kernel": conv2d_kernel(ref.in_layers[i]),
            "bias": ref.in_layers[i].bias.detach().numpy()}
        params[f"res_skip{i}"] = {
            "kernel": conv2d_kernel(ref.res_skip_layers[i]),
            "bias": ref.res_skip_layers[i].bias.detach().numpy()}
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, H, W)).astype(np.float32) * 0.5
    cond = rng.standard_normal((B, CC, W)).astype(np.float32)
    x_shift = np.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_shift),
                      torch.from_numpy(cond))      # [2, B, H, W]
    ref_out = ref_out.numpy()

    wn = WN2D(n_layers=L, n_channels=C, kernel_size=3, kernel_size_h=3,
              gated_unit="GTU")
    ours = wn.apply({"params": params}, jnp.asarray(x[..., None]),
                    jnp.asarray(np.swapaxes(cond, 1, 2)))   # [B, H, W, 2]
    ours = np.moveaxis(np.asarray(ours), -1, 0)             # [2, B, H, W]
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)

    # streaming: reference conv-queue mode row-by-row vs our fused
    # matmul row step (the production inverse path)
    cond_all = wn.apply({"params": params},
                        jnp.asarray(np.swapaxes(cond, 1, 2)),
                        method=WN2D.precompute_cond)
    partials = wn.apply({"params": params}, B, W,
                        method=WN2D.init_partials)
    audio_queues = [None] * L
    spect_queues = [None] * L
    for h in range(H):
        x_prev = (np.zeros((B, W, 1), np.float32) if h == 0
                  else x[:, h - 1][..., None].astype(np.float32))
        st, partials = wn.apply(
            {"params": params}, partials, jnp.asarray(x_prev), cond_all,
            method=WN2D.row_step_fused)
        with torch.no_grad():
            out = ref(torch.from_numpy(x_shift[:, h:h + 1]),
                      torch.from_numpy(cond),
                      audio_queues=audio_queues,
                      spect_queues=spect_queues)
            ref_row, audio_queues, spect_queues = out
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(st), -1, 0)[:, :, None],
            ref_row.numpy(), atol=2e-5,
            err_msg=f"row {h} streaming mismatch")


def test_tacotron2_converted_checkpoint_inference_parity():
    """Free-running (INFERENCE-mode) parity with converted weights — the
    path serving actually runs (reference model.py:1044-1080): greedy
    decode feeding back its own frames, all dropout zeroed, gate
    threshold raised so both sides run the full step budget. Covers
    sigmoid gates, alignments, postnet mels, and the
    sylps-from-prediction default (model.py:1058)."""
    from CookieTTS._2_ttm.tacotron2_tm.model import Tacotron2 as RefT2
    from CookieTTS.utils.model.layers import LSTMCellWithZoneout

    from cookietts_tpu.convert import convert_tacotron2_state_dict
    from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

    LSTMCellWithZoneout.check_forward_input = lambda self, *a, **k: None
    LSTMCellWithZoneout.check_forward_hidden = lambda self, *a, **k: None

    h = _ref_tacotron_hparams()
    T_dec = 11
    h.max_decoder_steps = T_dec
    h.gate_threshold = 2.0          # sigmoid <= 1: never early-stops
    torch.manual_seed(7)
    ref = RefT2(h)
    ref.eval()
    ref.decoder.max_decoder_steps = T_dec
    ref.decoder.gate_threshold = 2.0

    rng = np.random.default_rng(3)
    B, T_txt = 2, 9
    text = rng.integers(1, 40, (B, T_txt)).astype(np.int64)
    text_lengths = np.full((B,), T_txt, np.int64)
    speaker_id = np.array([0, 2], np.int64)
    tm_hdn = rng.standard_normal((B, 12)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.inference(
            torch.from_numpy(text), torch.from_numpy(text_lengths),
            torch.from_numpy(speaker_id), torch.from_numpy(tm_hdn),
            gt_sylps=None)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_tacotron2_state_dict(sd)
    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=10,
        encoder_speaker_embed_dim=4,
        encoder_concat_speaker_embed="before_conv",
        encoder_kernel_size=5, encoder_n_convolutions=2,
        encoder_conv_hidden_dim=12, encoder_lstm_dim=16,
        sylpsnet_layer_dims=(8, 8), torchmoji_dim=12,
        torchmoji_crushed_dim=4, torchmoji_batchnorm=True,
        use_memory_bottleneck=True, memory_bottleneck_dim=16,
        memory_bottleneck_bias=False, prenet_dim=8, prenet_layers=2,
        p_prenet_dropout=0.0, attention_rnn_dim=16,
        attrnn_extra_decoder_input=True, p_attrnn_dropout=0.0,
        decoder_rnn_dim=12, p_decrnn_dropout=0.0,
        decoder_residual_connection=False, second_decoder_rnn_dim=12,
        second_decoder_residual_connection=True, attention_type=0,
        attention_dim=8, attention_location_n_filters=6,
        attention_location_kernel_size=5, windowed_attention_range=4,
        windowed_att_pos_learned=True,
        postnet_embedding_dim=16, postnet_kernel_size=5,
        postnet_n_convolutions=3, postnet_residual_connections=3,
        gate_threshold=2.0)
    model = Tacotron2(cfg)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats),
    }
    out = model.apply(
        variables,
        text=jnp.asarray(text, jnp.int32),
        text_lengths=jnp.asarray(text_lengths, jnp.int32),
        speaker_id=jnp.asarray(speaker_id, jnp.int32),
        sylps=None,                       # -> encoder-predicted sylps
        torchmoji_hidden=jnp.asarray(tm_hdn),
        key=jax.random.PRNGKey(0), max_decoder_steps=T_dec,
        method=Tacotron2.inference)

    np.testing.assert_allclose(
        np.transpose(np.asarray(out["mel_outputs_postnet"]), (0, 2, 1)),
        out_ref["pred_mel_postnet"].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(out["gate_outputs"])),
        out_ref["pred_gate"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["alignments"]),
        out_ref["alignments"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_sylps"]),
        out_ref["pred_sylps"].numpy().ravel(), atol=5e-4, rtol=1e-3)


def test_hifigan_discriminators_match_reference():
    """MPD + MSD + GAN losses vs the LIVE reference (models.py:150-301):
    converted weights reproduce the per-branch logits, feature maps, and
    the exact feature/generator/discriminator losses — including MSD
    scale 0's SPECTRAL norm (torch's persistent-u power iteration driven
    to convergence vs our stateless recomputation) and the
    AvgPool1d(4,2,pad=2) scale cascade."""
    from CookieTTS._4_mtw.hifigan.models import (
        MultiPeriodDiscriminator as RefMPD,
        MultiScaleDiscriminator as RefMSD,
        discriminator_loss as ref_d_loss,
        feature_loss as ref_f_loss,
        generator_loss as ref_g_loss)

    from cookietts_tpu.convert.hifigan_torch import (
        convert_hifigan_discriminators)
    from cookietts_tpu.models.hifigan import (
        HiFiGANConfig, MultiPeriodDiscriminator, MultiScaleDiscriminator,
        discriminator_loss, feature_loss, generator_loss)

    torch.manual_seed(0)
    periods = (2, 3)
    ref_mpd = RefMPD(periods=list(periods))
    ref_msd = RefMSD()

    rng = np.random.default_rng(0)
    B, T = 2, 400
    real = rng.standard_normal((B, T)).astype(np.float32) * 0.3
    fake = rng.standard_normal((B, T)).astype(np.float32) * 0.3
    tr = torch.from_numpy(real)[:, None]
    tf = torch.from_numpy(fake)[:, None]

    # converge torch's spectral-norm power-iteration state (one
    # iteration per TRAIN-mode forward), then freeze for the comparison
    # (one power iteration per train-mode forward; several hundred are
    # needed before torch's sigma estimate reaches the true largest
    # singular value our eigh computes exactly)
    ref_msd.train()
    with torch.no_grad():
        for _ in range(400):
            ref_msd(tr[:1, :, :64], tf[:1, :, :64])
    ref_msd.eval()
    ref_mpd.eval()

    with torch.no_grad():
        r_rs, r_gs, r_fr, r_fg = ref_mpd(tr, tf)
        s_rs, s_gs, s_fr, s_fg = ref_msd(tr, tf)
        ref_losses = (
            float(ref_f_loss(r_fr, r_fg) + ref_f_loss(s_fr, s_fg)),
            float(ref_g_loss(r_gs)[0] + ref_g_loss(s_gs)[0]),
            float(ref_d_loss(r_rs, r_gs)[0] + ref_d_loss(s_rs, s_gs)[0]),
        )

    mpd_params, msd_params = convert_hifigan_discriminators(
        ref_mpd.state_dict(), ref_msd.state_dict(), periods=periods)
    cfg = HiFiGANConfig(mpd_periods=periods)
    mpd = MultiPeriodDiscriminator(cfg)
    msd = MultiScaleDiscriminator(cfg)
    jr, jf = jnp.asarray(real), jnp.asarray(fake)
    m_rs, m_gs, m_fr, m_fg = mpd.apply({"params": mpd_params}, jr, jf)
    x_rs, x_gs, x_fr, x_fg = msd.apply({"params": msd_params}, jr, jf)

    for got, ref_l in zip(m_rs + x_rs, r_rs + s_rs):
        np.testing.assert_allclose(np.asarray(got), ref_l.numpy(),
                                   atol=2e-4, rtol=1e-3)
    # every feature map of every branch
    for got_f, ref_f in zip(m_fr + x_fr, r_fr + s_fr):
        for g, r in zip(got_f, ref_f):
            g = np.asarray(g)
            r = r.numpy()
            # ours is channels-last
            r_cl = np.moveaxis(r, 1, -1)
            np.testing.assert_allclose(g.reshape(r_cl.shape), r_cl,
                                       atol=2e-4, rtol=1e-3)

    got_losses = (
        float(feature_loss(m_fr, m_fg) + feature_loss(x_fr, x_fg)),
        float(generator_loss(m_gs) + generator_loss(x_gs)),
        float(discriminator_loss(m_rs, m_gs)
              + discriminator_loss(x_rs, x_gs)),
    )
    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-4)


def test_denoiser_matches_reference():
    """Spectral denoiser vs the LIVE reference (denoiser.py:7-71): with
    the same vocoder bias audio, the stored mean bias spectrum and the
    denoised output (STFT subtract, clamp 0, inverse with original
    phase) agree. The vocoder is a stub returning fixed audio — vocoder
    parity itself is covered by the WaveGlow conversion test."""
    from tests.test_audio import _ensure_librosa_stub
    _ensure_librosa_stub()
    from CookieTTS._4_mtw.waveglow.denoiser import Denoiser as RefDenoiser

    from cookietts_tpu.models.denoiser import Denoiser

    rng = np.random.default_rng(0)
    T_bias = 8 * 128
    bias_audio = (0.02 * rng.standard_normal(T_bias)).astype(np.float32)

    class _StubWG:
        def parameters(self):
            yield torch.zeros(1)

        def infer(self, mel, speaker_ids=None, sigma=None):
            return torch.from_numpy(bias_audio)[None]

    ref = RefDenoiser(_StubWG(), filter_length=512, hop_length=128,
                      win_length=512, n_mel_channels=16, n_frames=8,
                      stft_device="cpu")

    ours = Denoiser(lambda mel, key: jnp.asarray(bias_audio)[None],
                    filter_length=512, hop_length=128, win_length=512,
                    n_mel_channels=16, n_frames=8)

    np.testing.assert_allclose(
        np.asarray(ours.bias_spec)[0, 0],
        ref.bias_spec.numpy()[0, :, 0], atol=1e-5, rtol=1e-4)

    audio = (0.3 * np.sin(2 * np.pi * 440 * np.arange(4096) / 48000)
             + 0.01 * rng.standard_normal(4096)).astype(np.float32)
    batch = np.stack([audio, 0.7 * audio])
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(batch), strength=0.2).numpy()
    got = np.asarray(ours(jnp.asarray(batch), strength=0.2))
    ref_out = ref_out.reshape(2, -1)
    n = min(got.shape[-1], ref_out.shape[-1])
    np.testing.assert_allclose(got[:, :n], ref_out[:, :n],
                               atol=2e-5, rtol=1e-3)


def test_dynamic_loss_scaler_matches_reference():
    """fp16 DynamicLossScaler state machine vs the live reference
    (loss_scaler.py:31-69): identical scale trajectory over a mixed
    overflow/good-step sequence (halve-on-overflow with floor 1, double
    every scale_window good steps since the last overflow)."""
    from CookieTTS._2_ttm.tacotron2_tm.loss_scaler import (
        DynamicLossScaler as RefScaler)

    from cookietts_tpu.runtime.optim import DynamicLossScaler

    ref = RefScaler(init_scale=2.0 ** 8, scale_factor=2.0, scale_window=4)
    ours = DynamicLossScaler(scale=2.0 ** 8, scale_factor=2.0,
                             scale_window=4)
    rng = np.random.default_rng(0)
    overflows = ([False] * 6 + [True] + [False] * 9 + [True, True]
                 + [False] * 12 + list(rng.random(40) < 0.2))
    for i, ov in enumerate(overflows):
        ref.update_scale(bool(ov))
        ours.step(bool(ov))
        assert ours.scale == ref.loss_scale, (i, ov, ours.scale,
                                              ref.loss_scale)


# -- HiFiGAN_Denoiser parity (modules.py WN/PostNet/DW/DS, model.py MRS) ----

def _wn_fill(params, wrapper, tconv):
    """Fill a flax nn.WeightNorm conv (wrapper + sibling Conv_j) from a
    torch conv whose weight norm was removed: v := w, scale := ||w||
    (so scale * v/||v|| == w exactly)."""
    scales = [k for k in params[wrapper] if k.endswith("/kernel/scale")]
    conv_name = scales[0].split("/")[0]
    w = tconv.weight.detach().numpy()            # [out, in/g, k]
    k = np.transpose(w, (2, 1, 0))               # -> [k, in/g, out]
    params[conv_name]["kernel"] = k.astype(np.float32)
    params[conv_name]["bias"] = tconv.bias.detach().numpy()
    norm = np.sqrt((k ** 2).sum(axis=tuple(range(k.ndim - 1))))
    params[wrapper][scales[0]] = norm.reshape(
        params[wrapper][scales[0]].shape).astype(np.float32)


def test_denoiser_wn_generator_matches_reference():
    """DenoiserWN (stage 0 and stage 1) == the reference HiFiGAN
    generator: WN (modules.py:247-326, incl. the last-layer skip-only
    res_skip and the end conv) -> 1x1 WN_end, and at stage 1 -> PostNet
    (modules.py:327-353, even kernel with ALTERNATING asymmetric pads,
    learned 0.01 residual weights) -> 1x1 postnet_end
    (model.py:178-211)."""
    import dataclasses

    from CookieTTS._4_mtw.HiFiGAN_Denoiser.modules import PostNet as RefPN
    from CookieTTS._4_mtw.HiFiGAN_Denoiser.modules import WN as RefWN

    from cookietts_tpu.models.hifigan_denoiser import (
        DenoiserWN, HiFiGANDenoiserConfig)

    L, C, OUT = 3, 8, 8
    torch.manual_seed(0)
    ref_wn = RefWN(1, OUT, n_layers=L, n_channels=C, kernel_size=3,
                   end_kernel_size=5, dilations=[1, 2, 4])
    ref_pn = RefPN(OUT, OUT, n_layers=2, n_channels=OUT, kernel_size=6)
    wn_end = torch.nn.Conv1d(OUT, 1, 1)
    pn_end = torch.nn.Conv1d(OUT, 1, 1)
    ref_wn.eval()
    for m in [ref_wn.start, ref_wn.end, *ref_wn.in_layers,
              *ref_wn.res_skip_layers]:
        torch.nn.utils.remove_weight_norm(m)

    cfg = HiFiGANDenoiserConfig(
        wn_layers=L, wn_channels=C, kernel_size=3, end_kernel_size=5,
        wn_dilations=(1, 2, 4), postnet_layers=2, postnet_channels=OUT,
        postnet_kernel_size=6, stage=0)
    gen = DenoiserWN(cfg)
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 96)).astype(np.float32) * 0.3
    params = jax.device_get(
        jax.jit(gen.init)(jax.random.PRNGKey(0),
                          jnp.asarray(audio)))["params"]

    wn_p = params["wn"]
    _wn_fill(wn_p, "start", ref_wn.start)
    _wn_fill(wn_p, "end", ref_wn.end)
    for i in range(L):
        _wn_fill(wn_p, f"in_layer{i}", ref_wn.in_layers[i])
        _wn_fill(wn_p, f"res_skip{i}", ref_wn.res_skip_layers[i])
    params["wn_end"] = {
        "kernel": wn_end.weight.detach().numpy().transpose(2, 1, 0),
        "bias": wn_end.bias.detach().numpy()}

    with torch.no_grad():
        t = torch.from_numpy(audio).unsqueeze(1)
        ref_h = ref_wn(t)                               # [B, OUT, T]
        ref0 = wn_end(ref_h).squeeze(1).numpy()
    got0 = np.asarray(gen.apply({"params": params}, jnp.asarray(audio)))
    np.testing.assert_allclose(got0, ref0, atol=3e-5)

    # stage 1: + PostNet + postnet_end
    cfg1 = dataclasses.replace(cfg, stage=1)
    gen1 = DenoiserWN(cfg1)
    params1 = jax.device_get(
        jax.jit(gen1.init)(jax.random.PRNGKey(0),
                           jnp.asarray(audio)))["params"]
    params1["wn"] = params["wn"]
    pn = params1["postnet"]
    pn["res_weights"] = ref_pn.res_weights.detach().numpy()
    for i in range(2):
        pn[f"conv{i}"] = {
            "kernel": ref_pn.convs[i].weight.detach().numpy()
            .transpose(2, 1, 0),
            "bias": ref_pn.convs[i].bias.detach().numpy()}
    params1["postnet_end"] = {
        "kernel": pn_end.weight.detach().numpy().transpose(2, 1, 0),
        "bias": pn_end.bias.detach().numpy()}
    with torch.no_grad():
        ref1 = pn_end(ref_pn(ref_h)).squeeze(1).numpy()
    got1 = np.asarray(gen1.apply({"params": params1}, jnp.asarray(audio)))
    np.testing.assert_allclose(got1, ref1, atol=3e-5)


def test_denoiser_dw_matches_reference():
    """WaveDiscriminator == the reference DW (modules.py:421-483):
    multi-scale MelGAN-style critic with VALID grouped strided
    weight-norm convs, learned res/layr mixing with a CENTER-CROP skip
    at the original rate, avg-pool(4,2) between scales, summed logits."""
    from CookieTTS._4_mtw.HiFiGAN_Denoiser.modules import DW as RefDW

    from cookietts_tpu.models.hifigan_denoiser import (
        HiFiGANDenoiserConfig, WaveDiscriminator)

    spec = dict(kernel_sizes=[7, 5, 3], strides=[2, 2, 1],
                n_channels=[4, 8, 1], group_sizes=[1, 2, 1])
    torch.manual_seed(0)
    ref = RefDW(n_discriminators=2, **spec)
    for mod in ref.dw_modules:
        for c in mod.convs:
            torch.nn.utils.remove_weight_norm(c)

    cfg = HiFiGANDenoiserConfig(
        dw_n_discriminators=2,
        dw_kernel_sizes=tuple(spec["kernel_sizes"]),
        dw_strides=tuple(spec["strides"]),
        dw_channels=tuple(spec["n_channels"]),
        dw_group_sizes=tuple(spec["group_sizes"]))
    dw = WaveDiscriminator(cfg)
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((2, 300)).astype(np.float32) * 0.3
    params = jax.device_get(
        jax.jit(dw.init)(jax.random.PRNGKey(0),
                         jnp.asarray(audio)))["params"]
    for i, mod in enumerate(ref.dw_modules):
        sub = params[f"dw{i}"]
        sub["res_weights"] = mod.res_weights.detach().numpy()
        sub["layr_weights"] = mod.layr_weights.detach().numpy()
        for j, conv in enumerate(mod.convs):
            _wn_fill(sub, f"conv{j}", conv)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(audio)).numpy()
    got = np.asarray(dw.apply({"params": params}, jnp.asarray(audio)))
    np.testing.assert_allclose(got, ref_out, atol=3e-5)


def test_denoiser_ds_matches_reference_and_fixes_height_bug():
    """SpectDiscriminator == the reference DS (modules.py:356-420) with
    mapped weights in training mode (BatchNorm batch stats), on a config
    where the reference's end-conv height arithmetic happens to hold
    (kernel_h=1). With ANY kernel_h > 1 the reference computes
    ``remaining_h //= stride_h`` (modules.py:406) ignoring the VALID
    kernel shrink and CRASHES on its own default config — we track the
    true height (documented deviation, docs/MIGRATION.md)."""
    from CookieTTS._4_mtw.HiFiGAN_Denoiser.modules import DS as RefDS

    from cookietts_tpu.models.hifigan_denoiser import (
        HiFiGANDenoiserConfig, SpectDiscriminator)

    # kernel_h=1 keeps the reference's height bookkeeping correct
    confs = [dict(kernel_h=1, kernel_w=3, stride_h=2, stride_w=2,
                  n_channels=4),
             dict(kernel_h=1, kernel_w=3, stride_h=1, stride_w=2,
                  n_channels=4)]
    torch.manual_seed(0)
    ref = RefDS(window_lengths=[64, 32], filter_lengths=[64, 32],
                hop_lengths=[16, 8], block_confs=confs)
    ref.train()

    cfg = HiFiGANDenoiserConfig(
        window_lengths=(64, 32), hop_lengths=(16, 8),
        ds_block_confs=tuple((c["kernel_h"], c["kernel_w"],
                              c["stride_h"], c["stride_w"],
                              c["n_channels"]) for c in confs))
    ds = SpectDiscriminator(cfg)
    rng = np.random.default_rng(3)
    H = 2 * 32                                   # n_banks * max_fil//2
    spect = rng.standard_normal((2, H, 24)).astype(np.float32)
    params = jax.device_get(
        jax.jit(ds.init)(jax.random.PRNGKey(0),
                         jnp.asarray(spect)))["params"]
    for i, block in enumerate(ref.blocks):
        sub = params[f"block{i}"]
        sub["conv"] = {
            "kernel": block.conv.weight.detach().numpy()
            .transpose(2, 3, 1, 0),
            "bias": block.conv.bias.detach().numpy()}
        sub["bn_scale"] = block.bn.weight.detach().numpy()
        sub["bn_bias"] = block.bn.bias.detach().numpy()
        sub["glu"] = {
            "kernel": block.GLU.conv.weight.detach().numpy()
            .transpose(2, 3, 1, 0),
            "bias": block.GLU.conv.bias.detach().numpy()}
    params["end_conv"] = {
        "kernel": ref.end_conv.weight.detach().numpy()
        .transpose(2, 3, 1, 0),
        "bias": ref.end_conv.bias.detach().numpy()}
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(spect)).numpy()
    got = np.asarray(ds.apply({"params": params}, jnp.asarray(spect)))
    np.testing.assert_allclose(got, ref_out, atol=3e-5, rtol=1e-4)

    # the reference's own DEFAULT config (kernel_h=3) crashes: end_conv
    # is built taller than its input. Ours runs (deviation is a fix).
    bad_confs = [dict(kernel_h=3, kernel_w=3, stride_h=1, stride_w=2,
                      n_channels=4)]
    ref_bad = RefDS(window_lengths=[64], filter_lengths=[64],
                    hop_lengths=[16], block_confs=bad_confs)
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            ref_bad(torch.from_numpy(spect[:, :32]))
    cfg_bad = HiFiGANDenoiserConfig(
        window_lengths=(64,), hop_lengths=(16,),
        ds_block_confs=((3, 3, 1, 2, 4),))
    ds_bad = SpectDiscriminator(cfg_bad)
    v = jax.jit(ds_bad.init)(jax.random.PRNGKey(0),
                             jnp.asarray(spect[:, :32]))
    out = ds_bad.apply(v, jnp.asarray(spect[:, :32]))
    assert out.shape == (2,) and np.isfinite(np.asarray(out)).all()


def test_denoiser_mrs_arrangement_matches_reference():
    """MultiResSpect's cut/reshape/concat == a direct transcription of
    the reference arrangement (model.py:22-36: drop Nyquist bin, cut
    every bank to a common multiple of the tallest bank's channel
    count, reshape to [B, max_channels, -1], concat) applied to the same
    per-bank magnitudes. (The STFT banks themselves carry their own
    reference parity tests in this file.)"""
    from cookietts_tpu.models.hifigan_denoiser import MultiResSpect

    mrs = MultiResSpect((64, 128), (16, 32))
    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    specs = [np.asarray(s) for s in mrs.per_bank(audio)]

    max_ch = 64
    min_ct = int(9e9)
    for s in specs:
        B, C, T = s.shape
        min_ct = min(min_ct, (C * T) // max_ch * max_ch)
    want = np.concatenate(
        [s[:, :, : min_ct // s.shape[1]].reshape(s.shape[0], max_ch, -1)
         for s in specs], axis=1)

    got = np.asarray(mrs(audio))
    np.testing.assert_allclose(got, want, atol=0)
    assert got.shape[1] == 2 * max_ch
