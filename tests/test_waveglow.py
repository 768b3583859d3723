"""WaveGlow/WaveFlow flow vocoder invertibility + logdet parity tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.models.waveglow import (
    WaveGlow, WaveGlowConfig, waveglow_loss)


def tiny_cfg(**kw):
    base = dict(
        n_mel_channels=6, n_flows=2, n_group=4, n_early_every=0,
        n_early_size=0, n_layers=2, n_channels=8, kernel_size=3,
        hop_length=4, upsample_strides=(1,), upsample_channels=8,
        memory_efficient=False,
    )
    base.update(kw)
    return WaveGlowConfig(**base)


def _data(rng, cfg, B=2, T=32):
    audio = rng.standard_normal((B, T)).astype(np.float32)
    T_mel = T // cfg.hop_length
    mel = rng.standard_normal((B, T_mel, cfg.n_mel_channels)).astype(np.float32)
    return jnp.asarray(audio), jnp.asarray(mel)


@pytest.mark.parametrize("mixing", ["1x1conv", "permuteheight"])
def test_forward_inverse_roundtrip(mixing):
    cfg = tiny_cfg(channel_mixing=mixing)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    audio, mel = _data(rng, cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), audio, mel)

    @jax.jit
    def roundtrip(v, audio, mel):
        out = model.apply(v, audio, mel)
        rec = model.apply(v, out["z"], mel, method=WaveGlow.inverse)
        return out, rec

    out, rec = roundtrip(variables, audio, mel)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(audio),
                               atol=2e-3, rtol=1e-3)
    assert np.isfinite(float(out["log_s_sum"]))


def test_early_output_roundtrip():
    cfg = tiny_cfg(n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
                   hop_length=8)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(1)
    audio, mel = _data(rng, cfg, T=64)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), audio, mel)

    @jax.jit
    def roundtrip(v, audio, mel):
        out = model.apply(v, audio, mel)
        rec = model.apply(v, out["z"], mel, method=WaveGlow.inverse)
        return out, rec

    out, rec = roundtrip(variables, audio, mel)
    assert out["z"].shape == (2, 8, 8)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(audio),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("mixing", ["1x1conv", "permuteheight"])
def test_logdet_matches_jacobian(mixing):
    """sum(log_s) + logdet_W must equal log|det dz/dx| exactly."""
    cfg = tiny_cfg(channel_mixing=mixing, n_flows=2, n_group=4,
                   n_layers=1, n_channels=4, hop_length=4)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(2)
    B, T = 1, 16
    audio, mel = _data(rng, cfg, B=B, T=T)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), audio, mel)

    def fwd_flat(a_flat):
        out = model.apply(variables, a_flat.reshape(B, T), mel)
        return out["z"].reshape(-1)

    jac = jax.jacrev(fwd_flat)(audio.reshape(-1))
    _, logdet_ref = np.linalg.slogdet(np.asarray(jac))
    out = model.apply(variables, audio, mel)
    logdet_model = float(out["log_s_sum"] + out["logdet_w_sum"])
    np.testing.assert_allclose(logdet_model, float(logdet_ref),
                               atol=1e-3, rtol=1e-4)


def test_infer_and_loss():
    cfg = tiny_cfg()
    model = WaveGlow(cfg)
    rng = np.random.default_rng(4)
    audio, mel = _data(rng, cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), audio, mel)

    @jax.jit
    def run(v, audio, mel, key):
        out = model.apply(v, audio, mel)
        loss, loss_dict = waveglow_loss(out, sigma=1.0)
        gen = model.apply(v, mel, key, method=WaveGlow.infer)
        return loss, gen

    loss, gen = run(variables, audio, mel, jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
    assert gen.shape == audio.shape
    assert np.all(np.isfinite(np.asarray(gen)))


def test_waveflow_causality():
    """WaveFlow coupling output row h must not depend on input rows >= h."""
    cfg = tiny_cfg(channel_mixing="permuteheight", n_flows=1, n_group=4)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(5)
    audio, mel = _data(rng, cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), audio, mel)

    def z_of(a):
        return np.asarray(model.apply(variables, a, mel)["z"])

    z0 = z_of(audio)
    # perturb the LAST row group (samples 3, 7, 11, ... under squeeze
    # [B, W, H] -> rows are audio[i*G + h]): row h=3 is every 4th sample +3.
    # After the flow's height permutation, changing input row r only affects
    # output rows where r appears at/above — overall z must still be the
    # same for rows strictly before r in permuted order.
    a2 = np.asarray(audio).copy()
    a2[:, 3::4] += 1.0            # input height row 3
    z1 = z_of(jnp.asarray(a2))
    diff_rows = np.unique(np.nonzero(
        np.abs(z1 - z0).sum(axis=(0, 2)) > 1e-6)[0])
    # with bipartize(flow 0) order = [1,0,3,2] (halves reversed): input row 3
    # sits at permuted position 2 -> affects permuted rows >= 2 plus its own
    # affine output; rows 0 and 1 must be untouched
    assert 0 not in diff_rows and 1 not in diff_rows, diff_rows


def test_gated_unit_zoo_finite_and_differentiable():
    """Every unit in the zoo (reference glow_ax.py:36-170 spec table)
    produces finite values and gradients; SIREN units' x16 pre-scale is
    outside autograd (stop_gradient), matching the reference's
    detach().mul_(16) trick."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cookietts_tpu.models.waveglow import GATED_UNITS

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    assert len(GATED_UNITS) >= 15
    for name, fn in GATED_UNITS.items():
        out = fn(a, b)
        assert np.all(np.isfinite(np.asarray(out))), name
        ga, gb = jax.grad(lambda a, b: jnp.sum(fn(a, b)), argnums=(0, 1))(a, b)
        assert np.all(np.isfinite(np.asarray(ga))), name
        assert np.all(np.isfinite(np.asarray(gb))), name
    # SIREN pre-scale is invisible to autograd: d/da sin(16a) records
    # cos(16a) * 1, not * 16
    g = jax.grad(lambda x: jnp.sum(GATED_UNITS["GSIRU"](x, b)))(a)
    expect = jnp.cos(16.0 * a) * jax.nn.sigmoid(b)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect), atol=1e-5)


@pytest.mark.parametrize("kh", [2, 3])
def test_fused_inverse_matches_queue_inverse(kh):
    """The MXU matmul partial-sum streaming inverse (row_step_fused) is
    numerically identical to the conv-queue streaming inverse — same
    params, same math, 3x fewer FLOPs (round-3 WaveFlow perf item)."""
    import dataclasses
    cfg = tiny_cfg(channel_mixing="permuteheight", n_flows=3, n_group=8,
                   n_layers=3, n_channels=12, kernel_size_h=kh,
                   hop_length=16, upsample_strides=(2,))
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    audio, mel = _data(rng, cfg, B=2, T=64)
    v = model.init(jax.random.PRNGKey(0), audio, mel)
    z = jnp.asarray(rng.standard_normal((2, 8, 64 // 8)), jnp.float32)
    x_fused = model.apply(v, z, mel, method=WaveGlow.inverse)
    old = WaveGlow(dataclasses.replace(cfg, fused_height_inverse=False))
    x_queue = old.apply(v, z, mel, method=WaveGlow.inverse)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_queue),
                               atol=1e-5, rtol=1e-5)
    # and fwd∘inverse is still the identity through the fused path
    out = model.apply(v, audio, mel)
    rec = model.apply(v, out["z"], mel, method=WaveGlow.inverse)
    np.testing.assert_allclose(np.asarray(rec),
                               np.asarray(audio[:, :rec.shape[1]]),
                               atol=1e-4)


@pytest.mark.parametrize("kh", [2, 3])
def test_pallas_row_step_inverse_matches(kh):
    """The fully-fused Pallas row-step inverse (all WN layers VMEM-
    resident per width tile, ops/pallas_kernels.waveflow_row_step) equals
    the matmul streaming inverse — interpret mode on CPU, bit-exact."""
    import dataclasses
    cfg = tiny_cfg(channel_mixing="permuteheight", n_flows=3, n_group=8,
                   n_layers=3, n_channels=16, kernel_size_h=kh,
                   hop_length=16, upsample_strides=(2,),
                   pallas_row_tile=256)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    audio, mel = _data(rng, cfg, B=2, T=64)
    v = model.init(jax.random.PRNGKey(0), audio, mel)
    z = jnp.asarray(rng.standard_normal((2, 8, 64 // 8)), jnp.float32)
    x_mm = model.apply(v, z, mel, method=WaveGlow.inverse)
    pall = WaveGlow(dataclasses.replace(cfg, pallas_row_step=True))
    x_pl = pall.apply(v, z, mel, method=WaveGlow.inverse)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_mm),
                               atol=1e-5, rtol=1e-5)


def test_pallas_row_step_inverse_matches_multi_tile():
    """MULTI-TILE regression for the fused Pallas row step: with several
    width tiles per grid, each tile's left queue halo lies inside the
    previous tile's center — naive in-place queue writes make later
    tiles read NEXT-step rows (TPU grid programs run sequentially;
    verified corrupting on-chip). The kernel's deferred-write pipeline
    (stage in VMEM, write the previous tile's center after this tile's
    halo reads) must keep the in-place-aliased update hazard-free.
    W per row = 256 with pallas_row_tile=128 -> 2 tiles."""
    import dataclasses
    cfg = tiny_cfg(channel_mixing="permuteheight", n_flows=2, n_group=4,
                   n_layers=3, n_channels=8, kernel_size_h=2,
                   hop_length=64, upsample_strides=(4, 4),
                   upsample_channels=8, pallas_row_tile=128)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    T = 4 * 256                           # W = T / n_group = 256
    audio, mel = _data(rng, cfg, B=1, T=T)
    v = model.init(jax.random.PRNGKey(0), audio, mel)
    z = jnp.asarray(rng.standard_normal((1, 4, 256)), jnp.float32)
    x_mm = model.apply(v, z, mel, method=WaveGlow.inverse)
    pall = WaveGlow(dataclasses.replace(cfg, pallas_row_step=True))
    x_pl = pall.apply(v, z, mel, method=WaveGlow.inverse)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_mm),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("transform", ["first", "second"])
def test_pallas_wn_waveglow_inverse_matches(transform):
    """The fused Pallas WN forward (waveglow_wn_forward) drives the
    WaveGlow inverse to the same result as the stock path — interpret
    mode on CPU, bit-exact, including early outputs and both coupling
    transforms."""
    import dataclasses
    cfg = tiny_cfg(channel_mixing="1x1conv", n_flows=4,
                   n_early_every=(2 if transform == "first" else 0),
                   n_early_size=2, n_group=8, n_layers=3, n_channels=16,
                   hop_length=8, upsample_strides=(1,),
                   couple_transform=transform, pallas_row_tile=256)
    model = WaveGlow(cfg)
    rng = np.random.default_rng(0)
    audio, mel = _data(rng, cfg, B=2, T=128)
    v = model.init(jax.random.PRNGKey(0), audio, mel)
    out = model.apply(v, audio, mel)
    x_ref = model.apply(v, out["z"], mel, method=WaveGlow.inverse)
    pall = WaveGlow(dataclasses.replace(cfg, pallas_row_step=True))
    x_pl = pall.apply(v, out["z"], mel, method=WaveGlow.inverse)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               atol=1e-5, rtol=1e-5)
    # and it still inverts the forward
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(audio),
                               atol=1e-4)


@pytest.mark.parametrize("mixing", ["1x1conv", "permuteheight"])
def test_memory_efficient_matches_plain(mixing):
    """memory_efficient=True (remat-per-flow, the DEFAULT and the
    TPU equivalent of the reference's recompute-from-output invertible
    autograd, efficient_modules.py:108-233) must produce the same loss
    and gradients as the plain path. Regression: jax.checkpoint around
    closures over bound flax submodules leaked tracers out of
    jit(init) — every other test sets memory_efficient=False, so the
    default path was never exercised; the fix is the lifted nn.remat."""
    kw = dict(channel_mixing=mixing)
    if mixing == "1x1conv":
        kw.update(n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
                  hop_length=8)
    cfg_on = tiny_cfg(memory_efficient=True, **kw)
    cfg_off = tiny_cfg(memory_efficient=False, **kw)
    m_on, m_off = WaveGlow(cfg_on), WaveGlow(cfg_off)
    rng = np.random.default_rng(2)
    audio, mel = _data(rng, cfg_on, T=64)
    # the round-2 bug fired at init already (UnexpectedTracerError)
    v = jax.jit(m_on.init)(jax.random.PRNGKey(0), audio, mel)

    def make_loss(m):
        def f(p):
            out = m.apply({"params": p}, audio, mel)
            loss, _ = waveglow_loss(out)
            return loss
        return f

    l_on, g_on = jax.jit(jax.value_and_grad(make_loss(m_on)))(v["params"])
    l_off, g_off = jax.jit(jax.value_and_grad(make_loss(m_off)))(v["params"])
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_on),
                    jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
