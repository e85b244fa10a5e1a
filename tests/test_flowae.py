"""flowae track tests: FM math parity vs torch semantics, DiT shapes,
DiTo train/decode roundtrip."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minimax_speech_tpu.flowae import fm as fm_lib
from minimax_speech_tpu.flowae.dit import DiT1D, DiTConfig
from minimax_speech_tpu.flowae.dito import DiToAudio, DiToConfig, dito_decode
from minimax_speech_tpu.flowae.trainer import (eval_reconstruction,
                                               make_dito_step)
from minimax_speech_tpu.train import schedule, steps


def test_fm_schedule_matches_reference():
    cfg = fm_lib.FMConfig(sigma_min=1e-5)
    t = jnp.array([0.0, 0.3, 1.0])
    np.testing.assert_allclose(np.asarray(fm_lib.alpha(t, cfg)),
                               [1.0, 0.7, 0.0])
    np.testing.assert_allclose(
        np.asarray(fm_lib.sigma(t, cfg)),
        [1e-5, 1e-5 + 0.3 * (1 - 1e-5), 1.0], rtol=1e-6)


def test_fm_euler_with_linear_net():
    """With net(x, t) = -x (negative velocity), euler from t=1 to 0 should
    follow x *= (1 - dt) — verify against a torch loop of the reference
    sampler semantics."""
    cfg = fm_lib.FMConfig(use_immiscible=False)

    def net(x, t):
        return -x

    noise = jnp.ones((1, 8, 1))
    ours = fm_lib.euler_sample(net, noise.shape, 7, cfg, noise=noise)

    x = torch.ones(1, 8, 1)
    t_steps = torch.linspace(1, 0, 8)
    for i in range(7):
        x = x + (-x) * (t_steps[i] - t_steps[i + 1])
    np.testing.assert_allclose(np.asarray(ours), x.numpy(), rtol=1e-5)


def test_fm_loss_finite():
    cfg = fm_lib.FMConfig()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 2))
    loss = fm_lib.fm_loss(lambda xt, t: xt * 0.1, jax.random.PRNGKey(1),
                          x, cfg)
    assert np.isfinite(float(loss))


def test_dit_shapes(rng):
    cfg = DiTConfig(hidden=32, depth=2, num_heads=2, patch=4, in_channels=2,
                    out_channels=2, cond_dim=6)
    m = DiT1D(cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 2)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 4, 6)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([0.5, 0.1]), z)
    out = m.apply(params, x, jnp.array([0.5, 0.1]), z)
    assert out.shape == (2, 32, 2)
    # adaLN-zero: at init the network output is exactly zero
    np.testing.assert_allclose(np.asarray(out), 0.0)


TINY_DITO = DiToConfig(
    z_dim=4, enc_channels=8, enc_strides=(4, 4),
    renderer=DiTConfig(hidden=32, depth=2, num_heads=2, patch=16,
                       in_channels=1, out_channels=1, cond_dim=4),
    render_n_steps=3)


@pytest.mark.slow
def test_dito_train_and_decode(rng):
    model = DiToAudio(TINY_DITO)
    audio = jnp.asarray(rng.standard_normal((2, 128, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), audio,
                           jax.random.PRNGKey(1), 0.1,
                           method=DiToAudio.loss)
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx)
    ema = state.params
    step = jax.jit(make_dito_step(model, bf16=False))
    losses = []
    for i in range(3):
        state, ema, m = step(state, ema, {"audio": audio},
                             jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()

    z, mu, _ = model.apply({"params": state.params}, audio,
                           method=DiToAudio.encode)
    assert mu.shape == (2, 8, 4)  # 128 / (4*4)
    rec = dito_decode(model, {"params": state.params}, mu, 128,
                      jax.random.PRNGKey(9))
    assert rec.shape == (2, 128, 1)

    metrics = eval_reconstruction(model, {"params": state.params}, audio,
                                  jax.random.PRNGKey(10), n_steps=2)
    assert np.isfinite(float(metrics["eval/mse"]))


@pytest.mark.slow
def test_glpto_roundtrip_and_steps(rng):
    from minimax_speech_tpu.flowae.glpto import (GLPToAudio, GLPToConfig,
                                                 make_glpto_steps)
    from minimax_speech_tpu.models.discriminators import MSD
    cfg = GLPToConfig(z_dim=4, enc_channels=8, enc_strides=(4, 4))
    model = GLPToAudio(cfg)
    disc = MSD(rate=1)
    audio = jnp.asarray(rng.standard_normal((1, 256, 1)), jnp.float32) * 0.3
    g_vars = model.init(jax.random.PRNGKey(0), audio)
    rec, mu, logvar = model.apply(g_vars, audio)
    assert rec.shape == audio.shape
    assert mu.shape == (1, 16, 4)

    d_vars = disc.init(jax.random.PRNGKey(1), audio[..., 0])
    tx = schedule.make_optimizer(lr=1e-4, warmup_steps=1)
    g_state = steps.make_train_state(g_vars["params"], tx)
    d_state = steps.make_train_state(d_vars["params"], tx)
    gen_step, disc_step = make_glpto_steps(model, disc, cfg)
    d_state, dm = jax.jit(disc_step)(d_state, g_state.params,
                                     {"audio": audio}, jax.random.PRNGKey(2))
    g_state, gm = jax.jit(gen_step)(g_state, d_state.params,
                                    {"audio": audio}, jax.random.PRNGKey(3))
    assert np.isfinite(float(gm["gen/loss"]))
    assert np.isfinite(float(dm["disc/loss"]))
    assert float(gm["gen/adaptive_w"]) >= 0


def test_dit2d_shapes(rng):
    from minimax_speech_tpu.flowae.dit import DiT2D, DiTConfig
    cfg = DiTConfig(hidden=32, depth=1, num_heads=2, patch=4, in_channels=3,
                    out_channels=3, cond_dim=6)
    m = DiT2D(cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([0.2, 0.8]), z)
    out = m.apply(params, x, jnp.array([0.2, 0.8]), z)
    assert out.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out), 0.0)  # adaLN-zero init


@pytest.mark.slow
def test_dito_infer_cli(tmp_path, rng):
    import wave
    from minimax_speech_tpu.cli import dito_infer
    sr = 24000
    a = rng.standard_normal(int(0.3 * sr)).astype(np.float32) * 0.2
    p = tmp_path / "in.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((a * 32767).astype(np.int16).tobytes())
    out = tmp_path / "rec.wav"
    dito_infer.main(["--wav", str(p), "--out", str(out), "--random_init",
                     "--n_steps", "2"])
    assert out.exists()


def test_zdm_train_and_sample(rng):
    """ZDM prior over DiTo latents: trains (loss decreases-ish / finite),
    samples z, decodes audio, eval metrics finite (VERDICT round-1
    item #10; reference: ldm_base.py ZDM paths)."""
    from minimax_speech_tpu.flowae import zdm as zdm_lib

    ae = DiToAudio(TINY_DITO)
    audio = jnp.asarray(rng.standard_normal((2, 64, 1)), jnp.float32)
    ae_vars = ae.init(jax.random.PRNGKey(0), audio, jax.random.PRNGKey(1),
                      0.0, method=DiToAudio.loss)

    zcfg = zdm_lib.ZDMConfig(
        z_dim=TINY_DITO.z_dim,
        net=zdm_lib.DiTConfig(hidden=32, depth=2, num_heads=2, patch=1,
                              in_channels=TINY_DITO.z_dim,
                              out_channels=TINY_DITO.z_dim, cond_dim=0),
        n_steps=4)
    zdm = zdm_lib.ZDMNet(zcfg)
    n_z = 64 // int(np.prod(TINY_DITO.enc_strides))
    zvars = zdm.init(jax.random.PRNGKey(2),
                     jnp.zeros((2, n_z, zcfg.z_dim)), jnp.zeros((2,)))

    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(zvars["params"], tx)
    ema = state.params
    step = jax.jit(zdm_lib.make_zdm_step(zdm, ae, ae_vars))
    for i in range(3):
        state, ema, m = step(state, ema, {"audio": audio},
                             jax.random.PRNGKey(10 + i))
        assert np.isfinite(float(m["zdm/loss"]))

    wav = zdm_lib.zdm_generate(zdm, {"params": state.params}, ae, ae_vars,
                               batch_size=2, z_frames=n_z, out_len=64,
                               key=jax.random.PRNGKey(5), render_steps=3)
    assert wav.shape == (2, 64, 1)
    assert np.isfinite(np.asarray(wav)).all()

    ev = zdm_lib.eval_zdm(zdm, {"params": state.params}, ae, ae_vars,
                          audio, jax.random.PRNGKey(6))
    assert np.isfinite(float(ev["zdm_eval/loss"]))
    assert np.isfinite(float(ev["zdm_eval/sample_std"]))


def test_zdm_zaug_and_normalize():
    from minimax_speech_tpu.flowae import zdm as zdm_lib
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((4, 8, 16)) * 3 + 1, jnp.float32)
    zn = zdm_lib.normalize_latents(z)
    np.testing.assert_allclose(np.asarray(zn.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(zn.std(-1)), 1.0, atol=1e-2)
    cfg = zdm_lib.ZDMConfig(zaug_p=1.0)  # always augment
    za = zdm_lib.zaug(jax.random.PRNGKey(0), zn, cfg)
    assert za.shape == zn.shape
    assert not np.allclose(np.asarray(za), np.asarray(zn))


def test_vqgan_roundtrip_and_steps(rng):
    """VQGAN: quantized AE trains with GAN + perceptual heads
    (VERDICT round-1 item #10; reference: vqgan/*)."""
    from minimax_speech_tpu.flowae import vqgan as vq

    cfg = vq.VQGANConfig(in_channels=3, ch=8, ch_mult=(1, 2),
                         num_res_blocks=1, z_channels=8, n_embed=32,
                         embed_dim=8)
    model = vq.VQGAN(cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    rec, q_loss, idx = model.apply(variables, x)
    assert rec.shape == x.shape
    assert idx.shape == (2, 8, 8)
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 32).all()
    assert np.isfinite(float(q_loss))

    disc = vq.NLayerDiscriminator(ndf=8, n_layers=2)
    d_vars = disc.init(jax.random.PRNGKey(1), x)
    lpips = vq.LPIPS(vq.VGGFeatures(widths=(8, 16), convs_per_stage=(1, 1)))
    p_vars = lpips.init(jax.random.PRNGKey(2), x, x)
    # identical inputs -> zero perceptual distance
    assert abs(float(lpips.apply(p_vars, x, x))) < 1e-6

    tx = schedule.make_optimizer(lr=1e-4, warmup_steps=1)
    g_state = steps.make_train_state(variables["params"], tx)
    d_state = steps.make_train_state(d_vars["params"], tx)
    gen_step, disc_step = vq.make_vqgan_steps(
        model, disc, perceptual=lpips, perceptual_vars=p_vars)
    batch = {"image": x}
    d_state, dm = jax.jit(disc_step)(d_state, g_state.params, batch)
    g_state, gm = jax.jit(gen_step)(g_state, d_state.params, batch)
    assert np.isfinite(float(gm["vq/loss"]))
    assert np.isfinite(float(gm["vq/adaptive_w"]))
    assert np.isfinite(float(dm["disc/loss"]))
