"""Discriminators, spectral losses, GAN/DPO training steps (tiny, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import dac_vae, discriminators, hifigan
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.train import gan_steps, schedule, steps
from minimax_speech_tpu.utils import audio_losses, losses
from tests.test_llm import SMALL_LM


TINY_DISC = discriminators.DACDiscriminator(periods=(2, 3), fft_sizes=(256,))


def test_dac_discriminator_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    params = TINY_DISC.init(jax.random.PRNGKey(0), x)
    scores, fmaps = TINY_DISC.apply(params, x)
    assert len(scores) == 3  # 2 MPD + 1 MRD
    assert len(fmaps) == 3
    for s in scores:
        assert np.isfinite(np.asarray(s)).all()


def test_cosyvoice_discriminator(rng):
    d = discriminators.CosyVoiceDiscriminator(periods=(2,), fft_sizes=(256,),
                                              hop_sizes=(64,),
                                              win_lengths=(128,))
    x = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), x)
    scores, fmaps = d.apply(params, x)
    assert len(scores) == 2


def test_spectral_losses_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    assert float(audio_losses.multi_scale_stft_loss(x, x,
                                                    (512, 128))) == 0.0
    assert float(audio_losses.mel_spectrogram_loss(
        x, x, 24000, (5, 10), (128, 256))) == 0.0
    assert float(audio_losses.sisdr_loss(x, x)) < -40  # near-perfect SI-SDR


def test_gan_loss_functions():
    real = [jnp.ones((2, 5)), jnp.ones((2, 3))]
    fake = [jnp.zeros((2, 5)), jnp.zeros((2, 3))]
    # perfect discriminator: real->1, fake->0 => disc loss 0
    assert float(losses.discriminator_loss(real, fake)) == 0.0
    # generator wants fake->1
    assert float(losses.generator_adv_loss(fake)) == 2.0
    assert float(losses.feature_matching_loss([real], [real])) == 0.0


@pytest.mark.slow
def test_dac_gan_training_steps(rng):
    cfg = dac_vae.DACVAEConfig(encoder_dim=4, encoder_rates=(2, 5),
                               latent_dim=6, decoder_dim=16,
                               decoder_rates=(5, 2))
    gen = dac_vae.DACVAE(cfg)
    disc = TINY_DISC
    audio = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32) * 0.3)
    g_vars = gen.init(jax.random.PRNGKey(0), audio[..., None])
    d_vars = disc.init(jax.random.PRNGKey(1), audio)
    tx = schedule.make_optimizer(lr=1e-4, warmup_steps=1)
    g_state = steps.make_train_state(g_vars["params"], tx)
    d_state = steps.make_train_state(d_vars["params"], tx)

    gen_step, disc_step = gan_steps.make_dac_steps(
        gen, disc, gan_steps.DACLambdas(stft=1.0, waveform=1.0))
    batch = {"audio": audio}
    d_state, dm = jax.jit(disc_step)(d_state, g_state.params, batch,
                                     jax.random.PRNGKey(2))
    g_state, gm = jax.jit(gen_step)(g_state, d_state.params, batch,
                                    jax.random.PRNGKey(3))
    assert np.isfinite(float(dm["disc/loss"]))
    assert np.isfinite(float(gm["gen/loss"]))
    assert float(gm["gen/kl"]) >= 0


@pytest.mark.slow
def test_hift_gan_steps(rng):
    vcfg = hifigan.HiFTConfig(in_channels=8, base_channels=16,
                              upsample_rates=(4, 3),
                              upsample_kernel_sizes=(8, 5),
                              resblock_kernel_sizes=(3,),
                              resblock_dilations=((1,),),
                              source_resblock_kernel_sizes=(3, 3),
                              source_resblock_dilations=((1,), (1,)),
                              f0_cond_channels=8)
    gen = hifigan.HiFTGenerator(vcfg)
    disc = discriminators.CosyVoiceDiscriminator(
        periods=(2,), fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    t = 24
    mel = jnp.asarray(rng.standard_normal((1, t, 8)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal(
        (1, t * vcfg.total_upsample)).astype(np.float32) * 0.3)
    g_vars = gen.init(jax.random.PRNGKey(0), mel)
    d_vars = disc.init(jax.random.PRNGKey(1), audio)
    tx = schedule.make_optimizer(lr=1e-4, warmup_steps=1)
    g_state = steps.make_train_state(g_vars["params"], tx)
    d_state = steps.make_train_state(d_vars["params"], tx)
    gen_step, disc_step = gan_steps.make_hift_steps(gen, disc)
    batch = {"speech_feat": mel, "audio": audio}
    d_state, dm = jax.jit(disc_step)(d_state, g_state.params, batch,
                                     jax.random.PRNGKey(2))
    g_state, gm = jax.jit(gen_step)(g_state, d_state.params, batch,
                                    jax.random.PRNGKey(3))
    assert np.isfinite(float(dm["disc/loss"]))
    assert np.isfinite(float(gm["gen/loss"]))


def test_dpo_step(rng):
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    plan = llm_mod.build_lm_plan([np.arange(4)], [np.arange(8)],
                                 bistream_flags=[False], eos=40, fill=42,
                                 pad_to=24)
    plan_rej = llm_mod.build_lm_plan([np.arange(4)], [np.arange(8)[::-1]],
                                     bistream_flags=[False], eos=40, fill=42,
                                     pad_to=24)
    batch = {k: jnp.asarray(v) for k, v in plan.items()}
    batch |= {k + "_rej": jnp.asarray(v) for k, v in plan_rej.items()}
    batch["spk_emb"] = jnp.zeros((1, 32))
    tx = schedule.make_optimizer(lr=1e-4, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx)
    step = jax.jit(gan_steps.make_dpo_step(model, variables["params"]))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["dpo/loss"]))
    # with policy == ref, sigmoid DPO loss is exactly -log sigmoid(0)
    np.testing.assert_allclose(float(metrics["dpo/loss"]), np.log(2),
                               rtol=1e-5)


def test_tpr_loss_matches_reference_semantics(rng):
    """tpr_loss vs a torch replica of the reference formula
    (speech/cosyvoice/utils/losses.py:6-12): masked-subset mean of
    ((dr-dg)-median)^2 where dr < dg + median, truncated as
    tau - relu(tau - L_rel)."""
    import torch

    from minimax_speech_tpu.utils import losses

    def ref_tpr(drs, dgs, tau):
        loss = 0.0
        for dr, dg in zip(drs, dgs):
            dr, dg = torch.tensor(dr), torch.tensor(dg)
            m = torch.median(dr - dg)
            l_rel = torch.mean((((dr - dg) - m) ** 2)[dr < dg + m])
            loss += tau - torch.relu(torch.tensor(tau) - l_rel)
        return float(loss)

    for tau in (0.04, 1e-6):
        drs = [rng.standard_normal(33).astype(np.float32) for _ in range(3)]
        dgs = [rng.standard_normal(33).astype(np.float32) for _ in range(3)]
        got = float(losses.tpr_loss([jnp.asarray(d) for d in drs],
                                    [jnp.asarray(g) for g in dgs], tau))
        want = ref_tpr(drs, dgs, tau)
        assert abs(got - want) < 1e-5, (tau, got, want)
