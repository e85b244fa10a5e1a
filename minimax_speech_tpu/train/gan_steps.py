"""GAN training steps: DAC-VAE codec and HiFT vocoder.

DAC trainer equivalent (reference: dac-vae/train.py:576-793): dual
optimizers; generator loss = lambda-weighted sum of multi-res mel,
multi-scale STFT, waveform L1, beta-annealed KL, adversarial + feature
matching; discriminator LSGAN loss; per-submodule grad norms.

HiFT GAN equivalent (reference: speech/cosyvoice/hifigan/hifigan.py:9-67):
generator loss = adv + feature-match + mel L1 + TPR; discriminator =
LSGAN + TPR.

Both are two jitted steps (gen, disc) sharing the batch; the reference's
alternating update order (disc first, then gen; dac train.py:675-773)
is preserved by the caller.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from minimax_speech_tpu.train.steps import TrainState
from minimax_speech_tpu.train import steps
from minimax_speech_tpu.utils import audio_losses, losses


@dataclass(frozen=True)
class DACLambdas:
    """Loss weights (reference: dac-vae/configs/configx2.yml lambdas)."""
    mel: float = 15.0
    adv_feat: float = 2.0
    adv_gen: float = 1.0
    kl: float = 0.1
    stft: float = 0.0
    waveform: float = 0.0


def kl_beta(step, warmup: int = 10000, beta: float = 1.0):
    """Linear KL beta annealing (reference: dac train.py:704-737)."""
    return jnp.minimum(step.astype(jnp.float32) / warmup, 1.0) * beta


def make_dac_steps(generator, discriminator, lambdas: DACLambdas = DACLambdas(),
                   sample_rate: int = 24000, gan_start_step: int = 0,
                   spectral_warmup_steps: int = 0,
                   spectral_delay_steps: int = 0):
    """Returns (gen_step, disc_step). batch: {'audio': (B, T)}.

    spectral_delay_steps holds the mel/stft weights at EXACTLY zero for
    that many steps; spectral_warmup_steps then ramps them linearly to
    their lambdas. Measured pathology this guards against: the
    log-magnitude terms in mel/stft losses have gradient ~1/|S|, which
    explodes while the decoder output is still near-silent; after global
    clipping those directions drown the waveform-L1 alignment signal and
    training settles permanently into an energy-matched but uncorrelated
    output (recon SNR pinned at ~-1.8 dB). A ramp alone is NOT enough —
    re-measured through the real CLI: a 0->1 ramp over 300 steps crosses
    the re-trap threshold (~0.3 relative weight) long before waveform L1
    has aligned the output, and lands in the same uncorrelated optimum.
    The delay lets L1 bootstrap a correlated signal first (single-crop
    probe: +24 dB SNR in 300 L1-only steps); the spectral terms then
    engage on a healthy output."""

    def disc_step(d_state: TrainState, g_params, batch, key):
        audio = batch["audio"]

        def loss_fn(d_params):
            out = generator.apply({"params": g_params},
                                  audio[..., None], key)
            fake = out["audio"][..., 0]
            real_scores, _ = discriminator.apply({"params": d_params}, audio)
            fake_scores, _ = discriminator.apply(
                {"params": d_params}, jax.lax.stop_gradient(fake))
            return losses.discriminator_loss(real_scores, fake_scores)

        loss, grads = jax.value_and_grad(loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads)
        return d_state, {"disc/loss": loss,
                         "disc/grad_norm": optax.global_norm(grads)}

    def gen_step(g_state: TrainState, d_params, batch, key):
        audio = batch["audio"]

        def loss_fn(g_params):
            out = generator.apply({"params": g_params}, audio[..., None], key)
            fake = out["audio"][..., 0]
            mel = audio_losses.mel_spectrogram_loss(fake, audio, sample_rate) \
                if lambdas.mel else 0.0
            stft = audio_losses.multi_scale_stft_loss(fake, audio) \
                if lambdas.stft else 0.0
            wav = audio_losses.l1_loss(fake, audio) if lambdas.waveform else 0.0
            kl = losses.kl_loss(out["mu"], out["logs"])
            ramp = 1.0
            if spectral_delay_steps > 0 or spectral_warmup_steps > 0:
                past = (g_state.step.astype(jnp.float32)
                        - spectral_delay_steps)
                ramp = jnp.clip(past / max(spectral_warmup_steps, 1),
                                0.0, 1.0)
            use_gan = (g_state.step >= gan_start_step).astype(jnp.float32)
            fake_scores, fake_fmaps = discriminator.apply(
                {"params": d_params}, fake)
            _, real_fmaps = discriminator.apply({"params": d_params}, audio)
            adv = losses.generator_adv_loss(fake_scores)
            feat = losses.feature_matching_loss(real_fmaps, fake_fmaps)
            beta = kl_beta(g_state.step)
            total = (ramp * (lambdas.mel * mel + lambdas.stft * stft)
                     + lambdas.waveform * wav + lambdas.kl * beta * kl
                     + use_gan * (lambdas.adv_gen * adv
                                  + lambdas.adv_feat * feat))
            return total, {"gen/mel": mel, "gen/kl": kl, "gen/adv": adv,
                           "gen/feat": feat}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_state.params)
        g_state = g_state.apply_gradients(grads)
        metrics = {"gen/loss": loss,
                   "gen/grad_norm": optax.global_norm(grads), **aux}
        # per-submodule grad norms (reference: dac-vae/train.py:385-489
        # logs per-component norms to localize divergence)
        metrics.update({f"gen/{k}": v for k, v in steps.
                        grad_norms_by_component(grads, {
                            "encoder_norm": "encoder",
                            "decoder_norm": "decoder"}).items()})
        return g_state, metrics

    return gen_step, disc_step


def make_hift_steps(generator, discriminator, mel_weight: float = 45.0,
                    feat_weight: float = 2.0, tpr_weight: float = 1.0,
                    tpr_tau: float = 0.04, sample_rate: int = 24000):
    """HiFT GAN steps (reference: hifigan/hifigan.py:9-67: adv + feature
    match + 45x mel L1 + TPR + f0 L1 when pitch targets exist).
    batch: {'speech_feat': (B, T, 80) mel, 'audio': (B, T*480) waveform,
    optional 'pitch': (B, T)}."""
    from minimax_speech_tpu.ops import mel as mel_ops

    def gen_mel(x):
        return mel_ops.hifigan_log_mel(x)

    def disc_step(d_state: TrainState, g_params, batch, key):
        def loss_fn(d_params):
            fake, _ = generator.apply({"params": g_params},
                                      batch["speech_feat"], key)
            real_s, _ = discriminator.apply({"params": d_params},
                                            batch["audio"])
            fake_s, _ = discriminator.apply(
                {"params": d_params}, jax.lax.stop_gradient(fake))
            loss = losses.discriminator_loss(real_s, fake_s)
            loss = loss + tpr_weight * losses.tpr_loss(real_s, fake_s, tpr_tau)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads)
        return d_state, {"disc/loss": loss}

    def gen_step(g_state: TrainState, d_params, batch, key):
        def loss_fn(g_params):
            fake, _ = generator.apply({"params": g_params},
                                      batch["speech_feat"], key)
            fake_s, fake_f = discriminator.apply({"params": d_params}, fake)
            real_s, real_f = discriminator.apply({"params": d_params},
                                                 batch["audio"])
            adv = losses.generator_adv_loss(fake_s)
            feat = losses.feature_matching_loss(real_f, fake_f)
            n = min(fake.shape[-1], batch["audio"].shape[-1])
            mel_l = audio_losses.l1_loss(gen_mel(fake[..., :n]),
                                         gen_mel(batch["audio"][..., :n]))
            # generator turn swaps the args (reference hifigan.py:44:
            # tpr_loss(y_d_gs, y_d_rs)) — relativistic direction flipped
            tpr = losses.tpr_loss(fake_s, real_s, tpr_tau)
            total = adv + feat_weight * feat + mel_weight * mel_l \
                + tpr_weight * tpr
            aux = {"gen/adv": adv, "gen/feat": feat,
                   "gen/mel": mel_l, "gen/tpr": tpr}
            if "pitch" in batch:
                f0 = generator.apply({"params": g_params},
                                     batch["speech_feat"],
                                     method=type(generator).predict_f0)
                aux["gen/f0"] = audio_losses.l1_loss(f0, batch["pitch"])
                total = total + aux["gen/f0"]
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_state.params)
        g_state = g_state.apply_gradients(grads)
        return g_state, {"gen/loss": loss, **aux}

    return gen_step, disc_step


def make_dpo_step(model, ref_params, beta: float = 0.01,
                  label_smoothing: float = 0.0, ipo: bool = False):
    """DPO fine-tuning step for the LM (reference: llm.py:570-614 +
    utils/train_utils.py:327-344 pairing + utils/losses.py:24-57).
    batch holds chosen and rejected plans (suffix _rej)."""

    def spk_of(params, batch):
        """spk conditioning: direct spk_emb or in-step speaker encoding
        from reference mels (same contract as steps.make_lm_loss_fn)."""
        if "spk_emb" in batch:
            return batch["spk_emb"]
        import jax.numpy as jnp
        mask = None
        if "reference_mel_len" in batch:
            t = batch["reference_mel"].shape[1]
            mask = (jnp.arange(t)[None] < batch["reference_mel_len"][:, None])
        return model.apply({"params": params}, batch["reference_mel"], mask,
                           method=type(model).embed_speaker)

    def seq_logp(params, batch, suffix=""):
        return model.apply({"params": params}, batch["src_type" + suffix],
                           batch["tok_id" + suffix], batch["target" + suffix],
                           batch["seq_len" + suffix], spk_of(params, batch),
                           method=type(model).sequence_logp)

    def step(state: TrainState, batch):
        ref_chosen = seq_logp(ref_params, batch)
        ref_rej = seq_logp(ref_params, batch, "_rej")

        def loss_fn(params):
            chosen = seq_logp(params, batch)
            rej = seq_logp(params, batch, "_rej")
            loss, cr, rr = losses.dpo_loss(chosen, rej, ref_chosen, ref_rej,
                                           beta, label_smoothing, ipo)
            acc = jnp.mean((cr > rr).astype(jnp.float32))
            return loss, {"dpo/chosen_reward": jnp.mean(cr),
                          "dpo/rejected_reward": jnp.mean(rr),
                          "dpo/reward_acc": acc}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        return state, {"dpo/loss": loss, **aux}

    return step
