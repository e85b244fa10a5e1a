"""End-to-end pipeline smoke test with tiny geometry (CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.infer import pipeline as pl
from minimax_speech_tpu.models import dac_vae, hifigan
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models import s3tokenizer as s3
from minimax_speech_tpu.models.cfm import CFMConfig
from minimax_speech_tpu.models.decoder_unet import DecoderUNetConfig
from minimax_speech_tpu.models.flow import FlowConfig
from minimax_speech_tpu.models.speaker_encoder import SpeakerEncoderConfig
from minimax_speech_tpu.models.upsample_encoder import UpsampleEncoderConfig
from tests.conftest import synthetic_audio


def tiny_cfg():
    spk = SpeakerEncoderConfig(mel_dim=80, model_dim=16, output_dim=12,
                               num_blocks=1, num_heads=2)
    return pl.TTSConfig(
        lm=llm_mod.LMConfig(
            llm_input_size=32, llm_output_size=32, speech_token_size=6561,
            qwen=qwen2.Qwen2Config(vocab_size=256, hidden_size=32, n_layers=2,
                                   n_heads=4, n_kv_heads=2, head_dim=8,
                                   intermediate_size=64),
            speaker=spk, spk_embed_dim=12),
        flow=FlowConfig(
            input_size=32, output_size=80, vocab_size=6561, spk_embed_dim=12,
            encoder=UpsampleEncoderConfig(input_size=32, output_size=32,
                                          attention_heads=4, linear_units=64,
                                          num_blocks=1, num_up_blocks=1),
            unet=DecoderUNetConfig(in_channels=320, out_channels=80,
                                   channels=(32,), attention_head_dim=8,
                                   n_blocks=1, num_mid_blocks=1, num_heads=2),
            speaker=spk, n_timesteps=2),
        dac=dac_vae.DACVAEConfig(encoder_dim=4, encoder_rates=(2, 3, 4, 4, 5),
                                 latent_dim=80, decoder_dim=32,
                                 decoder_rates=(5, 4, 4, 3, 2)),
        s3=s3.S3TokenizerConfig(n_mels=128, n_state=32, n_head=4, n_layer=1,
                                fsmn_kernel=7),
        max_speech_tokens=32,
    )


@pytest.mark.slow
def test_e2e_synthesis(rng):
    cfg = tiny_cfg()
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))

    prompt_16k = synthetic_audio(rng, 0.6, sr=16000)
    prompt_24k = synthetic_audio(rng, 0.6, sr=24000)

    prompt_tokens = pipe.extract_prompt_tokens(prompt_16k)
    assert prompt_tokens.ndim == 1 and len(prompt_tokens) > 0
    assert prompt_tokens.max() < 6561

    prompt_mel = pipe.extract_prompt_mel(prompt_24k)
    prompt_latent = pipe.extract_prompt_latent(prompt_24k)
    assert prompt_mel.shape[1] == 80 and prompt_latent.shape[1] == 80

    lm_spk, flow_emb = pipe.speaker_embedding(prompt_mel)
    assert lm_spk.shape == (1, 32) and flow_emb.shape == (1, 12)

    text = rng.integers(0, 256, 5)
    ptext = rng.integers(0, 256, 3)
    wav, tim = pipe.synthesize(text, ptext, prompt_tokens, prompt_latent,
                               lm_spk, flow_emb, key=jax.random.PRNGKey(7),
                               return_timings=True)
    assert wav.ndim == 1
    assert tim["tokens"] >= 1
    # latent mode: 2 frames per token, 480 samples per frame
    assert len(wav) == tim["tokens"] * 2 * 480
    assert np.isfinite(wav).all()


@pytest.mark.slow
def test_fused_synthesis_matches_unfused(rng):
    """One-dispatch path must produce the same audio as the staged path
    (same key => same tokens => same latents)."""
    cfg = tiny_cfg()
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    prompt_16k = synthetic_audio(rng, 0.6, sr=16000)
    prompt_24k = synthetic_audio(rng, 0.6, sr=24000)
    prompt_tokens = pipe.extract_prompt_tokens(prompt_16k)
    prompt_latent = pipe.extract_prompt_latent(prompt_24k)
    prompt_mel = pipe.extract_prompt_mel(prompt_24k)
    lm_spk, flow_emb = pipe.speaker_embedding(prompt_mel)
    text = rng.integers(0, 256, 5)
    ptext = rng.integers(0, 256, 3)
    key = jax.random.PRNGKey(11)
    wav_a = pipe.synthesize(text, ptext, prompt_tokens, prompt_latent,
                            lm_spk, flow_emb, key=key)
    wav_b, tim = pipe.synthesize_fused(text, ptext, prompt_tokens,
                                       prompt_latent, lm_spk, flow_emb,
                                       key=key, return_timings=True)
    assert len(wav_a) == len(wav_b) == tim["tokens"] * 2 * 480
    # equal length == identical token sequence (same key). The two
    # paths run the flow at different padded lengths, so fp reduction
    # order differs; with RANDOM weights the conformer+UNet amplify
    # that over 10 Euler steps and the tanh-saturating decoder turns it
    # into per-sample deviations (measured: corr 0.92 at per-sample
    # 1e-2 agreement 0.72) — trained weights are contractive, and the
    # overfit e2e exercises this path at full fidelity. Assert robust
    # equivalence: high waveform correlation + matched energy.
    corr = float(np.corrcoef(wav_a, wav_b)[0, 1])
    assert corr > 0.85, f"fused/unfused corr {corr}"
    ra = float(np.sqrt((wav_a ** 2).mean()))
    rb = float(np.sqrt((wav_b ** 2).mean()))
    assert abs(ra / rb - 1) < 0.1, (ra, rb)
    assert np.isfinite(wav_b).all()


def test_bf16_flow_matches_fp32():
    """cfg.bf16_flow runs the CFM UNet in bfloat16 with fp32 latents at
    the codec boundary; outputs must stay close to the fp32 path
    (measured: corr > 0.9999, rel L1 ~0.6% on random tiny weights)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.infer.pipeline import TTSPipeline

    cfg = cfg_lib.load_tts_config("configs/tiny.yaml")
    p32 = TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    p16 = TTSPipeline.from_random(
        dataclasses.replace(cfg, bf16_flow=True), jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, 100, (1, 32)), jnp.int32)
    tl = jnp.array([32])
    pf = jnp.zeros((1, 16, cfg.flow.output_size))
    emb = jnp.asarray(rng.standard_normal(
        (1, cfg.flow.spk_embed_dim)), jnp.float32)
    f32 = np.asarray(p32._flow_infer(p32.flow_vars, tok, tl, pf, emb,
                                     p32.noise), np.float32)
    f16 = np.asarray(p16._flow_infer(p16.flow_vars, tok, tl, pf, emb,
                                     p16.noise), np.float32)
    corr = np.corrcoef(f32.ravel(), f16.ravel())[0, 1]
    rel = np.abs(f16 - f32).mean() / (np.abs(f32).mean() + 1e-9)
    assert corr > 0.995 and rel < 0.05, (corr, rel)
