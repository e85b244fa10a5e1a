"""Checkpoint-converter integrity: build state dicts with the reference's
exact parameter names (small dims), convert, and verify the results load
into our models (tree-exact) and run."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import hifigan
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models.cfm import CFMConfig
from minimax_speech_tpu.models.decoder_unet import DecoderUNetConfig
from minimax_speech_tpu.models.flow import (FlowConfig, FlowModel,
                                            init_flow_variables)
from minimax_speech_tpu.models.speaker_encoder import SpeakerEncoderConfig
from minimax_speech_tpu.models.upsample_encoder import UpsampleEncoderConfig
from minimax_speech_tpu.utils import convert

R = np.random.default_rng(0)


def arr(*shape):
    return R.standard_normal(shape).astype(np.float32) * 0.05


def tree_paths(tree, prefix=""):
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out += tree_paths(v, p)
        else:
            out.append((p, tuple(v.shape)))
    return sorted(out)


def speaker_sd(prefix, mel_dim, dim, out_dim, blocks):
    sd = {f"{prefix}init.weight": arr(dim, mel_dim, 1),
          f"{prefix}init.bias": arr(dim),
          f"{prefix}output_proj.weight": arr(out_dim, dim),
          f"{prefix}output_proj.bias": arr(out_dim)}
    for i in range(blocks):
        a = f"{prefix}attn.{i}."
        sd |= {a + "norm.weight": arr(dim), a + "norm.bias": arr(dim),
               a + "qkv.weight": arr(3 * dim, dim, 1),
               a + "qkv.bias": arr(3 * dim),
               a + "proj_out.weight": arr(dim, dim, 1),
               a + "proj_out.bias": arr(dim)}
    return sd


LM_CFG = llm_mod.LMConfig(
    llm_input_size=32, llm_output_size=32, speech_token_size=40,
    qwen=qwen2.Qwen2Config(vocab_size=100, hidden_size=32, n_layers=2,
                           n_heads=4, n_kv_heads=2, head_dim=8,
                           intermediate_size=64),
    speaker=SpeakerEncoderConfig(mel_dim=8, model_dim=16, output_dim=12,
                                 num_blocks=1, num_heads=2),
    spk_embed_dim=12)


def test_llm_converter_roundtrip():
    c = LM_CFG
    q = c.qwen
    sd = {"llm_embedding.weight": arr(2, 32),
          "speech_embedding.weight": arr(43, 32),
          "llm_decoder.weight": arr(43, 32), "llm_decoder.bias": arr(43),
          "spk_embed_affine_layer.weight": arr(32, 12),
          "spk_embed_affine_layer.bias": arr(32)}
    sd |= speaker_sd("speaker_encoder.", 8, 16, 12, 1)
    hf = "llm.model.model."
    sd[hf + "embed_tokens.weight"] = arr(q.vocab_size, 32)
    sd[hf + "norm.weight"] = arr(32)
    for i in range(q.n_layers):
        L = f"{hf}layers.{i}."
        sd |= {L + "input_layernorm.weight": arr(32),
               L + "post_attention_layernorm.weight": arr(32),
               L + "self_attn.q_proj.weight": arr(32, 32),
               L + "self_attn.q_proj.bias": arr(32),
               L + "self_attn.k_proj.weight": arr(16, 32),
               L + "self_attn.k_proj.bias": arr(16),
               L + "self_attn.v_proj.weight": arr(16, 32),
               L + "self_attn.v_proj.bias": arr(16),
               L + "self_attn.o_proj.weight": arr(32, 32),
               L + "mlp.gate_proj.weight": arr(64, 32),
               L + "mlp.up_proj.weight": arr(64, 32),
               L + "mlp.down_proj.weight": arr(32, 64)}
    variables = convert.speech_lm_params(sd, c)

    model = llm_mod.SpeechLM(c)
    expect = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    assert tree_paths(variables["params"]) == tree_paths(expect["params"])

    # converted params must run
    plan = llm_mod.build_lm_plan([np.arange(3)], [np.arange(5)],
                                 bistream_flags=[False], eos=40, fill=42)
    loss, acc = model.apply(variables, jnp.asarray(plan["src_type"]),
                            jnp.asarray(plan["tok_id"]),
                            jnp.asarray(plan["target"]),
                            jnp.asarray(plan["seq_len"]), jnp.zeros((1, 32)))
    assert np.isfinite(float(loss))


FLOW_CFG = FlowConfig(
    input_size=16, output_size=8, vocab_size=50, spk_embed_dim=12,
    encoder=UpsampleEncoderConfig(input_size=16, output_size=16,
                                  attention_heads=2, linear_units=32,
                                  num_blocks=1, num_up_blocks=1),
    unet=DecoderUNetConfig(in_channels=32, out_channels=8, channels=(16,),
                           attention_head_dim=8, n_blocks=1,
                           num_mid_blocks=1, num_heads=2),
    speaker=SpeakerEncoderConfig(mel_dim=8, model_dim=16, output_dim=12,
                                 num_blocks=1, num_heads=2))


def conformer_sd(prefix, d, units):
    sa = prefix + "self_attn."
    return {
        prefix + "norm_mha.weight": arr(d), prefix + "norm_mha.bias": arr(d),
        prefix + "norm_ff.weight": arr(d), prefix + "norm_ff.bias": arr(d),
        sa + "linear_q.weight": arr(d, d), sa + "linear_q.bias": arr(d),
        sa + "linear_k.weight": arr(d, d), sa + "linear_k.bias": arr(d),
        sa + "linear_v.weight": arr(d, d), sa + "linear_v.bias": arr(d),
        sa + "linear_out.weight": arr(d, d), sa + "linear_out.bias": arr(d),
        sa + "linear_pos.weight": arr(d, d),
        sa + "pos_bias_u": arr(2, d // 2), sa + "pos_bias_v": arr(2, d // 2),
        prefix + "feed_forward.w_1.weight": arr(units, d),
        prefix + "feed_forward.w_1.bias": arr(units),
        prefix + "feed_forward.w_2.weight": arr(d, units),
        prefix + "feed_forward.w_2.bias": arr(d),
    }


def unet_tf_sd(prefix, dim, inner):
    return {
        prefix + "norm1.weight": arr(dim), prefix + "norm1.bias": arr(dim),
        prefix + "norm3.weight": arr(dim), prefix + "norm3.bias": arr(dim),
        prefix + "attn1.to_q.weight": arr(inner, dim),
        prefix + "attn1.to_k.weight": arr(inner, dim),
        prefix + "attn1.to_v.weight": arr(inner, dim),
        prefix + "attn1.to_out.0.weight": arr(dim, inner),
        prefix + "attn1.to_out.0.bias": arr(dim),
        prefix + "ff.net.0.proj.weight": arr(4 * dim, dim),
        prefix + "ff.net.0.proj.bias": arr(4 * dim),
        prefix + "ff.net.2.weight": arr(dim, 4 * dim),
        prefix + "ff.net.2.bias": arr(dim),
    }


def causal_block_sd(prefix, din, dout):
    return {prefix + "block.0.weight": arr(dout, din, 3),
            prefix + "block.0.bias": arr(dout),
            prefix + "block.2.weight": arr(dout),
            prefix + "block.2.bias": arr(dout)}


def resnet_sd(prefix, din, dout, temb):
    return (causal_block_sd(prefix + "block1.", din, dout)
            | causal_block_sd(prefix + "block2.", dout, dout)
            | {prefix + "mlp.1.weight": arr(dout, temb),
               prefix + "mlp.1.bias": arr(dout),
               prefix + "res_conv.weight": arr(dout, din, 1),
               prefix + "res_conv.bias": arr(dout)})


def test_flow_converter_roundtrip():
    c = FLOW_CFG
    d = c.encoder.output_size
    sd = {"input_embedding.weight": arr(c.vocab_size, c.input_size),
          "spk_embed_affine_layer.weight": arr(c.output_size, 12),
          "spk_embed_affine_layer.bias": arr(c.output_size),
          "encoder_proj.weight": arr(c.output_size, d),
          "encoder_proj.bias": arr(c.output_size)}
    sd |= speaker_sd("speaker_encoder.", 8, 16, 12, 1)
    e = "encoder."
    for emb in ("embed", "up_embed"):
        sd |= {f"{e}{emb}.out.0.weight": arr(d, c.input_size),
               f"{e}{emb}.out.0.bias": arr(d),
               f"{e}{emb}.out.1.weight": arr(d),
               f"{e}{emb}.out.1.bias": arr(d)}
    sd |= {e + "pre_lookahead_layer.conv1.weight": arr(d, d, 4),
           e + "pre_lookahead_layer.conv1.bias": arr(d),
           e + "pre_lookahead_layer.conv2.weight": arr(d, d, 3),
           e + "pre_lookahead_layer.conv2.bias": arr(d),
           e + "up_layer.conv.weight": arr(d, d, 5),
           e + "up_layer.conv.bias": arr(d),
           e + "after_norm.weight": arr(d), e + "after_norm.bias": arr(d)}
    sd |= conformer_sd(e + "encoders.0.", d, c.encoder.linear_units)
    sd |= conformer_sd(e + "up_encoders.0.", d, c.encoder.linear_units)

    u = "decoder.estimator."
    ch = c.unet.channels[0]
    temb = 4 * ch
    inner = c.unet.num_heads * c.unet.attention_head_dim
    sd |= {u + "time_mlp.linear_1.weight": arr(temb, c.unet.in_channels),
           u + "time_mlp.linear_1.bias": arr(temb),
           u + "time_mlp.linear_2.weight": arr(temb, temb),
           u + "time_mlp.linear_2.bias": arr(temb)}
    sd |= resnet_sd(u + "down_blocks.0.0.", c.unet.in_channels, ch, temb)
    sd |= unet_tf_sd(u + "down_blocks.0.1.0.", ch, inner)
    sd |= {u + "down_blocks.0.2.weight": arr(ch, ch, 3),
           u + "down_blocks.0.2.bias": arr(ch)}
    sd |= resnet_sd(u + "mid_blocks.0.0.", ch, ch, temb)
    sd |= unet_tf_sd(u + "mid_blocks.0.1.0.", ch, inner)
    sd |= resnet_sd(u + "up_blocks.0.0.", 2 * ch, ch, temb)
    sd |= unet_tf_sd(u + "up_blocks.0.1.0.", ch, inner)
    sd |= {u + "up_blocks.0.2.weight": arr(ch, ch, 3),
           u + "up_blocks.0.2.bias": arr(ch)}
    sd |= causal_block_sd(u + "final_block.", ch, ch)
    sd |= {u + "final_proj.weight": arr(c.unet.out_channels, ch, 1),
           u + "final_proj.bias": arr(c.unet.out_channels)}

    variables = convert.flow_params(sd, c)
    model = FlowModel(c)
    expect = init_flow_variables(model, jax.random.PRNGKey(0))
    assert tree_paths(variables["params"]) == tree_paths(expect["params"])

    token = jnp.asarray(R.integers(0, 50, (1, 6)))
    feat = jnp.asarray(arr(1, 12, 8))
    loss = model.apply(variables, token, jnp.array([6]), feat,
                       jnp.array([12]), jnp.zeros((1, 12)),
                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def wn_sd(prefix, out, inp, k):
    return {prefix + "weight_g": arr(out, 1, 1) + 1.0,
            prefix + "weight_v": arr(out, inp, k),
            prefix + "bias": arr(out)}


def resblock_sd(prefix, ch, k, n):
    sd = {}
    for i in range(n):
        sd |= wn_sd(f"{prefix}convs1.{i}.", ch, ch, k)
        sd |= wn_sd(f"{prefix}convs2.{i}.", ch, ch, k)
        sd |= {f"{prefix}activations1.{i}.alpha": arr(1, ch, 1) + 1.0,
               f"{prefix}activations2.{i}.alpha": arr(1, ch, 1) + 1.0}
    return sd


HIFT_CFG = hifigan.HiFTConfig(
    in_channels=8, base_channels=16, upsample_rates=(4, 3),
    upsample_kernel_sizes=(8, 5), resblock_kernel_sizes=(3,),
    resblock_dilations=((1, 2),), source_resblock_kernel_sizes=(3, 3),
    source_resblock_dilations=((1,), (1,)), f0_cond_channels=8)


def test_hift_converter_roundtrip():
    c = HIFT_CFG
    nfft2 = c.istft_n_fft + 2
    sd = wn_sd("conv_pre.", 16, 8, 7) | wn_sd("conv_post.", nfft2, 4, 7)
    sd |= {"m_source.l_linear.weight": arr(1, c.nb_harmonics + 1),
           "m_source.l_linear.bias": arr(1)}
    # ups: ConvTranspose weight (in, out, k)
    sd |= {"ups.0.weight_g": arr(16, 1, 1) + 1.0,
           "ups.0.weight_v": arr(16, 8, 8), "ups.0.bias": arr(8),
           "ups.1.weight_g": arr(8, 1, 1) + 1.0,
           "ups.1.weight_v": arr(8, 4, 5), "ups.1.bias": arr(4)}
    # source downs (plain convs): rates cumprod reversed = [3, 1]
    sd |= {"source_downs.0.weight": arr(8, nfft2, 6),
           "source_downs.0.bias": arr(8),
           "source_downs.1.weight": arr(4, nfft2, 1),
           "source_downs.1.bias": arr(4)}
    sd |= resblock_sd("source_resblocks.0.", 8, 3, 1)
    sd |= resblock_sd("source_resblocks.1.", 4, 3, 1)
    sd |= resblock_sd("resblocks.0.", 8, 3, 2)
    sd |= resblock_sd("resblocks.1.", 4, 3, 2)
    for i in range(5):
        sd |= wn_sd(f"f0_predictor.condnet.{2 * i}.", 8, 8 if i else 8, 3)
    sd |= {"f0_predictor.classifier.weight": arr(1, 8),
           "f0_predictor.classifier.bias": arr(1)}

    variables = convert.hift_params(sd, c)
    model = hifigan.HiFTGenerator(c)
    expect = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 8)))
    assert tree_paths(variables["params"]) == tree_paths(expect["params"])

    wav, _ = model.apply(variables, jnp.asarray(arr(1, 6, 8)))
    assert wav.shape == (1, 6 * c.total_upsample)
    assert np.isfinite(np.asarray(wav)).all()
