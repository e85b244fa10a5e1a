"""Stage-1 LM tests: Qwen2 backbone parity vs HF transformers, plan
construction, KV-cache decode consistency, RAS generation."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models.speaker_encoder import SpeakerEncoderConfig
from minimax_speech_tpu.ops import masks as mask_ops

TINY = qwen2.Qwen2Config(vocab_size=100, hidden_size=32, n_layers=2,
                         n_heads=4, n_kv_heads=2, head_dim=8,
                         intermediate_size=64, rope_theta=1e6)


def hf_tiny():
    from transformers import Qwen2Config as HFConfig, Qwen2ForCausalLM
    cfg = HFConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   intermediate_size=64, rope_theta=1e6,
                   max_position_embeddings=128, rms_norm_eps=1e-6,
                   tie_word_embeddings=True, attention_dropout=0.0)
    torch.manual_seed(11)
    return Qwen2ForCausalLM(cfg).eval()


def test_qwen2_parity_vs_hf(rng):
    hf = hf_tiny()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, embed, _ = qwen2.params_from_hf_state(state, TINY)

    b, t = 2, 9
    x = rng.standard_normal((b, t, 32)).astype(np.float32) * 0.5
    lens = np.array([9, 6], np.int32)
    attn = (np.arange(t)[None] < lens[:, None])
    with torch.no_grad():
        out = hf.model(inputs_embeds=torch.from_numpy(x),
                       attention_mask=torch.from_numpy(attn.astype(np.int64)),
                       output_hidden_states=True, return_dict=True)
    golden = out.hidden_states[-1].numpy()

    m = qwen2.Qwen2Model(TINY)
    pad = jnp.asarray(attn)
    bias = qwen2.causal_bias(pad)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    ours, _ = m.apply(params, jnp.asarray(x), positions, bias)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(ours)[i, :lens[i]],
                                   golden[i, :lens[i]], atol=3e-5)


def test_kv_cache_decode_matches_full_forward(rng):
    """Incremental decode through the preallocated cache must reproduce the
    full-sequence forward logits."""
    m = qwen2.Qwen2Model(TINY)
    b, t = 1, 7
    x = jnp.asarray(rng.standard_normal((b, t, 32)).astype(np.float32))
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    pad = jnp.ones((b, t), bool)
    params = m.init(jax.random.PRNGKey(0), x, positions,
                    qwen2.causal_bias(pad))
    full, _ = m.apply(params, x, positions, qwen2.causal_bias(pad))

    # prefill 4, then decode 3 one by one
    max_len = 16
    cache = qwen2.make_cache(TINY, b, max_len)
    pad4 = jnp.ones((b, 4), bool)
    bias4 = qwen2.causal_bias(pad4)
    extra = jnp.full((b, 1, 4, max_len - 4), -1e10, jnp.float32)
    bias4 = jnp.concatenate([bias4, extra], axis=-1)
    h4, cache = m.apply(params, x[:, :4], positions[:, :4], bias4, cache, 0)
    np.testing.assert_allclose(np.asarray(h4), np.asarray(full[:, :4]),
                               atol=1e-5)
    valid = jnp.concatenate([pad4, jnp.zeros((b, max_len - 4), bool)], 1)
    for i in range(4, 7):
        valid = valid.at[:, i].set(True)
        bias1 = qwen2.cache_bias(valid)
        h1, cache = m.apply(params, x[:, i:i + 1],
                            positions[:, i:i + 1], bias1, cache, i)
        np.testing.assert_allclose(np.asarray(h1)[:, 0],
                                   np.asarray(full[:, i]), atol=1e-5)


def test_build_lm_plan_unistream():
    plan = llm_mod.build_lm_plan([np.array([5, 6, 7])], [np.array([10, 11])],
                                 use_spk=True, bistream_flags=[False])
    # [sos][spk][t,t,t][task][s,s]
    np.testing.assert_array_equal(
        plan["src_type"][0, :8],
        [llm_mod.SRC_SPECIAL, llm_mod.SRC_SPK] + [llm_mod.SRC_TEXT] * 3
        + [llm_mod.SRC_SPECIAL] + [llm_mod.SRC_SPEECH] * 2)
    np.testing.assert_array_equal(plan["tok_id"][0, :8],
                                  [0, 0, 5, 6, 7, 1, 10, 11])
    np.testing.assert_array_equal(
        plan["target"][0, :8], [-1, -1, -1, -1, -1, 10, 11, 6561])
    assert plan["seq_len"][0] == 8


def test_build_lm_plan_bistream():
    text = np.arange(100, 107)  # 7 text tokens
    speech = np.arange(30)      # 30 speech tokens; ratio 30/7 > 3
    plan = llm_mod.build_lm_plan([text], [speech], use_spk=False,
                                 bistream_flags=[True])
    src = plan["src_type"][0]
    tok = plan["tok_id"][0]
    tgt = plan["target"][0]
    n = plan["seq_len"][0]
    # chunk 0: 5 text + 15 speech; chunk 1: 2 text + task + 15 speech
    expect_src = ([llm_mod.SRC_SPECIAL] + [llm_mod.SRC_TEXT] * 5
                  + [llm_mod.SRC_SPEECH] * 15 + [llm_mod.SRC_TEXT] * 2
                  + [llm_mod.SRC_SPECIAL] + [llm_mod.SRC_SPEECH] * 15)
    np.testing.assert_array_equal(src[:n], expect_src)
    # full chunk target ends with fill token, final with eos
    assert tgt[5 + 15] == 6563  # fill after chunk-0's 15 speech targets
    assert tgt[n - 1] == 6561
    # speech targets of chunk 0 start after 4 IGNOREs
    np.testing.assert_array_equal(tgt[1 + 4: 1 + 4 + 15], speech[:15])


SMALL_LM = llm_mod.LMConfig(
    llm_input_size=32, llm_output_size=32, speech_token_size=40,
    qwen=TINY,
    speaker=SpeakerEncoderConfig(mel_dim=8, model_dim=16, output_dim=12,
                                 num_blocks=1, num_heads=2),
    spk_embed_dim=12,
)


@pytest.fixture(scope="module")
def lm():
    m = llm_mod.SpeechLM(SMALL_LM)
    plan = llm_mod.build_lm_plan(
        [np.array([5, 6, 7]), np.array([8, 9])],
        [np.array([10, 11, 12, 13]), np.array([14, 15])],
        use_spk=True, bistream_flags=[False, False],
        eos=40, fill=42)
    spk = jnp.zeros((2, 32))
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.asarray(plan["src_type"]),
                       jnp.asarray(plan["tok_id"]),
                       jnp.asarray(plan["target"]),
                       jnp.asarray(plan["seq_len"]), spk)
    return m, variables, plan


def test_lm_training_forward(lm):
    m, variables, plan = lm
    spk = jnp.zeros((2, 32))
    loss, acc = m.apply(variables, jnp.asarray(plan["src_type"]),
                        jnp.asarray(plan["tok_id"]),
                        jnp.asarray(plan["target"]),
                        jnp.asarray(plan["seq_len"]), spk)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0


def test_generate_decodes(lm):
    m, variables, _ = lm
    src, tok, plen = llm_mod.build_inference_plan(
        np.array([5, 6, 7]), np.array([10, 11]), use_spk=True)
    spk = jnp.zeros((1, 32))
    out, count = llm_mod.generate(
        m, variables, jnp.asarray(src), jnp.asarray(tok),
        jnp.asarray(plen), spk, jax.random.PRNGKey(1),
        jnp.array([2]), jnp.array([20]), max_steps=24)
    n = int(count[0])
    toks = np.asarray(out)[0]
    assert 2 <= n <= 20
    assert (toks[:n] >= 0).all() and (toks[:n] < 40).all()
    assert (toks[n:] == -1).all()

    # determinism with the same key
    out2, count2 = llm_mod.generate(
        m, variables, jnp.asarray(src), jnp.asarray(tok),
        jnp.asarray(plen), spk, jax.random.PRNGKey(1),
        jnp.array([2]), jnp.array([20]), max_steps=24)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_generate_pregen_noise(lm):
    """cfg.pregen_noise hoists decode RNG out of the loop; the decode
    must keep every generate() contract (bounds, padding, determinism)."""
    import dataclasses
    m, variables, _ = lm
    mp = llm_mod.SpeechLM(dataclasses.replace(SMALL_LM, pregen_noise=True))
    src, tok, plen = llm_mod.build_inference_plan(
        np.array([5, 6, 7]), np.array([10, 11]), use_spk=True)
    spk = jnp.zeros((1, 32))
    out, count = llm_mod.generate(
        mp, variables, jnp.asarray(src), jnp.asarray(tok),
        jnp.asarray(plen), spk, jax.random.PRNGKey(1),
        jnp.array([2]), jnp.array([20]), max_steps=24)
    n = int(count[0])
    toks = np.asarray(out)[0]
    assert 2 <= n <= 20
    assert (toks[:n] >= 0).all() and (toks[:n] < 40).all()
    assert (toks[n:] == -1).all()
    out2, _ = llm_mod.generate(
        mp, variables, jnp.asarray(src), jnp.asarray(tok),
        jnp.asarray(plen), spk, jax.random.PRNGKey(1),
        jnp.array([2]), jnp.array([20]), max_steps=24)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_nucleus_gumbel_max_distribution():
    """Gumbel-max over the kept prefix == categorical over the
    renormalized nucleus: check the degenerate case exactly and the
    general case statistically against nucleus_sample."""
    from minimax_speech_tpu.ops import sampling as so
    # top_p so small only the argmax is kept -> deterministic
    logp = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    for s in range(5):
        g = jax.random.gumbel(jax.random.PRNGKey(s), (1, 4))
        tid = so.nucleus_gumbel_max(g, logp, top_p=1e-6, top_k=4)
        assert int(tid[0]) == 0

    # general case: frequencies match the key-based sampler
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    ref = np.asarray(jax.vmap(
        lambda k: so.nucleus_sample(k, logp[0], top_p=0.8, top_k=4))(keys))
    g = jax.random.gumbel(jax.random.PRNGKey(8), (n, 1, 4))
    got = np.asarray(jax.vmap(
        lambda gg: so.nucleus_gumbel_max(gg, logp, top_p=0.8, top_k=4)[0]
    )(g))
    for t in range(4):
        f_ref = (ref == t).mean()
        f_got = (got == t).mean()
        assert abs(f_ref - f_got) < 0.05, (t, f_ref, f_got)


def test_ras_pregen_fallback_triggers():
    from minimax_speech_tpu.ops import sampling as so
    logp = jnp.log(jnp.array([[0.90, 0.04, 0.03, 0.03]]))
    g = jnp.zeros((1, 4))
    recent_rep = jnp.full((1, 10), 0, jnp.int32)   # top id everywhere
    recent_ok = jnp.full((1, 10), -1, jnp.int32)
    # no repetition: nucleus choice (greedy with zero gumbel) survives
    t_ok = so.ras_sample_batch_pregen(
        jax.random.PRNGKey(0), g, logp, recent_ok, top_p=0.8, top_k=4)
    assert int(t_ok[0]) == 0
    # repetition: fallback samples the FULL distribution — over many keys
    # it must pick non-top tokens at roughly the 10% tail rate
    falls = [int(so.ras_sample_batch_pregen(
        jax.random.PRNGKey(s), g, logp, recent_rep, top_p=0.8, top_k=4)[0])
        for s in range(200)]
    assert any(f != 0 for f in falls)


def test_legacy_transformer_lm(rng):
    from minimax_speech_tpu.models.legacy_lm import (LegacyLMConfig,
                                                     LegacyTransformerLM)
    cfg = LegacyLMConfig(text_vocab_size=100, speech_token_size=40,
                         text_encoder_input_size=16, llm_input_size=32,
                         llm_output_size=32, text_encoder_blocks=1,
                         llm_blocks=1, attention_heads=2, linear_units=32)
    m = LegacyTransformerLM(cfg)
    plan = llm_mod.build_lm_plan([np.arange(4)], [np.arange(8)],
                                 bistream_flags=[False], eos=40, fill=42,
                                 pad_to=16)
    text_tok = jnp.asarray(np.arange(4)[None])
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.asarray(plan["src_type"]),
                       jnp.asarray(plan["tok_id"]),
                       jnp.asarray(plan["target"]),
                       jnp.asarray(plan["seq_len"]),
                       jnp.zeros((1, 32)), text_tok, jnp.array([4]))
    loss, acc = m.apply(variables, jnp.asarray(plan["src_type"]),
                        jnp.asarray(plan["tok_id"]),
                        jnp.asarray(plan["target"]),
                        jnp.asarray(plan["seq_len"]),
                        jnp.zeros((1, 32)), text_tok, jnp.array([4]))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0


@pytest.mark.parametrize("act_quant", [False, True])
def test_int8_quantized_qwen_matches_fp32(rng, act_quant):
    """int8 backbone (weight-only and W8A8 dynamic-activation) must track
    the fp32 one closely."""
    m32 = qwen2.Qwen2Model(TINY)
    b, t = 1, 6
    x = jnp.asarray(rng.standard_normal((b, t, 32)).astype(np.float32) * 0.3)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    bias = qwen2.causal_bias(jnp.ones((b, t), bool))
    params = m32.init(jax.random.PRNGKey(0), x, positions, bias)
    ref, _ = m32.apply(params, x, positions, bias)

    import dataclasses
    qcfg = dataclasses.replace(TINY, quantized=True, act_quant=act_quant)
    mq = qwen2.Qwen2Model(qcfg)
    qparams = {"params": qwen2.quantize_lm_params(
        {"llm": params["params"]})["llm"]}
    out, _ = mq.apply(qparams, x, positions, bias)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < (0.08 if act_quant else 0.05), \
        f"int8 relative error {rel}"


def test_lm_splash_train_matches_xla(rng):
    """The splash training attention (flash_train='splash') must match
    the XLA causal+pad-bias path in loss AND gradients (interpret mode
    on CPU). Padded positions are excluded: the two paths differ only
    in what pad queries see (segment-isolated vs causal), which never
    reaches the loss."""
    import dataclasses
    from minimax_speech_tpu.kernels import splash

    cfg = qwen2.Qwen2Config(vocab_size=50, hidden_size=128, n_layers=2,
                            n_heads=2, n_kv_heads=1, head_dim=64,
                            intermediate_size=96)
    b, t = 2, 128
    model = qwen2.Qwen2Model(cfg)
    x = jnp.asarray(rng.standard_normal((b, t, 128)).astype(np.float32)
                    * 0.3)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    lengths = jnp.array([t, 90], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, positions, None,
                        lengths=lengths)
    valid = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)

    def make_loss(m):
        def loss(p):
            out, _ = m.apply(p, x, positions, None, lengths=lengths)
            return jnp.sum(jnp.square(out) * valid[..., None]) / jnp.sum(valid)
        return loss

    golden, ggrad = jax.value_and_grad(make_loss(model))(params)

    splash_model = qwen2.Qwen2Model(
        dataclasses.replace(cfg, flash_train="splash"))
    splash._INTERPRET = True
    try:
        ours, ograd = jax.value_and_grad(make_loss(splash_model))(params)
    finally:
        splash._INTERPRET = False

    np.testing.assert_allclose(float(ours), float(golden), rtol=2e-5)
    flat_g = jax.tree.leaves(ggrad)
    flat_o = jax.tree.leaves(ograd)
    for a, o in zip(flat_g, flat_o):
        np.testing.assert_allclose(np.asarray(o), np.asarray(a),
                                   atol=3e-5, rtol=2e-3)
