"""Chunked streaming flow == full-sequence run with the same unit-grid
masks (VERDICT round-1 item #3: O(chunk) streaming caches).

The chunked path (infer/stream_flow.py) must reproduce, hop by hop, what
a full-prefix pass computes under the prompt-anchored chunk grid —
covering the conformer KV caches, pre-lookahead/upsample conv tails,
and the UNet's per-Euler-step sliding-window KV + conv caches
(TPU-native forward_chunk, reference: transformer/encoder.py:184-274).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimax_speech_tpu.models import cfm as cfm_mod
from minimax_speech_tpu.models.decoder_unet import DecoderUNetConfig
from minimax_speech_tpu.models.flow import (FlowConfig, FlowModel,
                                            flow_inference_unit_grid,
                                            init_flow_variables)
from minimax_speech_tpu.models.upsample_encoder import (
    UpsampleConformerEncoder, UpsampleEncoderConfig, make_encoder_cache)

HOP, LOOK = 4, 3
ENC_CFG = UpsampleEncoderConfig(
    input_size=16, output_size=16, attention_heads=2, linear_units=32,
    num_blocks=2, num_up_blocks=1, static_chunk_size=HOP,
    pre_lookahead_len=LOOK)


def test_encoder_chunked_matches_full():
    rng = np.random.default_rng(0)
    plen, gen = 5, 11
    total = plen + gen
    xs = jnp.asarray(rng.standard_normal((1, total, 16)), jnp.float32)
    lens = jnp.array([total])

    enc = UpsampleConformerEncoder(ENC_CFG)
    variables = enc.init(jax.random.PRNGKey(0), xs, lens)

    full, _ = enc.apply(variables, xs, lens, streaming=True,
                        chunk_align=jnp.int32(plen))

    cache = make_encoder_cache(ENC_CFG, 1, 32)
    buf = jnp.zeros((1, 8, 16))
    buf = buf.at[:, :plen].set(xs[:, :plen])
    buf = buf.at[:, plen: plen + LOOK].set(xs[:, plen: plen + LOOK])
    _, cache = enc.apply(variables, buf, jnp.int32(plen), cache,
                         method=UpsampleConformerEncoder.prefill)

    outs = []
    off = plen
    for k in range(2):
        chunk = xs[:, off: off + HOP]
        ctx = xs[:, off + HOP: off + HOP + LOOK]
        o, cache = enc.apply(variables, chunk, cache, jnp.int32(off),
                             jnp.int32(HOP), ctx,
                             method=UpsampleConformerEncoder.chunk_step)
        outs.append(np.asarray(o))
        off += HOP
    # final ragged chunk (3 tokens, zero right-pad = finalize semantics)
    n = total - off
    fbuf = jnp.zeros((1, 8, 16))
    fbuf = fbuf.at[:, :n].set(xs[:, off:])
    o, cache = enc.apply(variables, fbuf, cache, jnp.int32(off),
                         jnp.int32(n), None,
                         method=UpsampleConformerEncoder.chunk_step)
    outs.append(np.asarray(o)[:, : n * 2])

    chunked = np.concatenate(outs, axis=1)
    ref = np.asarray(full)[:, plen * 2:]
    np.testing.assert_allclose(chunked, ref, atol=2e-4, rtol=1e-3)


def _tiny_flow():
    return FlowConfig(
        input_size=16, output_size=8, spk_embed_dim=12, vocab_size=50,
        use_speaker_encoder=False, n_timesteps=3,
        encoder=ENC_CFG,
        unet=DecoderUNetConfig(
            in_channels=32, out_channels=8, channels=(16,),
            attention_head_dim=8, n_blocks=1, num_mid_blocks=2,
            num_heads=2, static_chunk_size=2 * HOP),
        cfm=cfm_mod.CFMConfig())


@pytest.mark.slow
def test_chunked_flow_session_matches_full():
    from minimax_speech_tpu.infer.stream_flow import ChunkedFlowSession

    rng = np.random.default_rng(1)
    cfg = _tiny_flow()
    model = FlowModel(cfg)
    variables = init_flow_variables(model, jax.random.PRNGKey(0),
                                    batch=2, tokens=8)

    plen, n_gen = 5, 11
    window = 6
    prompt_tokens = rng.integers(0, 50, plen).astype(np.int32)
    gen_tokens = rng.integers(0, 50, n_gen).astype(np.int32)
    prompt_feat = rng.standard_normal((2 * plen, 8)).astype(np.float32)
    emb = jnp.asarray(rng.standard_normal((1, 12)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 200, 8)), jnp.float32)

    # full-sequence reference on the same unit grid + window
    total = plen + n_gen
    tokens = jnp.asarray(np.concatenate([prompt_tokens, gen_tokens])[None])
    full = flow_inference_unit_grid(
        model, variables, tokens, jnp.array([total]),
        jnp.asarray(prompt_feat)[None], jnp.int32(plen), emb, noise,
        window=window)
    ref = np.asarray(full)[0, 2 * plen:]

    s = ChunkedFlowSession(model, variables, noise, token_hop=HOP,
                           lookahead=LOOK, max_tokens=32, window=window,
                           final_bucket=8, prompt_buckets=(8, 16))
    s.prefill(prompt_tokens, prompt_feat, emb, gen_tokens[:LOOK])
    f1 = s.step(gen_tokens[0:4], gen_tokens[4:7])
    f2 = s.step(gen_tokens[4:8], gen_tokens[8:11])
    f3 = s.final(gen_tokens[8:])
    chunked = np.concatenate([f1, f2, f3], axis=0)

    assert chunked.shape == ref.shape
    np.testing.assert_allclose(chunked, ref, atol=5e-4, rtol=1e-2)
