"""AOT export: compile pipeline stages ahead of time and persist them.

The TPU-native equivalent of the reference's export zoo
(reference: speech/cosyvoice/bin/export_jit.py, bin/export_onnx.py,
utils/file_utils.py:53-129 ONNX->TRT + vLLM surgery): each stage is a
jitted XLA program, so "export" = jax.jit(...).lower().compile() with
the serialized executable cached on disk via the JAX compilation cache.
This warms every static-shape bucket so first-request latency in serving
equals steady-state latency.

  python -m minimax_speech_tpu.cli.export --config configs/default.yaml \
      [--cache_dir DIR] [--random_init | --ckpt_dir DIR] \
      [--buckets 64,128,256]
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/default.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--cache_dir", default=None,
                   help="executable cache location; defaults to the "
                        "SAME dir TTSPipeline/serve read "
                        "(~/.cache/minimax_speech_tpu/xla), so an "
                        "export warms later serving starts")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--buckets", default="64,128,256")
    p.add_argument("--gen_tokens", type=int, default=None,
                   help="decode max_steps to compile (default: config)")
    p.add_argument("--serving", action="store_true",
                   help="also compile the serving surfaces (fused "
                        "one-shot, batched, continuous, streaming) so a "
                        "later `cli.serve` start only deserializes")
    p.add_argument("--matcha", action="store_true",
                   help="also compile the standalone Matcha "
                        "text->mel->wav program per bucket (the "
                        "matcha/onnx export analogue: the reference "
                        "exports its Matcha graph to ONNX, "
                        "matcha/onnx/export.py; here every bucket is "
                        "AOT-compiled into the same executable cache "
                        "cli.matcha reads)")
    p.add_argument("--matcha_ckpt", default=None)
    p.add_argument("--matcha_vocoder_ckpt", default=None)
    p.add_argument("--tokenizer_path", default=None)
    args = p.parse_args(argv)

    import jax  # noqa: F401

    # persistent compilation cache: the serialized-executable store
    from minimax_speech_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    cache_dir = enable_persistent_compile_cache(
        str(Path(args.cache_dir).absolute()) if args.cache_dir else None)

    import jax.numpy as jnp

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.infer.pipeline import TTSPipeline
    from minimax_speech_tpu.models import llm as llm_mod
    from minimax_speech_tpu.utils.params_io import load_params

    cfg = cfg_lib.load_tts_config(args.config, args.override)
    if args.ckpt_dir:
        d = Path(args.ckpt_dir)
        pipe = TTSPipeline(cfg, load_params(d / "llm.npz"),
                           load_params(d / "flow.npz"),
                           load_params(d / "codec.npz"),
                           load_params(d / "s3.npz"))
    elif args.random_init:
        pipe = TTSPipeline.from_random(cfg)
    else:
        raise SystemExit("need --ckpt_dir or --random_init")

    buckets = [int(b) for b in args.buckets.split(",")]
    rng = np.random.default_rng(0)

    t0 = time.time()
    for b in buckets:
        # tokenizer bucket
        mel = jnp.zeros((1, b, cfg.s3.n_mels))
        pipe._tokenize(pipe.s3_vars, mel, jnp.array([b]))
        # flow bucket
        tokens = jnp.zeros((1, b), jnp.int32)
        prompt_feat = jnp.zeros((1, 16, cfg.flow.output_size))
        emb = jnp.zeros((1, cfg.flow.spk_embed_dim))
        pipe._flow_infer(pipe.flow_vars, tokens, jnp.array([b]),
                         prompt_feat, emb, pipe.noise)
        # decoder bucket
        pipe._decode(pipe.codec_vars,
                     jnp.zeros((1, 2 * b, cfg.flow.output_size)))
        # LM prompt bucket + decode loop
        src = np.zeros((1, b), np.int32)
        src[0, 0] = llm_mod.SRC_SPECIAL
        llm_mod.generate(pipe.lm, pipe.lm_vars, jnp.asarray(src),
                         jnp.zeros((1, b), jnp.int32), jnp.array([4]),
                         jnp.zeros((1, cfg.lm.llm_input_size)),
                         jax.random.PRNGKey(0), jnp.array([1]),
                         jnp.array([2]),
                         max_steps=args.gen_tokens or cfg.max_speech_tokens)
        print(f"bucket {b}: all stages compiled "
              f"({time.time() - t0:.1f}s cumulative)")

    if args.serving:
        from minimax_speech_tpu.infer.api import TTS
        from minimax_speech_tpu.infer.warmup import warm_serving
        tts = TTS(pipeline=pipe, tokenizer_path=args.tokenizer_path)
        warm_serving(tts, scheduler="window")
        warm_serving(tts, scheduler="continuous", streaming=False)

    if args.matcha:
        from minimax_speech_tpu.models.matcha import (MatchaConfig,
                                                      MatchaTTS,
                                                      matcha_synthesise)
        from minimax_speech_tpu.models.matcha_hifigan import (
            MatchaHiFiGAN, MatchaHiFiGANConfig)
        mcfg = MatchaConfig()
        mmodel = MatchaTTS(mcfg)
        vocoder = MatchaHiFiGAN(MatchaHiFiGANConfig(
            in_channels=mcfg.n_feats))
        if args.matcha_ckpt:
            mvars = load_params(args.matcha_ckpt)
        else:
            mvars = jax.jit(mmodel.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                jnp.array([8]), jnp.zeros((1, 16, mcfg.n_feats)),
                jnp.array([16]), jax.random.PRNGKey(0))
        vvars = (load_params(args.matcha_vocoder_ckpt)
                 if args.matcha_vocoder_ckpt else
                 jax.jit(vocoder.init)(jax.random.PRNGKey(1),
                                       jnp.zeros((1, 8, mcfg.n_feats))))

        @jax.jit
        def matcha_fused(tokens, lens, key_):
            mel, y_len = matcha_synthesise(mmodel, mvars, tokens, lens,
                                           key_)
            return mel, y_len, vocoder.apply(vvars, mel)

        for b in buckets:
            matcha_fused(jnp.zeros((1, b), jnp.int32), jnp.array([b]),
                         jax.random.PRNGKey(0))
            print(f"matcha bucket {b}: compiled "
                  f"({time.time() - t0:.1f}s cumulative)")
    print(f"export done; executables cached in {cache_dir}")


if __name__ == "__main__":
    main()
