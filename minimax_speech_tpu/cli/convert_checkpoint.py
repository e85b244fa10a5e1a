"""Convert reference torch checkpoints to our .npz param files.

  python -m minimax_speech_tpu.cli.convert_checkpoint \
      --kind llm --src llm.pt --out llm.npz [--config configs/default.yaml]

kinds: llm (Qwen2LM), flow (CausalMaskedDiffWithXvec),
hift (HiFTGenerator), dac (DACVAE generator), s3 (S3TokenizerV2),
qwen (bare HF Qwen2ForCausalLM dir or .bin/.safetensors),
campplus (x-vector, torch dict or campplus.onnx),
matcha (Matcha-TTS acoustic ckpt: text-encoder subtree),
matcha_hifigan (generator_v1 HiFi-GAN dict).
"""
from __future__ import annotations

import argparse

import numpy as np


def load_torch_state(path: str) -> dict:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    state = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            state[k] = v.detach().cpu().numpy()
    return state


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["llm", "flow", "hift", "dac", "s3", "qwen",
                            "campplus", "matcha", "matcha_hifigan"])
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--config", default="configs/default.yaml")
    p.add_argument("--override", action="append", default=[])
    args = p.parse_args(argv)

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.models import dac_vae, qwen2
    from minimax_speech_tpu.models import s3tokenizer as s3
    from minimax_speech_tpu.utils import convert
    from minimax_speech_tpu.utils.params_io import save_params

    cfg = cfg_lib.load_tts_config(args.config, args.override)
    if args.kind == "campplus" and args.src.endswith(".onnx"):
        from minimax_speech_tpu.utils.onnx_reader import \
            read_onnx_initializers
        state = read_onnx_initializers(args.src)
    else:
        state = load_torch_state(args.src)

    if args.kind == "llm":
        variables = convert.speech_lm_params(state, cfg.lm)
    elif args.kind == "flow":
        variables = convert.flow_params(state, cfg.flow)
    elif args.kind == "hift":
        variables = convert.hift_params(state, cfg.hift)
    elif args.kind == "dac":
        if any(k.startswith("generator.") for k in state):
            state = {k[len("generator."):]: v for k, v in state.items()
                     if k.startswith("generator.")}
        variables = dac_vae.params_from_torch_state(state, cfg.dac)
    elif args.kind == "s3":
        variables = s3.params_from_torch_state(state)
    elif args.kind == "campplus":
        variables = convert.campplus_params(state)
    elif args.kind == "matcha":
        variables = {"params": convert.matcha_text_encoder_params(state)}
    elif args.kind == "matcha_hifigan":
        from minimax_speech_tpu.models.matcha_hifigan import \
            matcha_hifigan_params
        variables = matcha_hifigan_params(state)
    else:  # qwen
        params, embed, lm_head = qwen2.params_from_hf_state(state, cfg.lm.qwen)
        variables = {"params": {"llm": params["params"],
                                "text_embedding": {"embedding": embed}}}
    save_params(args.out, variables)
    n = sum(x.size for x in
            __import__("jax").tree_util.tree_leaves(variables))
    print(f"wrote {args.out}: {n / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
