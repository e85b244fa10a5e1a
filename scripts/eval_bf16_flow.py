"""Quality A/B for TTSConfig.bf16_flow on TRAINED weights.

The flow stage (10-step CFM UNet + upsample conformer) can run in
bfloat16 (infer/pipeline.py:61-66); this measures what that costs in
reconstruction quality on a model that has actually learned — the
gate STATUS.md set for flipping the default. Uses an overfit-pipeline
workdir (scripts/overfit_pipeline.py): trained {flow,codec,...}.npz +
the corpus' ground-truth FSQ tokens and DAC latents.

Reports, for fp32 and bf16 flow inference on the same trained weights:
  flow_nmse        single-draw NMSE vs ground-truth latents
  flow_nmse_mean4  4-draw posterior-mean NMSE (the reference's
                   "recon < 0.1" bar speaks to the conditional mean)
  latent_rel_err   bf16-vs-fp32 relative L2 of the single draw

Usage: bash scripts/tpu_run.sh scripts/eval_bf16_flow.py \
           --workdir /tmp/ofit_r4
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="overfit_pipeline workdir (model/ + corpus/)")
    p.add_argument("--draws", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.infer.pipeline import TTSPipeline, next_bucket
    from minimax_speech_tpu.models.flow import flow_inference
    from minimax_speech_tpu.utils.params_io import load_params

    d = Path(args.workdir) / "model"
    corpus = Path(args.workdir) / "corpus"
    base_cfg = cfg_lib.load_tts_config(d / "config.yaml")

    stem = corpus / "utt0"
    gt_tok = np.load(str(stem) + "_fsq.npy")
    gt_lat = np.load(str(stem) + "_latent2x.npz")["mu"]
    n = min(len(gt_tok), gt_lat.shape[0] // 2)
    gt_tok, gt_lat = gt_tok[:n], gt_lat[: 2 * n]
    k = n // 2
    tgt = gt_lat[2 * k:]

    import wave

    with wave.open(str(corpus / "utt0.wav"), "rb") as w:
        raw = w.readframes(w.getnframes())
        wav = (np.frombuffer(raw, np.int16) / 32767.0).astype(np.float32)

    out = {}
    for mode in ("fp32", "bf16"):
        cfg = dataclasses.replace(base_cfg, bf16_flow=(mode == "bf16"))
        pipe = TTSPipeline(
            cfg, lm_vars=load_params(d / "llm.npz"),
            flow_vars=load_params(d / "flow.npz"),
            codec_vars=load_params(d / "codec.npz"),
            s3_vars=load_params(d / "s3.npz"))
        prompt_mel = pipe.extract_prompt_mel(wav)
        _, flow_emb = pipe.speaker_embedding(prompt_mel)

        tpad = next_bucket(n)
        tok_buf = np.zeros((1, tpad), np.int32)
        tok_buf[0, :n] = gt_tok
        draws = []
        for i in range(args.draws):
            noise = pipe.noise if i == 0 else jax.random.normal(
                jax.random.PRNGKey(100 + i), pipe.noise.shape,
                pipe.noise.dtype)
            feat = flow_inference(
                pipe.flow, pipe.flow_vars, jnp.asarray(tok_buf),
                jnp.array([n]),
                *( (jnp.asarray(gt_lat[: 2 * k])[None].astype(jnp.bfloat16),
                    flow_emb.astype(jnp.bfloat16),
                    noise.astype(jnp.bfloat16))
                   if mode == "bf16" else
                   (jnp.asarray(gt_lat[: 2 * k])[None], flow_emb, noise)))
            draws.append(np.asarray(feat, np.float32)[0, : 2 * (n - k)])
        var = float(np.var(tgt) + 1e-12)
        out[mode] = {
            "flow_nmse": float(np.mean((draws[0] - tgt) ** 2)) / var,
            f"flow_nmse_mean{args.draws}":
                float(np.mean((np.mean(draws, 0) - tgt) ** 2)) / var,
        }
        if mode == "fp32":
            ref_draw = draws[0]
        else:
            out["latent_rel_err"] = float(
                np.linalg.norm(draws[0] - ref_draw)
                / (np.linalg.norm(ref_draw) + 1e-12))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
