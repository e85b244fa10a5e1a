"""DiTo audio autoencoder inference CLI (flowae track).

Replaces flowae/audio_dito_inference.py (reference: flowae/
audio_dito_inference.py, 331 LoC): encode wavs to latents, decode
latents back to audio via FM Euler sampling, report reconstruction
metrics.

  python -m minimax_speech_tpu.cli.dito_infer --wav in.wav --out rec.wav \
      [--ckpt dito.npz | --random_init] [--n_steps 18] [--guidance 1.0]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wav", required=True)
    p.add_argument("--out", default="dito_rec.wav")
    p.add_argument("--latents_out", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--n_steps", type=int, default=None)
    p.add_argument("--guidance", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.cli.synthesize import write_wav
    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.flowae.dito import (DiToAudio, DiToConfig,
                                                dito_decode)
    from minimax_speech_tpu.flowae.trainer import eval_reconstruction
    from minimax_speech_tpu.utils.params_io import load_params

    cfg = DiToConfig()
    model = DiToAudio(cfg)
    audio, sr = _load_audio(args.wav)
    down = int(np.prod(cfg.enc_strides)) * cfg.renderer.patch
    n = (len(audio) // down) * down
    x = jnp.asarray(audio[:n])[None, :, None]

    if args.ckpt:
        variables = load_params(args.ckpt)
    elif args.random_init:
        variables = model.init(jax.random.PRNGKey(0), x,
                               jax.random.PRNGKey(1), 0.0,
                               method=DiToAudio.loss)
    else:
        raise SystemExit("need --ckpt or --random_init")

    z, mu, _ = model.apply(variables, x, method=DiToAudio.encode)
    rec = dito_decode(model, variables, mu, n, jax.random.PRNGKey(args.seed),
                      n_steps=args.n_steps, guidance=args.guidance)
    metrics = eval_reconstruction(model, variables, x,
                                  jax.random.PRNGKey(args.seed),
                                  n_steps=args.n_steps)
    rec_np = np.asarray(rec)[0, :, 0]
    write_wav(args.out, rec_np, sr)
    if args.latents_out:
        np.save(args.latents_out, np.asarray(mu)[0])
    print(f"encoded {n / sr:.2f}s -> z {tuple(mu.shape)}; wrote {args.out} "
          f"(mse={float(metrics['eval/mse']):.5f}, "
          f"snr={float(metrics['eval/snr_db']):.1f}dB)")


if __name__ == "__main__":
    main()
