"""Codec artifact CLI: compress wavs to .dacz / decompress back.

The DACVAEFile equivalent of the reference's DACFile compress/decompress
(reference: dac-vae/base.py:16-293):

  python -m minimax_speech_tpu.cli.codec compress --ckpt dac.npz \
      --inputs a.wav b.wav [--win 5.0 --normalize_db -16]
  python -m minimax_speech_tpu.cli.codec decompress --ckpt dac.npz \
      --inputs a.dacz [--out_dir D]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["compress", "decompress"])
    p.add_argument("--ckpt", type=str, default=None,
                   help="DAC-VAE params .npz (random init if omitted)")
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--win", type=float, default=5.0)
    p.add_argument("--overlap", type=int, default=24000)
    p.add_argument("--normalize_db", type=float, default=-16.0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.infer.codec_file import DACVAECodec
    from minimax_speech_tpu.models import dac_vae
    from minimax_speech_tpu.utils.params_io import load_params

    cfg = dac_vae.DACVAEConfig()
    model = dac_vae.DACVAE(cfg)
    if args.ckpt:
        variables = load_params(args.ckpt)
    else:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length * 4, 1)))
    codec = DACVAECodec(model, variables, win_duration=args.win,
                        overlap=args.overlap)

    for src in args.inputs:
        src = Path(src)
        out_dir = Path(args.out_dir) if args.out_dir else src.parent
        if args.mode == "compress":
            audio, sr = _load_audio(str(src))
            f = codec.compress(audio, sr, normalize_db=args.normalize_db)
            out = f.save(out_dir / src.stem)
            kbps = f.latents.nbytes * 8 / (f.original_length / sr) / 1000
            print(f"{src} -> {out} ({f.latents.shape[0]} frames, "
                  f"{kbps:.1f} kbit/s)")
        else:
            wav = codec.decompress(str(src))
            out = out_dir / (src.stem + "_recon.wav")
            import struct
            import wave
            with wave.open(str(out), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                from minimax_speech_tpu.infer.codec_file import DACVAEFile
                w.setframerate(DACVAEFile.load(str(src)).sample_rate)
                pcm = np.clip(wav, -1, 1)
                pcm = (pcm * 32767).astype(np.int16)
                w.writeframes(struct.pack(f"<{len(pcm)}h", *pcm))
            print(f"{src} -> {out} ({len(wav)} samples)")


if __name__ == "__main__":
    main()
