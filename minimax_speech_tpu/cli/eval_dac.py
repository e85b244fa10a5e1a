"""DAC-VAE codec evaluation: encode/decode a corpus, report metrics.

Reference surface: dac-vae/audiotools/metrics/{quality,distance}.py used
by the reference's eval notebooks — STOI, SI-SDR, waveform L1, and the
multi-scale mel distance, averaged over a folder of wavs.

  python -m minimax_speech_tpu.cli.eval_dac --ckpt codec.npz \
      --wav_dir corpus/ [--config cfg.yaml] [--max_files 32]

Prints one JSON line of mean metrics.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--max_files", type=int, default=32)
    p.add_argument("--sample_rate", type=int, default=24000)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.models import dac_vae
    from minimax_speech_tpu.utils import audio_metrics as am
    from minimax_speech_tpu.utils.params_io import load_params

    cfg = dac_vae.DACVAEConfig()
    if args.config:
        from minimax_speech_tpu import config as cfg_lib
        cfg = cfg_lib.build_tts_config(
            cfg_lib.load_yaml(args.config).get("model", {})).dac
    model = dac_vae.DACVAE(cfg)
    variables = load_params(args.ckpt)

    @jax.jit
    def roundtrip(v, audio):
        _, mu, _ = model.apply(v, audio, method=dac_vae.DACVAE.encode)
        return model.apply(v, mu, method=dac_vae.DACVAE.decode)

    files = sorted(Path(args.wav_dir).rglob("*.wav"))[: args.max_files]
    if not files:
        raise SystemExit(f"no wavs under {args.wav_dir}")

    rows = []
    for f in files:
        try:
            audio, sr = _load_audio(str(f))
        except Exception as e:  # skip-and-log convention
            print(f"skip {f}: {e}")
            continue
        if sr != args.sample_rate:
            n = int(round(len(audio) * args.sample_rate / sr))
            audio = np.interp(
                np.linspace(0, 1, n, endpoint=False),
                np.linspace(0, 1, len(audio), endpoint=False),
                audio).astype(np.float32)
        a = dac_vae.pad_to_hop(audio[None, :], cfg.hop_length)
        rec = np.asarray(roundtrip(variables,
                                   jnp.asarray(a[..., None])))[0, :, 0]
        n = min(len(rec), len(audio))
        rows.append({
            "stoi": am.stoi(audio[:n], rec[:n], args.sample_rate),
            "si_sdr_db": am.si_sdr(audio[:n], rec[:n]),
            "l1": am.l1_distance(audio[:n], rec[:n]),
            "mel_l1": am.mel_distance(audio[:n], rec[:n],
                                      args.sample_rate),
        })
    if not rows:
        raise SystemExit("no files evaluated")
    mean = {k: float(np.nanmean([r[k] for r in rows])) for k in rows[0]}
    mean["n_files"] = len(rows)
    print(json.dumps(mean))
    return mean


if __name__ == "__main__":
    main()
