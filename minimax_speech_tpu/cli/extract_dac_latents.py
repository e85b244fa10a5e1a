"""DAC latent extraction CLI.

Mirrors extract_dac_latents.py (reference:
dac-vae/extract_dac_latents.py:20-118): per wav, encode to latents and
save {z, mu, logs} as <stem>_latent2x.npz (the `_latent2x` suffix is
what the training opener expects, processor.py:67); randomly verify a
subset by decoding and reporting SNR/MSE.
"""
from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=str, default=None)
    p.add_argument("--file_list", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--skip_existing", action="store_true")
    p.add_argument("--verify_fraction", type=float, default=0.02)
    p.add_argument("--process_index", type=int, default=None)
    p.add_argument("--process_count", type=int, default=None)
    p.add_argument("--sample", action="store_true",
                   help="save z (sampled); default saves mu")
    p.add_argument("--config", type=str, default=None,
                   help="yaml whose model.dac section sets the codec "
                        "geometry (default: production DACVAEConfig)")
    p.add_argument("--stats_out", type=str, default=None,
                   help="write per-channel latent mean/std over this "
                        "rank's sidecars as JSON (default: "
                        "latent_stats.json next to --ckpt on rank 0; "
                        "feed into model.flow.latent_mean/latent_std so "
                        "the flow standardizes latents internally)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.cli.extract_fsq import collect_files
    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.models import dac_vae
    from minimax_speech_tpu.utils.params_io import load_params

    pi = args.process_index if args.process_index is not None \
        else jax.process_index()
    pc = args.process_count if args.process_count is not None \
        else jax.process_count()
    files = collect_files(args)[pi::pc]

    cfg = dac_vae.DACVAEConfig()
    if args.config:
        from minimax_speech_tpu import config as cfg_lib
        cfg = cfg_lib.build_tts_config(
            cfg_lib.load_yaml(args.config).get("model", {})).dac
    model = dac_vae.DACVAE(cfg)
    if args.ckpt:
        variables = load_params(args.ckpt)
    elif args.random_init:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length * 4, 1)))
    else:
        raise SystemExit("need --ckpt or --random_init")

    encode = jax.jit(lambda v, a, k: model.apply(
        v, a, k, method=dac_vae.DACVAE.encode))
    decode = jax.jit(lambda v, z: model.apply(
        v, z, method=dac_vae.DACVAE.decode))

    failed, done = [], 0
    t0 = time.time()
    for path in files:
        out = path.with_name(path.stem + "_latent2x.npz")
        if args.skip_existing and out.exists():
            continue
        try:
            audio, sr = _load_audio(str(path))
            assert sr == cfg.sample_rate, f"expected {cfg.sample_rate}Hz"
            a = dac_vae.pad_to_hop(audio[None, :], cfg.hop_length)
            key = jax.random.PRNGKey(done) if args.sample else None
            z, mu, logs = encode(variables, jnp.asarray(a[..., None]), key)
            np.savez(out, z=np.asarray(z)[0], mu=np.asarray(mu)[0],
                     logs=np.asarray(logs)[0])
            if random.random() < args.verify_fraction:
                rec = np.asarray(decode(variables, mu))[0, :, 0]
                n = min(len(rec), len(audio))
                mse = float(np.mean((rec[:n] - audio[:n]) ** 2))
                sig = float(np.mean(audio[:n] ** 2))
                snr = 10 * np.log10(sig / max(mse, 1e-12))
                print(f"verify {path.name}: mse={mse:.6f} snr={snr:.1f}dB")
            done += 1
        except Exception as e:
            print(f"FAILED {path}: {e}", file=sys.stderr)
            failed.append(str(path))
    if failed:
        Path(f"failed_latents_rank{pi}.txt").write_text("\n".join(failed))
    print(f"[rank {pi}/{pc}] encoded {done} files in {time.time() - t0:.1f}s "
          f"({len(failed)} failed)")

    stats_out = args.stats_out
    if stats_out is None and args.ckpt and pi == 0:
        stats_out = str(Path(args.ckpt).parent / "latent_stats.json")
    if stats_out:
        # accumulate from the sidecars on disk (covers --skip_existing
        # resumes); mu arrays are tiny relative to the audio
        import json
        s = ss = None
        n = 0
        for path in files:
            out = path.with_name(path.stem + "_latent2x.npz")
            if not out.exists():
                continue
            mu = np.load(out)["mu"].astype(np.float64)
            if s is None:
                s = mu.sum(0)
                ss = (mu * mu).sum(0)
            else:
                s += mu.sum(0)
                ss += (mu * mu).sum(0)
            n += mu.shape[0]
        if n:
            mean = s / n
            var = np.maximum(ss / n - mean * mean, 1e-12)
            Path(stats_out).write_text(json.dumps(
                {"mean": mean.tolist(), "std": np.sqrt(var).tolist(),
                 "frames": n}))
            print(f"[rank {pi}/{pc}] latent stats ({n} frames) -> "
                  f"{stats_out}")


if __name__ == "__main__":
    main()
