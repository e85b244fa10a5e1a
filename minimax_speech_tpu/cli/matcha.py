"""Matcha-TTS standalone CLI: text -> mel -> HiFi-GAN -> wav.

Reference: speech/matcha/cli.py (argument surface, process_text with
interspersed pad tokens, unbatched/batched synthesis, denoiser
strength, RTF reporting, wav + spectrogram-png outputs). TPU-native:
token sequences pad to buckets so every utterance length reuses one
compiled program; batched mode stacks sequences into one padded batch
instead of a DataLoader.

  python -m minimax_speech_tpu.cli.matcha --text "hello" \
      --output_folder out/ [--ckpt matcha.npz --vocoder_ckpt voc.npz]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

BUCKETS = (64, 128, 256, 384, 512)


def _bucket(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


def save_spectrogram_png(mel: np.ndarray, path: str):
    """Reference cli.py:37-46 plot_spectrogram_to_numpy."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(12, 3))
        im = ax.imshow(mel.T, aspect="auto", origin="lower",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
        plt.xlabel("Frames")
        plt.ylabel("Channels")
        plt.title("Synthesised Mel-Spectrogram")
        fig.savefig(path)
        plt.close(fig)
    except Exception:
        pass


def main(argv=None):
    p = argparse.ArgumentParser(description="Matcha-TTS (TPU)")
    p.add_argument("--text", default=None)
    p.add_argument("--file", default=None, help="text file, one per line")
    p.add_argument("--ckpt", default=None, help="matcha params .npz")
    p.add_argument("--vocoder_ckpt", default=None,
                   help="HiFi-GAN generator params .npz")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--speaking_rate", type=float, default=0.95)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--denoiser_strength", type=float, default=0.00025)
    p.add_argument("--output_folder", default=".")
    p.add_argument("--batched", action="store_true")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--cleaners", default="english_cleaners2")
    p.add_argument("--max_frames", type=int, default=1000)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_vocab", type=int, default=178)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--n_layers", type=int, default=2)
    args = p.parse_args(argv)
    if not args.text and not args.file:
        raise SystemExit("need --text or --file")
    if not args.random_init and not args.ckpt:
        raise SystemExit("need --ckpt (or --random_init for smoke runs)")

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.cli.synthesize import write_wav
    from minimax_speech_tpu.infer import matcha_text
    from minimax_speech_tpu.models.matcha import (MatchaConfig, MatchaTTS,
                                                  matcha_synthesise)
    from minimax_speech_tpu.models.matcha_hifigan import (
        Denoiser, MatchaHiFiGAN, MatchaHiFiGANConfig)
    from minimax_speech_tpu.utils.params_io import load_params

    out_dir = Path(args.output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    texts = ([args.text] if args.text else
             [ln.strip() for ln in open(args.file) if ln.strip()])
    cleaners = tuple(args.cleaners.split(","))

    if args.random_init:
        cfg = MatchaConfig(n_vocab=args.n_vocab, hidden=args.hidden,
                           n_layers=args.n_layers)
    else:
        cfg = MatchaConfig(n_vocab=args.n_vocab)
    model = MatchaTTS(cfg)
    voc_cfg = MatchaHiFiGANConfig(in_channels=cfg.n_feats)
    vocoder = MatchaHiFiGAN(voc_cfg)

    key = jax.random.PRNGKey(args.seed)
    if args.ckpt:
        variables = load_params(args.ckpt)
    else:
        k1, key = jax.random.split(key)
        # jit the inits: eager init costs one device dispatch per op
        # (50-100 ms tunnel RTT each on the axon TPU)
        variables = jax.jit(model.init)(
            k1, jnp.zeros((1, 8), jnp.int32), jnp.array([8]),
            jnp.zeros((1, 16, cfg.n_feats)), jnp.array([16]),
            jax.random.PRNGKey(0))
    if args.vocoder_ckpt:
        voc_vars = load_params(args.vocoder_ckpt)
    else:
        k2, key = jax.random.split(key)
        voc_vars = jax.jit(vocoder.init)(k2,
                                         jnp.zeros((1, 8, cfg.n_feats)))

    denoiser = Denoiser(lambda m: vocoder.apply(voc_vars, m),
                        mel_frames=88, n_mels=cfg.n_feats)

    # one compiled program per (batch, token-bucket): text -> mel -> wav
    @jax.jit
    def synth_fused(tokens, lens, key_):
        mel, y_len = matcha_synthesise(
            model, variables, tokens, lens, key_,
            n_timesteps=args.steps, length_scale=args.speaking_rate,
            max_frames=args.max_frames, temperature=args.temperature)
        return mel, y_len, vocoder.apply(voc_vars, mel)

    def synth_batch(seqs: list[list[int]], base_idx: int):
        t_bucket = _bucket(max(len(s) for s in seqs))
        tokens = np.zeros((len(seqs), t_bucket), np.int32)
        lens = np.zeros((len(seqs),), np.int32)
        for i, s in enumerate(seqs):
            tokens[i, :len(s)] = s
            lens[i] = len(s)
        t0 = time.time()
        mel, y_len, wav = synth_fused(jnp.asarray(tokens),
                                      jnp.asarray(lens),
                                      jax.random.PRNGKey(args.seed + base_idx))
        wav.block_until_ready()
        dt = time.time() - t0
        hop = voc_cfg.hop_length
        results = []
        for i in range(len(seqs)):
            n = int(y_len[i])
            m = np.asarray(mel[i, :n])
            a = np.asarray(wav[i, :n * hop])
            a = np.asarray(denoiser(jnp.asarray(a),
                                    args.denoiser_strength))[:n * hop]
            rtf = dt / max(len(a) / args.sample_rate, 1e-6) / len(seqs)
            results.append((m, a, rtf))
        return results

    t_start = time.time()
    rtfs = []
    idx = 0
    batches = ([texts[i:i + args.batch_size]
                for i in range(0, len(texts), args.batch_size)]
               if args.batched else [[t] for t in texts])
    for batch in batches:
        seqs = []
        for text in batch:
            seq, phones = matcha_text.process_text(text, cleaners)
            print(f"[{idx + len(seqs)}] - Input text: {text}")
            print(f"[{idx + len(seqs)}] - Phonetised text: {phones[1::2]}")
            seqs.append(seq)
        for m, a, rtf in synth_batch(seqs, idx):
            name = f"utterance_{idx:03d}"
            write_wav(str(out_dir / f"{name}.wav"), a, args.sample_rate)
            np.save(out_dir / f"{name}_mel.npy", m)
            save_spectrogram_png(m, str(out_dir / f"{name}.png"))
            print(f"[{idx}] - RTF: {rtf:.4f}")
            rtfs.append(rtf)
            idx += 1
    print(json.dumps({"n": idx, "rtf_mean": float(np.mean(rtfs)),
                      "wall": round(time.time() - t_start, 2)}))


if __name__ == "__main__":
    main()
