"""Standalone Matcha-TTS trainer CLI.

Drives the MatchaTTS training losses (dur + prior + CFM,
models/matcha.py; reference trains the same triple via Lightning,
speech/matcha/models/matcha_tts.py:23 + matcha/train.py) over a
wav+txt data list:

  python -m minimax_speech_tpu.cli.train_matcha \
      --train_data data.list --model_dir exp/matcha --num_epochs 100

Text rides the tacotron symbol pipeline (infer/matcha_text.py); mels
are the 22050 Hz/1024/256 matcha spectrogram computed HOST-side
(ops/mel.hifigan_log_mel_np — feature extraction never rides the
accelerator) and normalized by corpus stats saved next to the weights
(the reference normalizes with dataset-level mel_mean/mel_std,
matcha/data/text_mel_datamodule.py).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _bucket(n: int, step: int = 32) -> int:
    return max(step, ((n + step - 1) // step) * step)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", required=True,
                   help="list file: one wav path per line, .txt sidecars")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--save_epochs", type=int, default=50)
    p.add_argument("--cleaners", default="english_cleaners2",
                   help="comma list (english_cleaners2 falls back to "
                        "grapheme mode when espeak is unavailable)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--export_npz", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.infer.api import _resample
    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.infer.matcha_text import process_text
    from minimax_speech_tpu.models.matcha import MatchaConfig, MatchaTTS
    from minimax_speech_tpu.ops.mel import hifigan_log_mel_np
    from minimax_speech_tpu.train import schedule, steps
    from minimax_speech_tpu.utils.params_io import save_params

    model_dir = Path(args.model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    cleaners = tuple(args.cleaners.split(","))

    wavs = [Path(line.strip()) for line in
            Path(args.train_data).read_text().splitlines() if line.strip()]
    items = []
    for w in wavs:
        text = w.with_suffix(".txt").read_text().strip()
        seq, _ = process_text(text, cleaners)
        tokens = np.asarray(seq).reshape(-1)
        audio, sr = _load_audio(str(w))
        audio = _resample(audio, sr, 22050)
        mel = hifigan_log_mel_np(audio, n_fft=1024, n_mels=80, sr=22050,
                                 hop=256, win_length=1024).T  # (T, 80)
        items.append((tokens.astype(np.int32), mel.astype(np.float32)))
    assert items, "empty data list"

    # dataset-level mel normalization (reference text_mel_datamodule)
    allm = np.concatenate([m for _, m in items], axis=0)
    stats = {"mel_mean": float(allm.mean()), "mel_std": float(allm.std())}
    (model_dir / "matcha_stats.json").write_text(json.dumps(stats))
    items = [(t, (m - stats["mel_mean"]) / max(stats["mel_std"], 1e-5))
             for t, m in items]

    tok_pad = _bucket(max(len(t) for t, _ in items))
    mel_pad = _bucket(max(m.shape[0] for _, m in items))

    cfg = MatchaConfig()
    model = MatchaTTS(cfg)
    key = jax.random.PRNGKey(args.seed)
    variables = jax.jit(model.init, static_argnums=())(
        key, jnp.zeros((1, tok_pad), jnp.int32), jnp.array([tok_pad]),
        jnp.zeros((1, mel_pad, cfg.n_feats)), jnp.array([mel_pad]),
        jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=args.lr, warmup_steps=args.warmup_steps)
    state = steps.make_train_state(variables["params"], tx)

    def loss_fn(params, batch, k):
        dur, prior, cfm = model.apply(
            {"params": params}, batch["tokens"], batch["token_len"],
            batch["mels"], batch["mel_len"], k)
        return dur + prior + cfm, (dur, prior, cfm)

    @jax.jit
    def train_step(state, batch, k):
        (loss, (dur, prior, cfm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, k)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "dur": dur, "prior": prior,
                       "cfm": cfm}

    def make_batch(idx):
        tokens = np.zeros((len(idx), tok_pad), np.int32)
        token_len = np.zeros((len(idx),), np.int32)
        mels = np.zeros((len(idx), mel_pad, cfg.n_feats), np.float32)
        mel_len = np.zeros((len(idx),), np.int32)
        for j, i in enumerate(idx):
            t, m = items[i]
            tokens[j, : len(t)] = t
            token_len[j] = len(t)
            mels[j, : m.shape[0]] = m
            mel_len[j] = m.shape[0]
        return {"tokens": jnp.asarray(tokens),
                "token_len": jnp.asarray(token_len),
                "mels": jnp.asarray(mels),
                "mel_len": jnp.asarray(mel_len)}

    rng = np.random.default_rng(args.seed)
    metrics_path = model_dir / "matcha_metrics.jsonl"
    step_no = 0
    t0 = time.time()
    with metrics_path.open("a") as mf:
        for epoch in range(args.num_epochs):
            order = rng.permutation(len(items))
            for s in range(0, len(order), args.batch_size):
                idx = order[s: s + args.batch_size]
                key, k = jax.random.split(key)
                state, m = train_step(state, make_batch(idx), k)
                step_no += 1
                if step_no % args.log_interval == 0:
                    row = {"step": step_no, "epoch": epoch,
                           **{k2: float(v) for k2, v in m.items()},
                           "elapsed_s": round(time.time() - t0, 1)}
                    mf.write(json.dumps(row) + "\n")
                    mf.flush()
                    print(f"[matcha step {step_no}] " + " ".join(
                        f"{k2}={float(v):.4f}" for k2, v in m.items()),
                        flush=True)
            if (epoch + 1) % args.save_epochs == 0 \
                    or epoch == args.num_epochs - 1:
                save_params(model_dir / "matcha.npz",
                            {"params": jax.device_get(state.params)})
    if args.export_npz:
        save_params(args.export_npz,
                    {"params": jax.device_get(state.params)})
    print(f"matcha training done: {step_no} steps")


if __name__ == "__main__":
    main()
