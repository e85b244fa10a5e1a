"""flowae experiment runner: train DiTo / GLPTo / ZDM with eval suites.

Reference: flowae/run.py:23-59 (config-driven runner with `__base__`
merging, name/tag save dirs, --resume) + trainers/audio_ldm_trainer.py
(train loop, periodic evaluate/visualize, checkpointing). One CLI
replaces the trainer/model/dataset registries: `--model` picks the
track, a yaml (or pure flags) sets the geometry.

  python -m minimax_speech_tpu.cli.train_flowae --model dito \
      --wav_dir data/ --save_dir exp/dito --steps 10000
  python -m minimax_speech_tpu.cli.train_flowae --model zdm \
      --ae_params exp/dito/ae_params.npz --save_dir exp/zdm

Data: an AudioFolder-equivalent (recursive .wav scan, random crop,
peak normalize — reference datasets/class_folder_audio.py +
wrapper_audio_cae.py) or `--synthetic` deterministic sine clips (the
reference test-audio pattern, S3Tokenizer test_onnx.py:16-43).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_dataset(args) -> np.ndarray:
    """(N, crop_len, 1) float32 clips."""
    rng = np.random.default_rng(args.seed)
    t_len = args.crop_len
    if args.wav_dir:
        from minimax_speech_tpu.data.pipeline import _load_audio
        clips = []
        for p in sorted(Path(args.wav_dir).rglob("*.wav")):
            try:
                audio, _ = _load_audio(str(p))
            except Exception as e:  # skip-and-log (processor.py:188)
                print(f"skip {p}: {e}")
                continue
            if len(audio) < t_len:
                audio = np.pad(audio, (0, t_len - len(audio)))
            start = rng.integers(0, len(audio) - t_len + 1)
            clip = audio[start:start + t_len]
            peak = np.abs(clip).max()
            clips.append(clip / peak if peak > 1e-6 else clip)
            if len(clips) >= args.max_clips:
                break
        if not clips:
            raise SystemExit(f"no wavs under {args.wav_dir}")
        return np.stack(clips).astype(np.float32)[..., None]
    # synthetic: sine mixtures at distinct f0s, amplitude-enveloped
    n = args.max_clips
    t = np.arange(t_len) / 24000.0
    clips = []
    for i in range(n):
        f0 = 80.0 * (1.3 ** (i % 12))
        env = 0.5 + 0.5 * np.sin(2 * np.pi * (1 + i % 3) * t)
        clips.append(0.4 * env * np.sin(2 * np.pi * f0 * t)
                     + 0.05 * rng.standard_normal(t_len))
    return np.stack(clips).astype(np.float32)[..., None]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("dito", "glpto", "zdm"),
                   default="dito")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--wav_dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max_clips", type=int, default=64)
    p.add_argument("--crop_len", type=int, default=4096)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--eval_every", type=int, default=100)
    p.add_argument("--vis_every", type=int, default=0,
                   help="dump audio artifacts every N steps (0=only at end)")
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--n_vis", type=int, default=2)
    p.add_argument("--eval_batches", type=int, default=2)
    p.add_argument("--eval_n_steps", type=int, default=None)
    p.add_argument("--z_dim", type=int, default=8)
    p.add_argument("--enc_channels", type=int, default=16)
    p.add_argument("--enc_strides", default="4,4")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--patch", type=int, default=16)
    p.add_argument("--kl_weight", type=float, default=1e-4)
    p.add_argument("--zaug_p", type=float, default=0.1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--ae_params", default=None,
                   help="(zdm) npz of the frozen autoencoder params")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--sample_rate", type=int, default=24000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.flowae import evaluate as ev
    from minimax_speech_tpu.flowae import zdm as zdm_lib
    from minimax_speech_tpu.flowae.dit import DiTConfig
    from minimax_speech_tpu.flowae.dito import DiToAudio, DiToConfig
    from minimax_speech_tpu.flowae.trainer import make_dito_step
    from minimax_speech_tpu.train import schedule, steps
    from minimax_speech_tpu.train.checkpoint import CheckpointManager
    from minimax_speech_tpu.utils.logging import MetricsLogger
    from minimax_speech_tpu.utils.params_io import load_params, save_params

    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    (save_dir / "config.json").write_text(json.dumps(vars(args), indent=1))

    data = build_dataset(args)
    rng = np.random.default_rng(args.seed + 1)
    key = jax.random.PRNGKey(args.seed)

    strides = tuple(int(s) for s in args.enc_strides.split(","))
    ae_cfg = DiToConfig(
        z_dim=args.z_dim, enc_channels=args.enc_channels,
        enc_strides=strides,
        renderer=DiTConfig(hidden=args.hidden, depth=args.depth,
                           num_heads=args.heads, patch=args.patch,
                           in_channels=1, out_channels=1,
                           cond_dim=args.z_dim))
    ae = DiToAudio(ae_cfg)
    z_stride = int(np.prod(strides))
    if args.crop_len % (z_stride * args.patch):
        raise SystemExit("crop_len must divide enc_strides*patch")

    tx = schedule.make_optimizer(lr=args.lr, warmup_steps=args.warmup)
    logger = MetricsLogger(str(save_dir), name=args.model, log_interval=1)
    ckpt = CheckpointManager(str(save_dir / "ckpt"))

    def batches(n):
        for _ in range(n):
            idx = rng.integers(0, data.shape[0], args.batch)
            yield data[idx]

    if args.model == "zdm":
        if not args.ae_params:
            raise SystemExit("--model zdm requires --ae_params")
        ae_vars = load_params(args.ae_params)
        zcfg = zdm_lib.ZDMConfig(
            z_dim=args.z_dim,
            net=DiTConfig(hidden=args.hidden, depth=args.depth,
                          num_heads=args.heads, patch=1,
                          in_channels=args.z_dim, out_channels=args.z_dim,
                          cond_dim=0))
        zdm = zdm_lib.ZDMNet(zcfg)
        n_z = args.crop_len // z_stride
        zvars = zdm.init(jax.random.PRNGKey(args.seed + 2),
                         jnp.zeros((1, n_z, args.z_dim)), jnp.zeros((1,)))
        state = steps.make_train_state(zvars["params"], tx)
        ema = state.params
        step_fn = jax.jit(zdm_lib.make_zdm_step(zdm, ae, ae_vars))
    else:
        if args.model == "glpto":
            raise SystemExit("glpto: use tests/test_flowae.py pattern; "
                             "runner supports dito/zdm tracks")
        audio0 = jnp.asarray(data[:1])
        variables = ae.init(jax.random.PRNGKey(args.seed + 2), audio0,
                            jax.random.PRNGKey(0), args.zaug_p,
                            method=DiToAudio.loss)
        state = steps.make_train_state(variables["params"], tx)
        ema = state.params
        step_fn = jax.jit(make_dito_step(ae, kl_weight=args.kl_weight,
                                         zaug_p=args.zaug_p,
                                         bf16=args.bf16))

    start = 0
    if args.resume:
        state, start = ckpt.restore(state)
        ema = state.params  # EMA restarts from restored params
        print(f"resumed at step {start}")

    def run_eval(step_i):
        nonlocal key
        key, k1, k2 = jax.random.split(key, 3)
        if args.model == "zdm":
            m = ev.evaluate_audio_zdm(
                zdm, {"params": ema}, ae, ae_vars,
                batches(args.eval_batches), k1, save_dir=str(save_dir),
                sample_rate=args.sample_rate)
        else:
            m = ev.evaluate_audio_ae(
                ae, {"params": state.params}, batches(args.eval_batches),
                k1, n_steps=args.eval_n_steps, save_dir=str(save_dir),
                sample_rate=args.sample_rate)
        logger.log(step_i, m, force=True)
        return m

    def run_vis(step_i):
        nonlocal key
        key, k = jax.random.split(key)
        if args.model == "zdm":
            ev.visualize_audio_zdm_random(
                zdm, {"params": ema}, ae, ae_vars, args.crop_len, k,
                str(save_dir), step_i, n_samples=args.n_vis,
                sample_rate=args.sample_rate)
        else:
            ev.visualize_audio_ae_random(
                ae, {"params": state.params}, data, k, str(save_dir),
                step_i, n_samples=args.n_vis,
                n_steps=args.eval_n_steps, sample_rate=args.sample_rate)

    for i in range(start, args.steps):
        key, k = jax.random.split(key)
        batch = {"audio": jnp.asarray(next(iter(batches(1))))}
        state, ema, metrics = step_fn(state, ema, batch, k)
        logger.log(i, metrics)
        if args.eval_every and (i + 1) % args.eval_every == 0:
            run_eval(i + 1)
        if args.vis_every and (i + 1) % args.vis_every == 0:
            run_vis(i + 1)
        if args.save_every and (i + 1) % args.save_every == 0:
            ckpt.save(i + 1, state)

    final = run_eval(args.steps)
    run_vis(args.steps)
    ckpt.save(args.steps, state)
    ckpt.wait()
    if args.model != "zdm":
        save_params(str(save_dir / "ae_params.npz"),
                    {"params": jax.device_get(state.params)})
    print(json.dumps({k: float(v) for k, v in final.items()}))


if __name__ == "__main__":
    main()
