"""DAC-VAE codec trainer CLI.

Replaces dac-vae/train.py (reference: dac-vae/train.py:147-973): dual
optimizers (generator + discriminator), lambda-weighted losses (mel 15,
feat 2, adv 1, KL 0.1 beta-annealed), infinite random-crop loader,
periodic checkpoints, and decode-sample dumping.

  python -m minimax_speech_tpu.cli.train_dac --train_folders DIR \
      --model_dir exp/dac [--num_iters N]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_folders", nargs="+", required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--config", default="configs/default.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--duration", type=float, default=0.38)
    p.add_argument("--num_iters", type=int, default=500000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--gan_start_step", type=int, default=0)
    p.add_argument("--save_iters", type=int, default=1000)
    p.add_argument("--sample_freq", type=int, default=2000)
    p.add_argument("--log_interval", type=int, default=10)
    # audiotools-style transform chain (reference: train.py:39-49 +
    # configs `build_transform.*`; active reference config is
    # Identity-only with augment_prob 0.0)
    p.add_argument("--preprocess", nargs="*", default=["Identity"])
    p.add_argument("--augment", nargs="*", default=["Identity"])
    p.add_argument("--postprocess", nargs="*", default=["Identity"])
    p.add_argument("--augment_prob", type=float, default=0.0)
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches prepared ahead in a background thread")
    p.add_argument("--export_npz", type=str, default=None,
                   help="also write final generator params as .npz")
    # loss-weight overrides (reference: dac-vae/configs/*.yml lambdas);
    # None keeps the DACLambdas default
    p.add_argument("--lambda_mel", type=float, default=None)
    p.add_argument("--lambda_waveform", type=float, default=None)
    p.add_argument("--lambda_stft", type=float, default=None)
    p.add_argument("--spectral_warmup_steps", type=int, default=0,
                   help="ramp mel/stft weights 0->lambda over N steps "
                        "(guards the log-magnitude near-silence "
                        "gradient explosion; see gan_steps)")
    p.add_argument("--spectral_delay_steps", type=int, default=0,
                   help="hold mel/stft weights at exactly 0 for N steps "
                        "before the warmup ramp (waveform L1 must align "
                        "the output first; see gan_steps)")
    p.add_argument("--grad_clip", type=float, default=1e3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.data.audio_folder import AudioFolder
    from minimax_speech_tpu.models import dac_vae, discriminators
    from minimax_speech_tpu.train import gan_steps, schedule, steps
    from minimax_speech_tpu.train.checkpoint import CheckpointManager
    from minimax_speech_tpu.utils.logging import MetricsLogger

    cfg = cfg_lib.load_tts_config(args.config, args.override)
    gen = dac_vae.DACVAE(cfg.dac)
    disc = discriminators.DACDiscriminator()

    key = jax.random.PRNGKey(0)
    n = int(args.duration * cfg.dac.sample_rate)
    n = (n // cfg.dac.hop_length) * cfg.dac.hop_length
    g_vars = jax.jit(gen.init)(key, jnp.zeros((1, n, 1)))
    d_vars = jax.jit(disc.init)(key, jnp.zeros((1, n)))

    tx_g = schedule.make_optimizer(lr=args.lr, warmup_steps=args.warmup_steps,
                                   scheduler="constantlr",
                                   grad_clip=args.grad_clip,
                                   weight_decay=1e-3)
    tx_d = schedule.make_optimizer(lr=args.lr, warmup_steps=args.warmup_steps,
                                   scheduler="constantlr", grad_clip=10.0,
                                   weight_decay=1e-3)
    g_state = steps.make_train_state(g_vars["params"], tx_g)
    d_state = steps.make_train_state(d_vars["params"], tx_d)

    lam = gan_steps.DACLambdas()
    overrides = {k: v for k, v in (("mel", args.lambda_mel),
                                   ("waveform", args.lambda_waveform),
                                   ("stft", args.lambda_stft))
                 if v is not None}
    if overrides:
        import dataclasses
        lam = dataclasses.replace(lam, **overrides)
    gen_step, disc_step = gan_steps.make_dac_steps(
        gen, disc, lambdas=lam, sample_rate=cfg.dac.sample_rate,
        gan_start_step=args.gan_start_step,
        spectral_warmup_steps=args.spectral_warmup_steps,
        spectral_delay_steps=args.spectral_delay_steps)
    gen_step = jax.jit(gen_step, donate_argnums=(0,))
    disc_step = jax.jit(disc_step, donate_argnums=(0,))

    logger = MetricsLogger(args.model_dir, name="dac",
                           log_interval=args.log_interval)
    g_ckpt = CheckpointManager(str(Path(args.model_dir) / "ckpt_g"))
    d_ckpt = CheckpointManager(str(Path(args.model_dir) / "ckpt_d"))
    g_state, start = g_ckpt.restore(g_state)
    d_state, _ = d_ckpt.restore(d_state)

    ds = AudioFolder(args.train_folders, duration=args.duration,
                     sample_rate=cfg.dac.sample_rate, seed=start)
    decode = jax.jit(lambda v, z: gen.apply(
        v, z, method=dac_vae.DACVAE.decode))
    encode = jax.jit(lambda v, a: gen.apply(
        v, a, method=dac_vae.DACVAE.encode)[1])

    from minimax_speech_tpu.utils.audio_signal import AudioSignal
    from minimax_speech_tpu.utils.audio_transforms import build_transform
    tfm = build_transform(augment_prob=args.augment_prob,
                          preprocess=args.preprocess, augment=args.augment,
                          postprocess=args.postprocess)
    identity_only = (args.preprocess == args.augment == args.postprocess
                     == ["Identity"])

    def prepped():
        """Crop + (optional) transform per batch, prefetchable so host
        data prep overlaps device steps."""
        for i, audio in enumerate(ds.infinite_batches(args.batch_size)):
            step_i = start + i
            audio = audio[:, :n]
            if not identity_only:  # transform batch (ref train.py:620-627)
                sig = tfm(jax.random.PRNGKey(10_000_019 + step_i),
                          AudioSignal(audio[:, None, :],
                                      cfg.dac.sample_rate))
                audio = np.asarray(sig.audio_data[:, 0, :])
            yield i, audio

    from minimax_speech_tpu.data import pipeline as dp
    i = -1
    for i, audio in dp.prefetch(prepped(), depth=args.prefetch):
        step_i = start + i
        if step_i >= args.num_iters:
            break
        batch = {"audio": jnp.asarray(audio)}
        k = jax.random.PRNGKey(step_i)
        # disc first, then gen (reference order, train.py:675-773)
        d_state, dm = disc_step(d_state, g_state.params, batch, k)
        g_state, gm = gen_step(g_state, d_state.params, batch, k)
        if step_i % args.log_interval == 0:
            logger.log(step_i, {**gm, **dm}, force=True)
        if step_i and step_i % args.save_iters == 0:
            g_ckpt.save(step_i, g_state)
            d_ckpt.save(step_i, d_state)
        if step_i and step_i % args.sample_freq == 0:
            # decode-sample dump (reference: train.py:877-935)
            mu = encode({"params": g_state.params}, batch["audio"][:1, :, None])
            rec = decode({"params": g_state.params}, mu)
            out = Path(args.model_dir) / f"sample_{step_i}.npy"
            np.save(out, np.asarray(rec)[0, :, 0])
    g_ckpt.save(start + min(args.num_iters, i + 1), g_state)
    g_ckpt.wait()
    d_ckpt.save(start + min(args.num_iters, i + 1), d_state)
    d_ckpt.wait()
    if args.export_npz:
        from minimax_speech_tpu.utils.params_io import save_params
        save_params(args.export_npz,
                    {"params": jax.device_get(g_state.params)})
        print(f"exported generator params to {args.export_npz}")
    print("dac training done")


if __name__ == "__main__":
    main()
