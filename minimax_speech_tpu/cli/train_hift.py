"""HiFT vocoder GAN trainer CLI (mel output path).

The reference wires this through the same harness with gan=True
(reference: speech/cosyvoice/hifigan/hifigan.py + train.py:291): mel ->
waveform generator vs MPD + multi-res spectral discriminators, losses
adv + 2x feature-matching + 45x mel L1 + TPR (+ f0 L1 with YIN targets).

  python -m minimax_speech_tpu.cli.train_hift --train_folders DIR \
      --model_dir exp/hift [--num_iters N]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_folders", nargs="+", default=None,
                   help="raw wav folders (fixed-duration random crops)")
    p.add_argument("--train_data", type=str, default=None,
                   help="data list (one wav path per line, with .txt/_fsq "
                        "sidecars): the reference's GAN dataset chain — "
                        "truncate -> compute_fbank -> pitch -> padding")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--config", default="configs/default.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--duration", type=float, default=1.02)
    p.add_argument("--num_iters", type=int, default=200000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--save_iters", type=int, default=2000)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--with_pitch", action="store_true",
                   help="add the f0 L1 loss with YIN targets")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches prepared ahead in a background thread")
    args = p.parse_args(argv)
    if not args.train_folders and not args.train_data:
        p.error("one of --train_folders / --train_data is required")

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.data.audio_folder import AudioFolder
    from minimax_speech_tpu.models import discriminators, hifigan
    from minimax_speech_tpu.ops import mel as mel_ops
    from minimax_speech_tpu.ops.pitch import yin_f0
    from minimax_speech_tpu.train import gan_steps, schedule, steps
    from minimax_speech_tpu.train.checkpoint import CheckpointManager
    from minimax_speech_tpu.utils.logging import MetricsLogger

    cfg = cfg_lib.load_tts_config(args.config, args.override)
    gen = hifigan.HiFTGenerator(cfg.hift)
    disc = discriminators.CosyVoiceDiscriminator()

    sr = cfg.hift.sampling_rate
    hop = cfg.hift.total_upsample  # 480
    n = (int(args.duration * sr) // hop) * hop
    t_mel = n // hop

    key = jax.random.PRNGKey(0)
    g_vars = jax.jit(gen.init)(key, jnp.zeros((1, t_mel,
                                               cfg.hift.in_channels)))
    d_vars = jax.jit(disc.init)(key, jnp.zeros((1, n)))

    tx = lambda: schedule.make_optimizer(lr=args.lr,
                                         warmup_steps=args.warmup_steps,
                                         scheduler="constantlr",
                                         grad_clip=1e3)
    g_state = steps.make_train_state(g_vars["params"], tx())
    d_state = steps.make_train_state(d_vars["params"], tx())
    gen_step, disc_step = gan_steps.make_hift_steps(gen, disc,
                                                    sample_rate=sr)
    gen_step = jax.jit(gen_step, donate_argnums=(0,))
    disc_step = jax.jit(disc_step, donate_argnums=(0,))

    logger = MetricsLogger(args.model_dir, name="hift",
                           log_interval=args.log_interval)
    g_ckpt = CheckpointManager(str(Path(args.model_dir) / "ckpt_g"))
    d_ckpt = CheckpointManager(str(Path(args.model_dir) / "ckpt_d"))
    g_state, start = g_ckpt.restore(g_state)
    d_state, _ = d_ckpt.restore(d_state)

    def folder_batches():
        ds = AudioFolder(args.train_folders, duration=args.duration,
                         sample_rate=sr, seed=start)
        for audio in ds.infinite_batches(args.batch_size):
            audio = audio[:, :n]
            # host-side mel: a device mel would pay a D2H round trip/step
            mel = mel_ops.hifigan_log_mel_np(audio).transpose(0, 2, 1)
            batch = {"speech_feat": mel[:, :t_mel].astype(np.float32),
                     "audio": audio}
            if args.with_pitch:
                pitch = np.stack([yin_f0(a, sr, hop)[:t_mel]
                                  for a in audio])
                batch["pitch"] = np.pad(
                    pitch, ((0, 0), (0, t_mel - pitch.shape[1])))
            yield batch

    def list_batches():
        """The reference's GAN dataset chain (config.yaml data_pipeline
        stages + truncate/pitch, processor.py:304-322,401-428,677-687)."""
        from minimax_speech_tpu.data import pipeline as dp
        items = [{"src": line.strip()} for line in
                 Path(args.train_data).read_text().splitlines()
                 if line.strip()]
        source = dp.DataList(items, process_index=jax.process_index(),
                             process_count=jax.process_count())
        stages = [
            lambda it: dp.individual_file_opener(it, require_latent=False),
            dp.filter_lengths,
            lambda it: dp.resample(it, sr),
            lambda it: dp.truncate(it, n),
            dp.compute_fbank,
        ]
        if args.with_pitch:
            stages.append(lambda it: dp.extract_pitch(it, sr, hop))
        stages += [
            lambda it: dp.shuffle(it, 1000),
            lambda it: dp.static_batch(it, args.batch_size, drop_last=True),
            lambda it: dp.padding_gan(it, hop),
        ]
        epoch = start
        while True:
            source.set_epoch(epoch)
            yield from dp.build_dataset(source, stages)
            epoch += 1

    from minimax_speech_tpu.data import pipeline as dp
    batches = dp.prefetch(
        list_batches() if args.train_data else folder_batches(),
        depth=args.prefetch)
    i = -1
    for i, batch in enumerate(batches):
        step_i = start + i
        if step_i >= args.num_iters:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        k = jax.random.PRNGKey(step_i)
        d_state, dm = disc_step(d_state, g_state.params, batch, k)
        g_state, gm = gen_step(g_state, d_state.params, batch, k)
        if step_i % args.log_interval == 0:
            logger.log(step_i, {**gm, **dm}, force=True)
        if step_i and step_i % args.save_iters == 0:
            g_ckpt.save(step_i, g_state)
            d_ckpt.save(step_i, d_state)
    g_ckpt.save(start + min(args.num_iters, i + 1), g_state)
    g_ckpt.wait()
    d_ckpt.save(start + min(args.num_iters, i + 1), d_state)
    d_ckpt.wait()
    print("hift training done")


if __name__ == "__main__":
    main()
