"""flowae IMAGE experiment runner: train image DiTo / latent ZDM.

Reference: flowae/trainers/ldm_trainer.py:23-443 (LDMTrainer: train
loop, evaluate_ae PSNR/FID, evaluate_zdm, grid visualization) +
run.py (config runner). FID needs torch_fidelity (GPU) — on-device
PSNR + latent diagnostics replace it; sample grids are written as PNGs.

  python -m minimax_speech_tpu.cli.train_flowae_image --model dito \
      --image_dir data/imgs --save_dir exp/dito_img --steps 2000
  python -m minimax_speech_tpu.cli.train_flowae_image --model zdm \
      --ae_params exp/dito_img/ae_params.npz --save_dir exp/zdm_img
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_dataset(args) -> tuple:
    """-> (images (N,H,W,3) in [-1,1], labels (N,) int32 or None,
    n_classes)."""
    from minimax_speech_tpu.data.image_folder import (ClassImageFolder,
                                                      ImageFolder,
                                                      synthetic_images)

    def synth():
        imgs = synthetic_images(args.max_images, args.image_size,
                                args.seed)
        if not args.class_cond:
            return imgs, None, 0
        # smoke-run labels: cyclic assignment (class semantics don't
        # matter for the conditioning plumbing)
        n = max(args.n_classes, 2)
        return imgs, np.arange(len(imgs), dtype=np.int32) % n, n

    if args.synthetic:
        return synth()
    if args.tar_shards:
        from minimax_speech_tpu.data.webdataset import WebDatasetShards
        ds = WebDatasetShards(args.tar_shards, size=args.image_size,
                              seed=args.seed,
                              required=("image", "label")
                              if args.class_cond else ("image",))
        imgs, labs = [], []
        for s in ds.samples(epoch=0):
            imgs.append(s["image"])
            if args.class_cond:
                labs.append(int(s["label"]))
            if len(imgs) >= args.max_images:
                break
        return (np.stack(imgs),
                np.asarray(labs, np.int32) if args.class_cond else None,
                (max(labs) + 1) if labs else 0)
    if args.image_dir:
        if args.class_cond:
            ds = ClassImageFolder(args.image_dir, size=args.image_size,
                                  max_images=args.max_images)
            imgs = np.stack([ds[i] for i in range(len(ds))])
            return imgs, ds.labels, ds.n_classes
        ds = ImageFolder(args.image_dir, size=args.image_size,
                         max_images=args.max_images)
        return np.stack([ds[i] for i in range(len(ds))]), None, 0
    return synth()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("dito", "zdm"), default="dito")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--image_dir", default=None)
    p.add_argument("--tar_shards", default=None,
                   help="webdataset-layout .tar shards: a dir of *.tar "
                        "or a .json list (data/webdataset.py)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max_images", type=int, default=64)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--eval_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--eval_batches", type=int, default=1)
    p.add_argument("--eval_n_steps", type=int, default=None)
    p.add_argument("--z_dim", type=int, default=4)
    p.add_argument("--enc_channels", type=int, default=16)
    p.add_argument("--enc_strides", default="2,2,2")
    p.add_argument("--renderer", choices=("unet", "dit"), default="unet")
    p.add_argument("--c0", type=int, default=32)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--patch", type=int, default=4)
    p.add_argument("--kl_weight", type=float, default=1e-4)
    p.add_argument("--zaug_p", type=float, default=0.1)
    p.add_argument("--class_cond", action="store_true",
                   help="class-conditional ZDM prior (labels from class "
                        "subdirs / .cls shard members / cyclic synthetic)")
    p.add_argument("--n_classes", type=int, default=0,
                   help="override the inferred class count")
    p.add_argument("--label_drop", type=float, default=0.1)
    p.add_argument("--guidance", type=float, default=2.0,
                   help="CFG scale for class-conditional generation")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--ae_params", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.flowae import image as img_lib
    from minimax_speech_tpu.flowae.consistency_unet import \
        ConsistencyUNetConfig
    from minimax_speech_tpu.flowae.dit import DiTConfig
    from minimax_speech_tpu.train import schedule, steps
    from minimax_speech_tpu.train.checkpoint import CheckpointManager
    from minimax_speech_tpu.utils.logging import MetricsLogger
    from minimax_speech_tpu.utils.params_io import load_params, save_params

    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    (save_dir / "config.json").write_text(json.dumps(vars(args), indent=1))

    data, labels, n_classes = build_dataset(args)
    if args.n_classes:
        n_classes = args.n_classes
    rng = np.random.default_rng(args.seed + 1)
    key = jax.random.PRNGKey(args.seed)

    strides = tuple(int(s) for s in args.enc_strides.split(","))
    z_stride = int(np.prod(strides))
    if args.image_size % z_stride:
        raise SystemExit(f"image_size must be divisible by the encoder "
                         f"stride product {z_stride}")
    if args.renderer == "unet" and args.image_size % 8:
        raise SystemExit("image_size must be divisible by 8 for the UNet "
                         "renderer (three 2x pools)")
    ae_cfg = img_lib.DiToImageConfig(
        z_dim=args.z_dim, enc_channels=args.enc_channels,
        enc_strides=strides, renderer_type=args.renderer,
        unet=ConsistencyUNetConfig(dims=2, c0=args.c0, c1=2 * args.c0,
                                   c2=4 * args.c0, groups=8,
                                   pe_dim=64, t_dim=4 * args.c0),
        renderer=DiTConfig(hidden=args.hidden, depth=args.depth,
                           num_heads=args.heads, patch=args.patch,
                           in_channels=3, out_channels=3,
                           cond_dim=args.z_dim))
    ae = img_lib.DiToImage(ae_cfg)

    tx = schedule.make_optimizer(lr=args.lr, warmup_steps=args.warmup)
    logger = MetricsLogger(str(save_dir), name=args.model, log_interval=1)
    ckpt = CheckpointManager(str(save_dir / "ckpt"))

    def batches(n):
        for _ in range(n):
            idx = rng.integers(0, data.shape[0], args.batch)
            b = {"image": data[idx]}
            if labels is not None:
                b["label"] = labels[idx]
            yield b

    z_hw = (args.image_size // z_stride,) * 2
    if args.model == "zdm":
        if not args.ae_params:
            raise SystemExit("--model zdm requires --ae_params")
        if args.class_cond and labels is None:
            raise SystemExit("--class_cond needs a labeled dataset")
        ae_vars = load_params(args.ae_params)
        cls_n = n_classes if args.class_cond else 0
        zcfg = img_lib.ImageZDMConfig(
            z_dim=args.z_dim, n_classes=cls_n,
            label_drop=args.label_drop, guidance=args.guidance,
            net=DiTConfig(hidden=args.hidden, depth=args.depth,
                          num_heads=args.heads, patch=1,
                          in_channels=args.z_dim, out_channels=args.z_dim,
                          cond_dim=64 if cls_n else 0))
        zdm = img_lib.ImageZDMNet(zcfg)
        zvars = zdm.init(jax.random.PRNGKey(args.seed + 2),
                         jnp.zeros((1,) + z_hw + (args.z_dim,)),
                         jnp.zeros((1,)),
                         class_labels=(jnp.zeros((1,), jnp.int32)
                                       if cls_n else None))
        state = steps.make_train_state(zvars["params"], tx)
        ema = state.params
        step_fn = jax.jit(img_lib.make_image_zdm_step(zdm, ae, ae_vars))
    else:
        img0 = jnp.asarray(data[:1])
        variables = ae.init(jax.random.PRNGKey(args.seed + 2), img0,
                            jax.random.PRNGKey(0), args.zaug_p,
                            method=img_lib.DiToImage.loss)
        state = steps.make_train_state(variables["params"], tx)
        ema = state.params
        step_fn = jax.jit(img_lib.make_dito_image_step(
            ae, kl_weight=args.kl_weight, zaug_p=args.zaug_p,
            bf16=args.bf16))

    start = 0
    if args.resume:
        state, start = ckpt.restore(state)
        ema = state.params
        print(f"resumed at step {start}")

    def run_eval(step_i):
        nonlocal key
        key, k1 = jax.random.split(key)
        if args.model == "zdm":
            cls = (jnp.arange(args.batch, dtype=jnp.int32)
                   % max(n_classes, 1) if zcfg.n_classes else None)
            gen = img_lib.image_zdm_generate(
                zdm, {"params": ema}, ae, ae_vars, args.batch, z_hw,
                (args.image_size,) * 2, k1,
                render_steps=args.eval_n_steps, class_labels=cls)
            img_lib.save_image_grid(
                np.asarray(gen), str(save_dir / f"samples_{step_i}.png"))
            m = {"zdm_eval/sample_mean": float(jnp.mean(gen)),
                 "zdm_eval/sample_std": float(jnp.std(gen))}
        else:
            imgs = jnp.asarray(next(iter(batches(1)))["image"])
            m = img_lib.eval_image_reconstruction(
                ae, {"params": state.params}, imgs, k1,
                n_steps=args.eval_n_steps)
            m = {k: float(v) for k, v in m.items()}
            key, k2 = jax.random.split(key)
            _, mu, _ = ae.apply({"params": state.params}, imgs[:4],
                                method=img_lib.DiToImage.encode)
            rec = img_lib.dito_image_decode(
                ae, {"params": state.params}, mu,
                (args.image_size,) * 2, k2, n_steps=args.eval_n_steps)
            grid = np.concatenate([np.asarray(imgs[:4]), np.asarray(rec)])
            img_lib.save_image_grid(
                grid, str(save_dir / f"recon_{step_i}.png"))
        logger.log(step_i, m, force=True)
        return m

    for i in range(start, args.steps):
        key, k = jax.random.split(key)
        batch = {k2: jnp.asarray(v)
                 for k2, v in next(iter(batches(1))).items()}
        state, ema, metrics = step_fn(state, ema, batch, k)
        logger.log(i, metrics)
        if args.eval_every and (i + 1) % args.eval_every == 0:
            run_eval(i + 1)
        if args.save_every and (i + 1) % args.save_every == 0:
            ckpt.save(i + 1, state)

    final = run_eval(args.steps)
    ckpt.save(args.steps, state)
    ckpt.wait()
    if args.model != "zdm":
        save_params(str(save_dir / "ae_params.npz"),
                    {"params": jax.device_get(state.params)})
    else:
        save_params(str(save_dir / "zdm_params.npz"),
                    {"params": jax.device_get(ema)})
    print(json.dumps({k: float(v) for k, v in final.items()}))


if __name__ == "__main__":
    main()
