"""Image DiTo inference: reconstruct images / sample from the prior.

Reference: flowae/image_dito_inference.py:14-188 (DiToInference:
reconstruct_image, compare_reconstruction, batch_reconstruct) — the
encode -> decode(render) path over a trained image DiTo, with
side-by-side comparison output.

  python -m minimax_speech_tpu.cli.image_dito --ae_params ae.npz \
      --input img.png --output out.png --compare
  python -m minimax_speech_tpu.cli.image_dito --ae_params ae.npz \
      --zdm_params zdm.npz --sample 8 --output samples.png
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ae_params", required=True)
    p.add_argument("--input", default=None,
                   help="image file or folder to reconstruct")
    p.add_argument("--output", required=True)
    p.add_argument("--compare", action="store_true",
                   help="write [original | reconstruction] side by side")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--sample", type=int, default=0,
                   help="generate N images from the ZDM prior")
    p.add_argument("--zdm_params", default=None)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--z_dim", type=int, default=4)
    p.add_argument("--enc_channels", type=int, default=16)
    p.add_argument("--enc_strides", default="2,2,2")
    p.add_argument("--renderer", choices=("unet", "dit"), default="unet")
    p.add_argument("--c0", type=int, default=32)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--patch", type=int, default=4)
    p.add_argument("--n_steps", type=int, default=None)
    p.add_argument("--n_classes", type=int, default=0,
                   help=">0: the ZDM prior is class-conditional; sample "
                        "labels cycle 0..n_classes-1 (or --class_label)")
    p.add_argument("--class_label", type=int, default=None)
    p.add_argument("--guidance", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.data.image_folder import (IMAGE_EXTS,
                                                      ImageFolder,
                                                      load_image)
    from minimax_speech_tpu.flowae import image as img_lib
    from minimax_speech_tpu.flowae.consistency_unet import \
        ConsistencyUNetConfig
    from minimax_speech_tpu.flowae.dit import DiTConfig
    from minimax_speech_tpu.utils.params_io import load_params

    strides = tuple(int(s) for s in args.enc_strides.split(","))
    cfg = img_lib.DiToImageConfig(
        z_dim=args.z_dim, enc_channels=args.enc_channels,
        enc_strides=strides, renderer_type=args.renderer,
        unet=ConsistencyUNetConfig(dims=2, c0=args.c0, c1=2 * args.c0,
                                   c2=4 * args.c0, groups=8,
                                   pe_dim=64, t_dim=4 * args.c0),
        renderer=DiTConfig(hidden=args.hidden, depth=args.depth,
                           num_heads=args.heads, patch=args.patch,
                           in_channels=3, out_channels=3,
                           cond_dim=args.z_dim))
    ae = img_lib.DiToImage(cfg)
    ae_vars = load_params(args.ae_params)
    key = jax.random.PRNGKey(args.seed)

    if args.sample:
        if not args.zdm_params:
            raise SystemExit("--sample requires --zdm_params")
        zcfg = img_lib.ImageZDMConfig(
            z_dim=args.z_dim, n_classes=args.n_classes,
            guidance=args.guidance,
            net=DiTConfig(hidden=args.hidden, depth=args.depth,
                          num_heads=args.heads, patch=1,
                          in_channels=args.z_dim, out_channels=args.z_dim,
                          cond_dim=64 if args.n_classes else 0))
        zdm = img_lib.ImageZDMNet(zcfg)
        zvars = load_params(args.zdm_params)
        z_stride = int(np.prod(strides))
        z_hw = (args.image_size // z_stride,) * 2
        cls = None
        if args.n_classes:
            cls = (jnp.full((args.sample,), args.class_label, jnp.int32)
                   if args.class_label is not None
                   else jnp.arange(args.sample, dtype=jnp.int32)
                   % args.n_classes)
        gen = img_lib.image_zdm_generate(
            zdm, zvars, ae, ae_vars, args.sample, z_hw,
            (args.image_size,) * 2, key, render_steps=args.n_steps,
            class_labels=cls)
        img_lib.save_image_grid(np.asarray(gen), args.output)
        print(f"wrote {args.sample} samples to {args.output}")
        return

    if not args.input:
        raise SystemExit("need --input (or --sample)")
    inp = Path(args.input)
    if inp.is_dir():
        ds = ImageFolder(str(inp), size=args.image_size,
                         max_images=args.max_images)
        imgs = np.stack([ds[i] for i in range(len(ds))])
    else:
        if inp.suffix.lower() not in IMAGE_EXTS:
            raise SystemExit(f"unsupported image type {inp.suffix}")
        imgs = load_image(str(inp), args.image_size)[None]

    decode = jax.jit(lambda v, mu, k: img_lib.dito_image_decode(
        ae, v, mu, (args.image_size,) * 2, k, n_steps=args.n_steps))
    _, mu, _ = jax.jit(lambda v, x: ae.apply(
        v, x, method=img_lib.DiToImage.encode))(ae_vars,
                                                jnp.asarray(imgs))
    rec = np.asarray(decode(ae_vars, mu, key))
    mse = float(np.mean((rec - imgs) ** 2))
    psnr = -10 * np.log10(max(np.mean(
        ((rec - imgs) / 2) ** 2), 1e-12))
    if args.compare:
        side = np.concatenate([imgs, rec], axis=2)  # horizontal pairs
        img_lib.save_image_grid(side, args.output, cols=1)
    else:
        img_lib.save_image_grid(rec, args.output)
    print(f"reconstructed {len(imgs)} image(s) -> {args.output} "
          f"(mse={mse:.5f}, psnr={psnr:.2f} dB)")


if __name__ == "__main__":
    main()
