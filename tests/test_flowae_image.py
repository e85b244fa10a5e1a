"""flowae image track + consistency UNet renderers (tiny, CPU).

Reference: flowae/models/networks/consistency_{audio_}decoder_unet.py,
trainers/ldm_trainer.py, datasets/image_folder.py,
image_dito_inference.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.data.image_folder import (ImageFolder,
                                                  synthetic_images)
from minimax_speech_tpu.flowae import image as img_lib
from minimax_speech_tpu.flowae.consistency_unet import (ConsistencyUNet,
                                                        ConsistencyUNetConfig)

TINY_UNET_1D = ConsistencyUNetConfig(dims=1, in_channels=1, out_channels=1,
                                     z_dec_channels=4, c0=8, c1=16, c2=16,
                                     pe_dim=8, t_dim=16, groups=4)
TINY_UNET_2D = ConsistencyUNetConfig(dims=2, in_channels=3, out_channels=3,
                                     z_dec_channels=4, c0=8, c1=16, c2=16,
                                     pe_dim=8, t_dim=16, groups=4)


def test_consistency_unet_1d_shapes(rng):
    net = ConsistencyUNet(TINY_UNET_1D)
    x = jnp.asarray(rng.standard_normal((2, 64, 1)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 4, 4)), jnp.float32)
    t = jnp.array([0.1, 0.9])
    v = net.init(jax.random.PRNGKey(0), x, t, z)
    y = net.apply(v, x, t, z)
    assert y.shape == (2, 64, 1)
    assert np.isfinite(np.asarray(y)).all()
    # unconditional path (z_dec=None) also works
    y0 = net.apply(net.init(jax.random.PRNGKey(1), x, t), x, t)
    assert y0.shape == (2, 64, 1)


def test_consistency_unet_2d_shapes(rng):
    net = ConsistencyUNet(TINY_UNET_2D)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    t = jnp.array([0.5, 0.2])
    v = net.init(jax.random.PRNGKey(0), x, t, z)
    y = net.apply(v, x, t, z)
    assert y.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_unet_time_conditioning_matters(rng):
    net = ConsistencyUNet(TINY_UNET_1D)
    x = jnp.asarray(rng.standard_normal((1, 32, 1)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((1, 2, 4)), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, jnp.array([0.0]), z)
    y0 = net.apply(v, x, jnp.array([0.0]), z)
    y1 = net.apply(v, x, jnp.array([1.0]), z)
    assert float(jnp.max(jnp.abs(y0 - y1))) > 1e-6


def test_dito_audio_unet_renderer(rng):
    from minimax_speech_tpu.flowae.dito import DiToAudio, DiToConfig
    cfg = DiToConfig(z_dim=4, enc_channels=8, enc_strides=(4, 4),
                     renderer_type="unet", unet=TINY_UNET_1D)
    ae = DiToAudio(cfg)
    audio = jnp.asarray(rng.standard_normal((2, 64, 1)), jnp.float32)
    v = ae.init(jax.random.PRNGKey(0), audio, jax.random.PRNGKey(1), 0.1,
                method=DiToAudio.loss)
    rec, kl, z = ae.apply(v, audio, jax.random.PRNGKey(2), 0.1,
                          method=DiToAudio.loss)
    assert np.isfinite(float(rec)) and np.isfinite(float(kl))
    from minimax_speech_tpu.flowae.dito import dito_decode
    wav = dito_decode(ae, v, z, 64, jax.random.PRNGKey(3), n_steps=2)
    assert wav.shape == (2, 64, 1)


def test_dito_image_train_and_decode(rng):
    cfg = img_lib.DiToImageConfig(
        z_dim=4, enc_channels=8, enc_strides=(2, 2),
        renderer_type="unet", unet=TINY_UNET_2D)
    ae = img_lib.DiToImage(cfg)
    imgs = jnp.asarray(synthetic_images(4, 16, seed=3))
    v = ae.init(jax.random.PRNGKey(0), imgs[:2], jax.random.PRNGKey(1),
                0.1, method=img_lib.DiToImage.loss)

    from minimax_speech_tpu.train import schedule, steps
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(v["params"], tx)
    step = jax.jit(img_lib.make_dito_image_step(ae))
    losses = []
    ema = state.params
    for i in range(3):
        state, ema, m = step(state, ema, {"image": imgs[:2]},
                             jax.random.PRNGKey(10 + i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))

    m = img_lib.eval_image_reconstruction(
        ae, {"params": state.params}, imgs[:2], jax.random.PRNGKey(5),
        n_steps=2)
    assert np.isfinite(float(m["eval/psnr"]))

    # zdm over the latent grid
    zcfg = img_lib.ImageZDMConfig(z_dim=4)
    zdm = img_lib.ImageZDMNet(zcfg)
    zv = zdm.init(jax.random.PRNGKey(6), jnp.zeros((1, 4, 4, 4)),
                  jnp.zeros((1,)))
    zstate = steps.make_train_state(zv["params"], tx)
    zstep = jax.jit(img_lib.make_image_zdm_step(
        zdm, ae, {"params": state.params}))
    zstate, zema, zm = zstep(zstate, zstate.params, {"image": imgs[:2]},
                             jax.random.PRNGKey(7))
    assert np.isfinite(float(zm["zdm/loss"]))
    gen = img_lib.image_zdm_generate(
        zdm, {"params": zema}, ae, {"params": state.params},
        2, (4, 4), (16, 16), jax.random.PRNGKey(8), n_steps=2,
        render_steps=2)
    assert gen.shape == (2, 16, 16, 3)


def test_image_folder_roundtrip(tmp_path, rng):
    from PIL import Image
    for i in range(3):
        arr = (rng.uniform(0, 255, (20, 24, 3))).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"im{i}.png")
    ds = ImageFolder(str(tmp_path), size=16)
    assert len(ds) == 3
    im = ds[0]
    assert im.shape == (16, 16, 3)
    assert -1.0 <= im.min() and im.max() <= 1.0
    batch = next(ds.batches(2, np.random.default_rng(0)))
    assert batch.shape == (2, 16, 16, 3)


def test_class_image_folder(tmp_path, rng):
    from PIL import Image
    from minimax_speech_tpu.data.image_folder import ClassImageFolder
    for cls in ("cat", "dog"):
        (tmp_path / cls).mkdir()
        for i in range(2):
            arr = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / cls / f"{i}.png")
    ds = ClassImageFolder(str(tmp_path), size=16)
    assert ds.n_classes == 2
    imgs, labs = next(ds.batches_with_labels(4, np.random.default_rng(0)))
    assert imgs.shape[0] == labs.shape[0] == 4
    assert set(np.unique(labs)) <= {0, 1}


def test_tar_image_shards(tmp_path, rng):
    """Tar shards of bare images feed the image track through the one
    tar-shard reader (data/webdataset.py)."""
    import tarfile

    from PIL import Image
    from minimax_speech_tpu.data.webdataset import WebDatasetShards
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        arr = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    with tarfile.open(tmp_path / "shard0.tar", "w") as tf:
        for f in sorted(img_dir.iterdir()):
            tf.add(f, arcname=f.name)
    ds = WebDatasetShards(str(tmp_path), size=8)
    imgs = [s["image"] for s in ds.samples(epoch=0)]
    batch = np.stack(imgs[:2])
    assert batch.shape == (2, 8, 8, 3)
    assert batch.min() >= -1.0 and batch.max() <= 1.0


@pytest.mark.slow
def test_image_cli_e2e(tmp_path):
    """train dito -> train zdm -> reconstruct via the inference CLI
    (reference flow: ldm_trainer.py + image_dito_inference.py)."""
    from PIL import Image

    from minimax_speech_tpu.cli import image_dito, train_flowae_image

    dito_dir = tmp_path / "dito"
    train_flowae_image.main([
        "--model", "dito", "--save_dir", str(dito_dir), "--synthetic",
        "--max_images", "8", "--image_size", "16", "--steps", "3",
        "--batch", "2", "--enc_strides", "2,2", "--c0", "8",
        "--eval_every", "3", "--eval_n_steps", "2", "--save_every", "3"])
    assert (dito_dir / "ae_params.npz").exists()
    assert (dito_dir / "recon_3.png").exists()

    zdm_dir = tmp_path / "zdm"
    train_flowae_image.main([
        "--model", "zdm", "--save_dir", str(zdm_dir), "--synthetic",
        "--max_images", "8", "--image_size", "16", "--steps", "3",
        "--batch", "2", "--enc_strides", "2,2", "--c0", "8",
        "--ae_params", str(dito_dir / "ae_params.npz"),
        "--eval_every", "3", "--eval_n_steps", "2", "--save_every", "3"])
    assert (zdm_dir / "zdm_params.npz").exists()
    assert (zdm_dir / "samples_3.png").exists()

    # inference CLI reconstruct + sample
    src = tmp_path / "in.png"
    Image.fromarray((np.clip(
        (np.asarray(synthetic_images(1, 16, seed=9))[0] * 0.5 + 0.5), 0, 1)
        * 255).astype(np.uint8)).save(src)
    out = tmp_path / "out.png"
    image_dito.main(["--ae_params", str(dito_dir / "ae_params.npz"),
                     "--input", str(src), "--output", str(out),
                     "--image_size", "16", "--enc_strides", "2,2",
                     "--c0", "8", "--n_steps", "2", "--compare"])
    assert out.exists()
    samp = tmp_path / "samples.png"
    image_dito.main(["--ae_params", str(dito_dir / "ae_params.npz"),
                     "--zdm_params", str(zdm_dir / "zdm_params.npz"),
                     "--sample", "2", "--output", str(samp),
                     "--image_size", "16", "--enc_strides", "2,2",
                     "--c0", "8", "--n_steps", "2"])
    assert samp.exists()


def test_class_conditional_zdm(tmp_path):
    """Class-conditional latent prior with CFG (reference:
    ldm_trainer.py:197-209,347-373 — class_labels conditioning, class
    index n_classes as the CFG null token): train a few steps through
    the CLI on labeled synthetic data, then sample per-class through
    the inference surface with guidance > 1."""
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.cli import image_dito, train_flowae_image

    dito_dir = tmp_path / "dito"
    train_flowae_image.main([
        "--model", "dito", "--save_dir", str(dito_dir), "--synthetic",
        "--max_images", "8", "--image_size", "16", "--steps", "2",
        "--batch", "2", "--enc_strides", "2,2", "--c0", "8",
        "--eval_every", "0", "--save_every", "0"])

    zdm_dir = tmp_path / "zdm"
    train_flowae_image.main([
        "--model", "zdm", "--save_dir", str(zdm_dir), "--synthetic",
        "--class_cond", "--n_classes", "2", "--label_drop", "0.5",
        "--max_images", "8", "--image_size", "16", "--steps", "2",
        "--batch", "4", "--enc_strides", "2,2", "--c0", "8", "--lr",
        "0.01", "--warmup", "1",
        "--ae_params", str(dito_dir / "ae_params.npz"),
        "--eval_every", "2", "--eval_n_steps", "2", "--save_every", "0"])
    assert (zdm_dir / "zdm_params.npz").exists()
    assert (zdm_dir / "samples_2.png").exists()

    samp = tmp_path / "samples.png"
    image_dito.main(["--ae_params", str(dito_dir / "ae_params.npz"),
                     "--zdm_params", str(zdm_dir / "zdm_params.npz"),
                     "--sample", "2", "--output", str(samp),
                     "--image_size", "16", "--enc_strides", "2,2",
                     "--c0", "8", "--n_steps", "2",
                     "--n_classes", "2", "--class_label", "1",
                     "--guidance", "2.0"])
    assert samp.exists()

    # different class labels steer generation (same key, same noise)
    from minimax_speech_tpu.flowae import image as img_lib
    from minimax_speech_tpu.flowae.dit import DiTConfig
    from minimax_speech_tpu.utils.params_io import load_params
    zcfg = img_lib.ImageZDMConfig(
        z_dim=4, n_classes=2, guidance=2.0,
        net=DiTConfig(hidden=64, depth=3, num_heads=4, patch=1,
                      in_channels=4, out_channels=4, cond_dim=64))
    zdm = img_lib.ImageZDMNet(zcfg)
    zvars = load_params(str(zdm_dir / "zdm_params.npz"))
    x = jnp.zeros((2, 4, 4, 4))
    t = jnp.ones((2,))
    out0 = zdm.apply(zvars, x, t, class_labels=jnp.array([0, 0]))
    out1 = zdm.apply(zvars, x, t, class_labels=jnp.array([1, 1]))
    # adaLN-zero: the modulation MLP is zero-init, so class influence
    # starts tiny — a DISCONNECTED label path gives bit-identical
    # outputs, a connected one diverges after any training
    assert not np.array_equal(np.asarray(out0), np.asarray(out1))
