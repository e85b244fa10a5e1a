"""DACVAEFile chunked compress/decompress (VERDICT round-1 item #9;
reference: dac-vae/base.py:16-293 CodecMixin/DACFile)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimax_speech_tpu.infer.codec_file import (DACVAECodec, DACVAEFile,
                                                 loudness_db)
from minimax_speech_tpu.models import dac_vae
from tests.conftest import synthetic_audio

TINY = dac_vae.DACVAEConfig(encoder_dim=8, encoder_rates=(2, 4, 5),
                            latent_dim=8, decoder_dim=32,
                            decoder_rates=(5, 4, 2))


@pytest.fixture(scope="module")
def codec():
    model = dac_vae.DACVAE(TINY)
    hop = model.cfg.hop_length  # 40
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, hop * 4, 1)))
    # tiny stack: receptive field under 4000 samples
    return DACVAECodec(model, variables, model_sr=24000,
                       win_duration=0.25, overlap=4000)


def test_artifact_roundtrip(tmp_path, codec):
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((37, 8)).astype(np.float32)
    f = DACVAEFile(latents=lat.astype(np.float16), original_length=12345,
                   input_db=-17.2, sample_rate=16000, chunk_length=150)
    path = f.save(tmp_path / "x")
    assert path.suffix == ".dacz"
    g = DACVAEFile.load(path)
    assert g.original_length == 12345 and g.sample_rate == 16000
    assert g.latents.dtype == np.float16
    np.testing.assert_allclose(g.latents.astype(np.float32), lat, atol=2e-3)


def test_chunked_latents_match_full_encode(rng, codec):
    audio = synthetic_audio(rng, 1.3, sr=24000)
    f = codec.compress(audio, 24000, normalize_db=None)
    # full-signal encode of the same (padded) audio
    t_pad = dac_vae.pad_to_hop(audio[None], codec.hop)
    full = np.asarray(codec._encode(codec.variables,
                                    jnp.asarray(t_pad)[..., None]))[0]
    n = f.latents.shape[0]
    assert n == full.shape[0]
    # interior chunked latents == full-encode latents (fp16 storage).
    # The outermost receptive field of the SIGNAL differs by design:
    # chunked mode sees a zero runway where full-signal encode sees
    # per-layer SAME padding (the reference's padding=False chunked mode
    # deviates at the edges the same way, base.py:190-199).
    edge = codec.ov_lat // 2
    np.testing.assert_allclose(f.latents.astype(np.float32)[edge:-edge],
                               full[edge:-edge], atol=5e-3, rtol=5e-2)


def test_compress_decompress_roundtrip(rng, codec, tmp_path):
    audio = 0.3 * synthetic_audio(rng, 1.1, sr=24000)
    f = codec.compress(audio, 24000)
    path = f.save(tmp_path / "utt")
    wav = codec.decompress(path)
    assert wav.shape == audio.shape
    assert np.isfinite(wav).all()
    # loudness restored to the input's
    assert abs(loudness_db(wav) - f.input_db) < 1.0
    # chunked decompress == one-shot decode of the same latents
    # (+ the same loudness restore), i.e. chunking adds no artifacts
    one = np.asarray(codec._decode(
        codec.variables, jnp.asarray(f.latents.astype(np.float32))[None]))
    one = one.reshape(-1)[: len(audio)]
    one = one * 10.0 ** ((f.input_db - loudness_db(
        one[: f.latents.shape[0] * codec.hop])) / 20.0)
    edge = codec.overlap
    np.testing.assert_allclose(wav[edge:-edge], one[edge:-edge],
                               atol=2e-3, rtol=5e-2)


def test_resampled_input_roundtrip(rng, codec):
    audio = 0.2 * synthetic_audio(rng, 0.7, sr=16000)
    f = codec.compress(audio, 16000)
    wav = codec.decompress(f)
    assert f.sample_rate == 16000
    assert wav.shape == audio.shape


def test_codec_cli_roundtrip(tmp_path, rng):
    """compress/decompress CLI drive (random weights, tiny default config
    is too big for CPU tests — use the production config? No: drive with
    the module-level codec geometry via monkeypatched config)."""
    import struct
    import wave

    from minimax_speech_tpu.cli import codec as codec_cli
    from minimax_speech_tpu.models import dac_vae as dv

    audio = 0.3 * synthetic_audio(rng, 0.4, sr=24000)
    src = tmp_path / "a.wav"
    with wave.open(str(src), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        pcm = (audio * 32000).astype(np.int16)
        w.writeframes(struct.pack(f"<{len(pcm)}h", *pcm))

    orig = dv.DACVAEConfig
    try:
        dv.DACVAEConfig = lambda: TINY  # tiny geometry for CPU
        codec_cli.main(["compress", "--inputs", str(src),
                        "--win", "0.2", "--overlap", "2000"])
        assert (tmp_path / "a.dacz").exists()
        codec_cli.main(["decompress", "--inputs", str(tmp_path / "a.dacz"),
                        "--win", "0.2", "--overlap", "2000"])
        out = tmp_path / "a_recon.wav"
        assert out.exists()
        with wave.open(str(out)) as w:
            assert w.getframerate() == 24000
            assert w.getnframes() == len(audio)
    finally:
        dv.DACVAEConfig = orig
