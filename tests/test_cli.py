"""CLI surface tests: config loading, synthesize/extract on temp wavs."""
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import synthetic_audio


def write_wav(path, audio, sr):
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_config_load_and_overrides():
    from minimax_speech_tpu import config as cfg_lib
    cfg = cfg_lib.load_tts_config("configs/default.yaml",
                                  ["model.lm.qwen.n_layers=3",
                                   "model.flow.n_timesteps=4"])
    assert cfg.lm.qwen.n_layers == 3
    assert cfg.flow.n_timesteps == 4
    assert cfg.lm.qwen.hidden_size == 896  # untouched default

    tiny = cfg_lib.load_tts_config("configs/tiny.yaml")
    assert tiny.lm.qwen.hidden_size == 32          # child override
    assert tiny.flow.unet.channels == (32,)
    assert tiny.dac.encoder_rates == (2, 3, 4, 4, 5)  # inherited from base


def test_unknown_config_key_rejected(tmp_path):
    from minimax_speech_tpu import config as cfg_lib
    bad = tmp_path / "bad.yaml"
    bad.write_text("model:\n  lm:\n    not_a_key: 1\n")
    with pytest.raises(KeyError):
        cfg_lib.load_tts_config(bad)


@pytest.mark.slow
def test_synthesize_cli(tmp_path, rng):
    from minimax_speech_tpu.cli import synthesize
    prompt = tmp_path / "prompt.wav"
    write_wav(prompt, synthetic_audio(rng, 0.5, 24000), 24000)
    out = tmp_path / "out.wav"
    synthesize.main([
        "--text", "hello world, this is a test with 3 numbers",
        "--prompt_text", "reference",
        "--prompt_wav", str(prompt), "--out", str(out),
        "--config", "configs/tiny.yaml", "--random_init"])
    assert out.exists()
    with wave.open(str(out)) as w:
        assert w.getframerate() == 24000
        assert w.getnframes() > 0


@pytest.mark.slow
def test_extract_clis(tmp_path, rng):
    from minimax_speech_tpu.cli import extract_dac_latents, extract_fsq
    for i in range(2):
        write_wav(tmp_path / f"a{i}.wav", synthetic_audio(rng, 0.4, 16000),
                  16000)
        write_wav(tmp_path / f"b{i}.wav", synthetic_audio(rng, 0.4, 24000),
                  24000)
    extract_fsq.main(["--dir", str(tmp_path), "--random_init",
                      "--config" if False else "--batch_size", "2"])
    fsq_files = list(tmp_path.glob("*_fsq.npy"))
    assert len(fsq_files) == 4
    toks = np.load(fsq_files[0])
    assert toks.dtype == np.int32 and toks.min() >= 0 and toks.max() < 6561

    # dac extraction only accepts 24 kHz files
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(str(tmp_path / f"b{i}.wav") for i in range(2)))
    extract_dac_latents.main(["--file_list", str(lst), "--random_init",
                              "--verify_fraction", "1.0"])
    lat = np.load(tmp_path / "b0_latent2x.npz")
    assert lat["mu"].shape[1] == 80


def test_hf_config_variant():
    from minimax_speech_tpu import config as cfg_lib
    cfg = cfg_lib.load_tts_config("configs/hf.yaml")
    assert cfg.lm.qwen.hidden_size == 512
    assert cfg.token_latent_ratio == 3
    assert cfg.flow.encoder.num_blocks == 4
    assert cfg.dac.encoder_rates == (2, 3, 4, 4, 5)  # inherited


@pytest.mark.slow
def test_extract_embedding_cli(tmp_path, rng):
    from minimax_speech_tpu.cli import extract_embedding
    write_wav(tmp_path / "e0.wav", synthetic_audio(rng, 0.4, 24000), 24000)
    extract_embedding.main(["--dir", str(tmp_path), "--random_init"])
    emb = np.load(tmp_path / "e0_spk.npy")
    assert emb.shape == (192,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)


def test_convert_checkpoint_new_kinds_dispatch(tmp_path, monkeypatch):
    """campplus/matcha/matcha_hifigan kinds reach the right converter
    and write loadable npz (the converters themselves are parity-tested
    in test_campplus / test_matcha_text_encoder / test_matcha_hifigan;
    matcha_hifigan_params returns FULL variables — the CLI must not
    re-wrap them in {'params': ...})."""
    torch = pytest.importorskip("torch")
    from minimax_speech_tpu.cli import convert_checkpoint
    from minimax_speech_tpu.models import matcha_hifigan as mh
    from minimax_speech_tpu.utils import convert
    from minimax_speech_tpu.utils.params_io import load_params

    src = tmp_path / "ckpt.pt"
    torch.save({"w": torch.zeros(3)}, src)

    monkeypatch.setattr(convert, "campplus_params",
                        lambda s, **k: {"params": {"got": s["w"]}})
    monkeypatch.setattr(convert, "matcha_text_encoder_params",
                        lambda s, **k: {"got": s["w"]})
    monkeypatch.setattr(mh, "matcha_hifigan_params",
                        lambda s, **k: {"params": {"got": s["w"]}})

    for kind in ("campplus", "matcha", "matcha_hifigan"):
        out = tmp_path / f"{kind}.npz"
        convert_checkpoint.main(["--kind", kind, "--src", str(src),
                                 "--out", str(out),
                                 "--config", "configs/tiny.yaml"])
        v = load_params(str(out))
        assert v["params"]["got"].shape == (3,), kind
