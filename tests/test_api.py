"""CosyVoice2-compatible API tests (tiny geometry, CPU)."""
import numpy as np
import pytest

import jax

from minimax_speech_tpu.infer import api
from minimax_speech_tpu.infer.pipeline import TTSPipeline
from tests.conftest import synthetic_audio
from tests.test_pipeline import tiny_cfg


@pytest.fixture(scope="module")
def tts():
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 32
    pipe = TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    return api.TTS(pipeline=pipe)


@pytest.mark.slow
def test_zero_shot(tts, rng):
    prompt = synthetic_audio(rng, 0.5, 16000)
    outs = list(tts.inference_zero_shot("hello world", "reference text",
                                        prompt))
    assert len(outs) >= 1
    wav = outs[0]["tts_speech"]
    assert wav.ndim == 2 and wav.shape[0] == 1 and wav.shape[1] > 0
    assert np.isfinite(wav).all()


@pytest.mark.slow
def test_spk_cache_roundtrip(tts, rng, tmp_path):
    prompt = synthetic_audio(rng, 0.5, 16000)
    assert tts.add_zero_shot_spk("ref text", prompt, "spk_a")
    assert tts.list_available_spks() == ["spk_a"]
    path = str(tmp_path / "spk2info.npz")
    tts.save_spkinfo(path)
    tts2 = api.TTS(pipeline=tts.pipeline)
    tts2.load_spkinfo(path)
    assert tts2.list_available_spks() == ["spk_a"]
    outs = list(tts2.inference_zero_shot("short text", "", prompt,
                                         zero_shot_spk_id="spk_a"))
    assert outs[0]["tts_speech"].shape[1] > 0


@pytest.mark.slow
def test_cross_lingual_and_vc(tts, rng):
    prompt = synthetic_audio(rng, 0.5, 16000)
    outs = list(tts.inference_cross_lingual("short", prompt))
    assert outs[0]["tts_speech"].shape[1] > 0

    source = synthetic_audio(rng, 0.8, 16000)
    outs = list(tts.inference_vc(source, prompt))
    wav = outs[0]["tts_speech"]
    # VC output length tracks the source token count exactly
    src_tokens = tts.pipeline.extract_prompt_tokens(source)
    assert wav.shape[1] == len(src_tokens) * 2 * 480


@pytest.mark.slow
def test_speed_change(tts, rng):
    prompt = synthetic_audio(rng, 0.5, 16000)
    normal = list(tts.inference_zero_shot("same words here", "r", prompt,
                                          seed=5))
    fast = list(tts.inference_zero_shot("same words here", "r", prompt,
                                        speed=2.0, seed=5))
    n1 = sum(o["tts_speech"].shape[1] for o in normal)
    n2 = sum(o["tts_speech"].shape[1] for o in fast)
    assert abs(n2 - n1 / 2) <= 2
