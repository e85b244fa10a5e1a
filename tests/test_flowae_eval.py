"""flowae eval suites + runner CLI (reference:
flowae/trainers/audio_ldm_trainer.py:298-730 AE/ZDM eval, visualize,
artifact logging; run.py runner)."""
import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minimax_speech_tpu.flowae import evaluate as ev
from minimax_speech_tpu.flowae.dit import DiTConfig
from minimax_speech_tpu.flowae.dito import DiToAudio, DiToConfig

TINY = DiToConfig(
    z_dim=4, enc_channels=8, enc_strides=(4, 4),
    renderer=DiTConfig(hidden=32, depth=2, num_heads=2, patch=16,
                       in_channels=1, out_channels=1, cond_dim=4),
    render_n_steps=2)


def test_power_spectrogram_matches_torchaudio(rng):
    """Spectral-convergence metric uses the same Spectrogram(power=2)
    conventions as the reference (audio_ldm_trainer.py:394-405)."""
    audio = rng.standard_normal((2, 2048)).astype(np.float32)
    ours = np.asarray(ev.power_spectrogram(jnp.asarray(audio),
                                           n_fft=512, hop=128))
    want = torch.stft(torch.from_numpy(audio), n_fft=512, hop_length=128,
                      window=torch.hann_window(512), center=True,
                      pad_mode="reflect", return_complex=True).abs() ** 2
    # torch: (B, freq, frames); ours: (B, frames, freq)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), want.numpy(),
                               atol=1e-3)


def test_batch_audio_metrics_values(rng):
    ref = rng.standard_normal((2, 2048)).astype(np.float32)
    m_same = ev.batch_audio_metrics(jnp.asarray(ref), jnp.asarray(ref))
    assert float(m_same["L1_Loss"]) == 0.0
    assert float(m_same["Spectral_Convergence"]) < 1e-6
    assert float(m_same["SNR"]) > 60.0
    noisy = ref + 0.1 * rng.standard_normal(ref.shape).astype(np.float32)
    m = ev.batch_audio_metrics(jnp.asarray(ref), jnp.asarray(noisy))
    assert 15.0 < float(m["SNR"]) < 25.0  # 10*log10(1/0.01)=20
    assert float(m["L1_Loss"]) > 0.0


@pytest.mark.slow
def test_evaluate_audio_ae_and_artifacts(tmp_path, rng):
    model = DiToAudio(TINY)
    data = rng.standard_normal((4, 128, 1)).astype(np.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(data[:1]),
                           jax.random.PRNGKey(1), 0.0,
                           method=DiToAudio.loss)
    metrics = ev.evaluate_audio_ae(
        model, variables, [data[:2], data[2:]], jax.random.PRNGKey(2),
        n_steps=2, save_dir=str(tmp_path), sample_rate=8000)
    for k in ("eval_ae/L1_Loss", "eval_ae/SNR",
              "eval_ae/Spectral_Convergence"):
        assert np.isfinite(metrics[k])
    assert os.path.exists(tmp_path / "cache" / "audio_gen" / "0.wav")
    assert os.path.exists(tmp_path / "cache" / "audio_gt" / "0.wav")

    ev.visualize_audio_ae_random(model, variables, data,
                                 jax.random.PRNGKey(3), str(tmp_path),
                                 step=7, n_samples=2, n_steps=2,
                                 sample_rate=8000)
    dumped = os.listdir(tmp_path / "audio_samples")
    assert any(f.startswith("audio_ae_original_") for f in dumped)
    assert any(f.startswith("audio_ae_recons_") for f in dumped)
    assert any(f.endswith("_spec.png") for f in dumped)


@pytest.mark.slow
def test_train_flowae_runner_dito_then_zdm(tmp_path):
    """End-to-end runner: DiTo stage trains + evals + saves AE params,
    then the ZDM stage trains the prior on the frozen AE and generates
    (reference: run.py experiment flow)."""
    from minimax_speech_tpu.cli import train_flowae
    d1 = tmp_path / "dito"
    train_flowae.main([
        "--model", "dito", "--save_dir", str(d1), "--synthetic",
        "--max_clips", "4", "--crop_len", "128", "--steps", "2",
        "--batch", "2", "--eval_every", "2", "--save_every", "2",
        "--eval_batches", "1", "--eval_n_steps", "2", "--n_vis", "1",
        "--z_dim", "4", "--enc_channels", "8", "--enc_strides", "2,4",
        "--hidden", "32", "--depth", "1", "--heads", "2", "--patch", "16"])
    assert (d1 / "ae_params.npz").exists()
    log = (d1 / "dito_metrics.jsonl").read_text().strip().splitlines()
    assert any("eval_ae/SNR" in line for line in log)

    d2 = tmp_path / "zdm"
    train_flowae.main([
        "--model", "zdm", "--save_dir", str(d2), "--synthetic",
        "--max_clips", "4", "--crop_len", "128", "--steps", "2",
        "--batch", "2", "--eval_every", "2", "--save_every", "0",
        "--eval_batches", "1", "--n_vis", "1",
        "--ae_params", str(d1 / "ae_params.npz"),
        "--z_dim", "4", "--enc_channels", "8", "--enc_strides", "2,4",
        "--hidden", "32", "--depth", "1", "--heads", "2", "--patch", "16"])
    rows = [json.loads(x) for x in
            (d2 / "zdm_metrics.jsonl").read_text().strip().splitlines()]
    assert any("eval_zdm_ema/l1_loss_avg" in r for r in rows)
    assert any(f.startswith("audio_zdm_generated_")
               for f in os.listdir(d2 / "audio_samples"))
