"""flowae eval suites + artifact logging.

Reference: flowae/trainers/audio_ldm_trainer.py:298-558 — the AE eval
(L1 / SNR / spectral convergence over a held-out loader, with wav
sample dumping to `cache/audio_{gen,gt}/`), the ZDM eval (unconditional
generation + L1 vs held-out batches), and the visualize pass
(:560-730: random recon / generated wav dumps + spectrogram figures).

TPU-native shape: all per-batch metrics run inside one jitted function
(recon sampling included — no per-item host loops over the Euler
solve); only wav dumping and the running averages live on the host.
Spectral convergence uses the reference's Spectrogram(n_fft=1024,
hop=256, power=2) convention.
"""
from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.flowae.dito import DiToAudio, dito_decode
from minimax_speech_tpu.flowae.zdm import ZDMNet, zdm_generate
from minimax_speech_tpu.ops import mel as mel_ops


def power_spectrogram(audio: jnp.ndarray, n_fft: int = 1024,
                      hop: int = 256) -> jnp.ndarray:
    """torchaudio.transforms.Spectrogram(power=2) conventions: centered
    reflect pad, hann window. audio: (B, T) -> (B, frames, n_fft//2+1)."""
    p = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (p, p)), mode="reflect")
    frames = jax.vmap(lambda s: mel_ops.frame_signal(s, n_fft, hop))(x)
    win = mel_ops.hann_window(n_fft, audio.dtype)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def batch_audio_metrics(ref: jnp.ndarray, rec: jnp.ndarray) -> dict:
    """L1 / SNR / spectral convergence for one batch (reference:
    audio_ldm_trainer.py:385-410). ref/rec: (B, T) mono waveforms."""
    l1 = jnp.mean(jnp.abs(rec - ref))
    sig = jnp.mean(ref ** 2)
    noise = jnp.mean((rec - ref) ** 2)
    snr = 10.0 * jnp.log10(sig / (noise + 1e-8))
    s_ref = power_spectrogram(ref)
    s_rec = power_spectrogram(rec)
    sc = (jnp.linalg.norm((s_ref - s_rec).reshape(-1))
          / (jnp.linalg.norm(s_ref.reshape(-1)) + 1e-8))
    return {"L1_Loss": l1, "SNR": snr, "Spectral_Convergence": sc}


class Averager:
    """Running weighted mean (reference: utils.Averager)."""

    def __init__(self):
        self.v, self.n = 0.0, 0

    def add(self, v: float, n: int = 1):
        self.v = (self.v * self.n + float(v) * n) / (self.n + n)
        self.n += n

    def item(self) -> float:
        return self.v


def _dump_wavs(save_dir: str, sub: str, start_idx: int,
               audio: np.ndarray, sr: int, max_samples: int) -> int:
    """Write up to 5 per batch into save_dir/cache/<sub>/ (reference:
    audio_ldm_trainer.py:410-445). Returns samples written."""
    from minimax_speech_tpu.cli.synthesize import write_wav
    d = os.path.join(save_dir, "cache", sub)
    os.makedirs(d, exist_ok=True)
    wrote = 0
    for i in range(min(audio.shape[0], 5)):
        idx = start_idx + i
        if idx >= max_samples:
            break
        write_wav(os.path.join(d, f"{idx}.wav"), audio[i], sr)
        wrote += 1
    return wrote


def evaluate_audio_ae(model: DiToAudio, variables,
                      batches: Iterable[np.ndarray], key,
                      n_steps: Optional[int] = None,
                      save_dir: Optional[str] = None,
                      sample_rate: int = 24000,
                      max_samples: int = 1000) -> dict:
    """AE eval: encode->render each held-out batch, average L1/SNR/
    spectral convergence, optionally dump gen/gt wavs (reference:
    evaluate_audio_ae, audio_ldm_trainer.py:353-466). Batches are
    (B, T, 1) float arrays; all batches must share one shape (one
    compiled program)."""
    @jax.jit
    def run(audio, k):
        _, mu, _ = model.apply(variables, audio, method=DiToAudio.encode)
        rec = dito_decode(model, variables, mu, audio.shape[1], k, n_steps)
        return rec, batch_audio_metrics(audio[..., 0], rec[..., 0])

    avgs = {k: Averager() for k in
            ("L1_Loss", "SNR", "Spectral_Convergence")}
    dumped = 0
    for audio in batches:
        key, sub = jax.random.split(key)
        audio = jnp.asarray(audio)
        rec, metrics = run(audio, sub)
        for k, v in metrics.items():
            avgs[k].add(float(v), n=audio.shape[0])
        if save_dir is not None and dumped < max_samples:
            _dump_wavs(save_dir, "audio_gt", dumped,
                       np.asarray(audio[..., 0]), sample_rate, max_samples)
            dumped += _dump_wavs(save_dir, "audio_gen", dumped,
                                 np.asarray(rec[..., 0]), sample_rate,
                                 max_samples)
    return {f"eval_ae/{k}": a.item() for k, a in avgs.items()}


def evaluate_audio_zdm(zdm: ZDMNet, zdm_variables, ae: DiToAudio,
                       ae_variables, batches: Iterable[np.ndarray], key,
                       save_dir: Optional[str] = None,
                       sample_rate: int = 24000,
                       max_samples: int = 1000, ema: bool = True) -> dict:
    """ZDM eval: unconditionally generate a batch-size-matched sample
    per held-out batch; average L1 vs the batch (a weak distributional
    proxy, kept for parity — reference: evaluate_audio_zdm,
    audio_ldm_trainer.py:468-558) and dump samples."""
    z_stride = int(np.prod(ae.cfg.enc_strides))

    @jax.jit
    def run(audio, k):
        gen = zdm_generate(zdm, zdm_variables, ae, ae_variables,
                           audio.shape[0], audio.shape[1] // z_stride,
                           audio.shape[1], k)
        return gen, jnp.mean(jnp.abs(gen - audio))

    l1 = Averager()
    dumped = 0
    for audio in batches:
        key, sub = jax.random.split(key)
        audio = jnp.asarray(audio)
        gen, v = run(audio, sub)
        l1.add(float(v), n=audio.shape[0])
        if save_dir is not None and dumped < max_samples:
            _dump_wavs(save_dir, "audio_gt", dumped,
                       np.asarray(audio[..., 0]), sample_rate, max_samples)
            dumped += _dump_wavs(save_dir, "audio_gen", dumped,
                                 np.asarray(gen[..., 0]), sample_rate,
                                 max_samples)
    prefix = "eval_zdm_ema" if ema else "eval_zdm"
    return {f"{prefix}/l1_loss_avg": l1.item()}


def save_audio_sample(save_dir: str, name: str, step: int,
                      audio: np.ndarray, sample_rate: int = 24000,
                      spectrogram: bool = True) -> str:
    """Artifact logging: wav + spectrogram figure (reference:
    save_audio_sample + _log_spectrogram, audio_ldm_trainer.py:633-730).
    audio: (T,) float. Returns the wav path."""
    from minimax_speech_tpu.cli.synthesize import write_wav
    d = os.path.join(save_dir, "audio_samples")
    os.makedirs(d, exist_ok=True)
    peak = np.abs(audio).max()
    if peak > 1.0:
        audio = audio / peak
    path = os.path.join(d, f"{name}_step_{step}.wav")
    write_wav(path, audio, sample_rate)
    if spectrogram:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            spec = np.asarray(power_spectrogram(
                jnp.asarray(audio)[None], n_fft=2048, hop=512)[0])
            spec_db = 10.0 * np.log10(spec + 1e-8)
            fig, ax = plt.subplots(figsize=(10, 4))
            im = ax.imshow(spec_db.T, aspect="auto", origin="lower",
                           cmap="viridis",
                           extent=[0, len(audio) / sample_rate,
                                   0, sample_rate / 2])
            ax.set_xlabel("Time (s)")
            ax.set_ylabel("Frequency (Hz)")
            ax.set_title(f"{name} - Spectrogram")
            fig.colorbar(im, ax=ax, label="dB")
            fig.savefig(path.replace(".wav", "_spec.png"),
                        bbox_inches="tight")
            plt.close(fig)
        except Exception:  # matplotlib is an optional artifact channel
            pass
    return path


def visualize_audio_ae_random(model: DiToAudio, variables,
                              dataset: np.ndarray, key, save_dir: str,
                              step: int, n_samples: int = 8,
                              n_steps: Optional[int] = None,
                              sample_rate: int = 24000):
    """Dump random original/reconstruction pairs (reference:
    visualize_audio_ae_random, audio_ldm_trainer.py:559-596).
    dataset: (N, T, 1) array of eval clips."""
    idx = np.asarray(jax.random.permutation(key, dataset.shape[0]))
    idx = idx[:n_samples]
    batch = jnp.asarray(dataset[idx])
    key, sub = jax.random.split(key)
    _, mu, _ = model.apply(variables, batch, method=DiToAudio.encode)
    rec = dito_decode(model, variables, mu, batch.shape[1], sub, n_steps)
    for j, i in enumerate(idx):
        save_audio_sample(save_dir, f"audio_ae_original_{int(i)}", step,
                          np.asarray(batch[j, :, 0]), sample_rate)
        save_audio_sample(save_dir, f"audio_ae_recons_{int(i)}", step,
                          np.asarray(rec[j, :, 0]), sample_rate)


def visualize_audio_zdm_random(zdm: ZDMNet, zdm_variables, ae: DiToAudio,
                               ae_variables, out_len: int, key,
                               save_dir: str, step: int,
                               n_samples: int = 8,
                               sample_rate: int = 24000):
    """Dump unconditional generations (reference:
    visualize_audio_zdm_random, audio_ldm_trainer.py:597-631)."""
    z_stride = int(np.prod(ae.cfg.enc_strides))
    gen = zdm_generate(zdm, zdm_variables, ae, ae_variables, n_samples,
                       out_len // z_stride, out_len, key)
    for i in range(n_samples):
        save_audio_sample(save_dir, f"audio_zdm_generated_{i}", step,
                          np.asarray(gen[i, :, 0]), sample_rate)
