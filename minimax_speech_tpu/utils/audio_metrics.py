"""Perceptual/distance audio metrics.

Reference: dac-vae/audiotools/metrics/quality.py (stoi via the pystoi
package, pesq/visqol via external binaries) and metrics/distance.py
(L1Loss, SISDRLoss). PESQ/ViSQOL wrap licensed/external binaries and
are not portable; STOI is re-implemented here in pure numpy from the
published algorithm (Taal et al., 2011 — the same one pystoi
implements), SI-SDR and spectral distances in numpy/JAX.
"""
from __future__ import annotations

import numpy as np

# STOI constants (Taal et al. 2011; identical to pystoi defaults)
FS = 10000          # internal sample rate
N_FRAME = 256       # frame length (25.6 ms)
NFFT = 512
NUMBAND = 15        # one-third octave bands
MINFREQ = 150.0
N = 30              # analysis segment length in frames (384 ms)
BETA = -15.0        # lower SDR clip (dB)
DYN_RANGE = 40.0    # silent-frame removal range (dB)


def _resample(x: np.ndarray, sr: int, new_sr: int) -> np.ndarray:
    if sr == new_sr:
        return x
    n = int(round(len(x) * new_sr / sr))
    # polyphase kaiser-sinc (shared with AudioSignal.resample)
    from minimax_speech_tpu.utils.audio_signal import resample as rs
    import jax.numpy as jnp
    return np.asarray(rs(jnp.asarray(x)[None, None, :], sr, new_sr)
                      )[0, 0, :n]


def _thirdoct(fs: int, nfft: int, num_bands: int, min_freq: float):
    """One-third octave band matrix (J, F)."""
    f = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num_bands, dtype=np.float64)
    cf = 2.0 ** (k / 3.0) * min_freq
    lo = cf * 2 ** (-1.0 / 6.0)
    hi = cf * 2 ** (1.0 / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        li = np.argmin((f - lo[i]) ** 2)
        hi_i = np.argmin((f - hi[i]) ** 2)
        obm[i, li:hi_i] = 1.0
    return obm


def _frames(x: np.ndarray, flen: int, hop: int) -> np.ndarray:
    n = (len(x) - flen) // hop + 1
    if n <= 0:
        return np.zeros((0, flen))
    idx = np.arange(flen)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def _remove_silent_frames(x, y, dyn_range, flen, hop):
    w = np.hanning(flen + 2)[1:-1]
    xf = _frames(x, flen, hop) * w
    yf = _frames(y, flen, hop) * w
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    mask = energies > (energies.max() - dyn_range)
    xf, yf = xf[mask], yf[mask]

    def overlap_add(frames):
        out = np.zeros((len(frames) - 1) * hop + flen if len(frames)
                       else 0)
        for i, fr in enumerate(frames):
            out[i * hop: i * hop + flen] += fr
        return out

    return overlap_add(xf), overlap_add(yf)


def stoi(reference: np.ndarray, estimate: np.ndarray, sr: int) -> float:
    """Short-Time Objective Intelligibility in [~0, 1]
    (reference metric surface: audiotools/metrics/quality.py stoi)."""
    x = _resample(np.asarray(reference, np.float64), sr, FS)
    y = _resample(np.asarray(estimate, np.float64), sr, FS)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    x, y = _remove_silent_frames(x, y, DYN_RANGE, N_FRAME, N_FRAME // 2)
    if len(x) < N_FRAME * 2:
        return float("nan")

    w = np.hanning(N_FRAME + 2)[1:-1]
    xf = _frames(x, N_FRAME, N_FRAME // 2) * w
    yf = _frames(y, N_FRAME, N_FRAME // 2) * w
    X = np.abs(np.fft.rfft(xf, NFFT, axis=1)) ** 2   # (T, F)
    Y = np.abs(np.fft.rfft(yf, NFFT, axis=1)) ** 2
    obm = _thirdoct(FS, NFFT, NUMBAND, MINFREQ)
    Xb = np.sqrt(X @ obm.T)                           # (T, J)
    Yb = np.sqrt(Y @ obm.T)
    if Xb.shape[0] < N:
        return float("nan")

    d_sum, count = 0.0, 0
    for m in range(N, Xb.shape[0] + 1):
        Xseg = Xb[m - N: m].T                         # (J, N)
        Yseg = Yb[m - N: m].T
        alpha = np.sqrt(np.sum(Xseg ** 2, axis=1, keepdims=True)
                        / (np.sum(Yseg ** 2, axis=1, keepdims=True)
                           + 1e-12))
        Yprim = Yseg * alpha
        clip = Xseg * (1 + 10 ** (-BETA / 20.0))
        Yprim = np.minimum(Yprim, clip)
        xn = Xseg - Xseg.mean(axis=1, keepdims=True)
        yn = Yprim - Yprim.mean(axis=1, keepdims=True)
        corr = np.sum(xn * yn, axis=1) / (
            np.linalg.norm(xn, axis=1) * np.linalg.norm(yn, axis=1)
            + 1e-12)
        d_sum += corr.sum()
        count += NUMBAND
    return float(d_sum / max(count, 1))


def si_sdr(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Scale-invariant SDR in dB (reference: metrics/distance.py
    SISDRLoss, sign-flipped to a score)."""
    x = np.asarray(reference, np.float64)
    y = np.asarray(estimate, np.float64)
    n = min(len(x), len(y))
    x, y = x[:n] - x[:n].mean(), y[:n] - y[:n].mean()
    s = (np.dot(y, x) / (np.dot(x, x) + 1e-12)) * x
    e = y - s
    return float(10 * np.log10((np.dot(s, s) + 1e-12)
                               / (np.dot(e, e) + 1e-12)))


def l1_distance(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Waveform L1 (reference: metrics/distance.py L1Loss)."""
    n = min(len(reference), len(estimate))
    return float(np.mean(np.abs(np.asarray(reference[:n])
                                - np.asarray(estimate[:n]))))


def mel_distance(reference: np.ndarray, estimate: np.ndarray,
                 sr: int = 24000) -> float:
    """Multi-scale log-mel L1 (the MelSpectrogramLoss eval surface,
    utils/audio_losses.mel_spectrogram_loss)."""
    import jax.numpy as jnp

    from minimax_speech_tpu.utils import audio_losses
    n = min(len(reference), len(estimate))
    x = jnp.asarray(np.asarray(reference[:n], np.float32))[None]
    y = jnp.asarray(np.asarray(estimate[:n], np.float32))[None]
    return float(audio_losses.mel_spectrogram_loss(x, y, sr))


def pesq(reference: np.ndarray, estimate: np.ndarray, sr: int,
         mode: str = "wb") -> float:
    """ITU-T P.862 PESQ via the external `pesq` package when installed
    (the reference gates identically on an import,
    reference: audiotools/metrics/quality.py:64-102). The spec's
    licensed filterbanks cannot be re-derived here; use stoi()/si_sdr()
    for dependency-free quality numbers."""
    try:
        from pesq import pesq as pesq_fn
    except ImportError as e:
        raise ImportError(
            "pesq() needs the external `pesq` package (pip install "
            "pesq); offline alternatives: stoi(), si_sdr(), "
            "mel_distance()") from e
    tgt = 16000 if mode == "wb" else 8000
    ref = _resample(np.asarray(reference, np.float32), sr, tgt)
    est = _resample(np.asarray(estimate, np.float32), sr, tgt)
    return float(pesq_fn(tgt, ref, est, mode))


def visqol(reference: np.ndarray, estimate: np.ndarray, sr: int,
           mode: str = "audio") -> float:
    """ViSQOL via the external google binary/package when installed
    (reference: audiotools/metrics/quality.py:105-155)."""
    try:
        from visqol import visqol_lib_py  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "visqol() needs the external `visqol` package; offline "
            "alternatives: stoi(), si_sdr(), mel_distance()") from e
    from visqol import visqol_lib_py as v
    from visqol.pb2 import visqol_config_pb2
    cfg = visqol_config_pb2.VisqolConfig()
    tgt = 48000 if mode == "audio" else 16000
    cfg.audio.sample_rate = tgt
    cfg.options.use_speech_scoring = mode != "audio"
    cfg.options.svr_model_path = v.FilePath.currentModelPath()
    api = v.VisqolApi()
    api.Create(cfg)
    ref = _resample(np.asarray(reference, np.float64), sr, tgt)
    est = _resample(np.asarray(estimate, np.float64), sr, tgt)
    return float(api.Measure(ref, est).moslqo)
