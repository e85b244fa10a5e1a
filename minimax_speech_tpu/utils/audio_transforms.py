"""audiotools data transforms slice (functional, key-driven).

Reference: dac-vae/audiotools/data/transforms.py — the transforms the
reference trainer wires (train.py:39-49 build_transform): Identity,
Compose(prob), VolumeNorm, RescaleAudio, ShiftPhase. The reference's
two-phase instantiate()/call protocol (random params drawn in the
dataloader worker, applied on device) becomes a single functional
`transform(key, signal)` here — JAX PRNG keys make the draw
reproducible without carrying state dicts around.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.utils.audio_signal import AudioSignal


class BaseTransform:
    """prob-gated per-item transform (reference: transforms.py:44-140)."""

    def __init__(self, name: str = None, prob: float = 1.0):
        self.name = name or type(self).__name__
        self.prob = prob

    def _transform(self, key, signal: AudioSignal) -> AudioSignal:
        return signal

    def __call__(self, key, signal: AudioSignal) -> AudioSignal:
        k_gate, k_tfm = jax.random.split(key)
        if self.prob >= 1.0:
            return self._transform(k_tfm, signal)
        if self.prob <= 0.0:
            return signal
        apply = jax.random.bernoulli(k_gate, self.prob,
                                     (signal.batch_size,))
        out = self._transform(k_tfm, signal.clone())
        mixed = jnp.where(np.asarray(apply)[:, None, None],
                          out.audio_data, signal.audio_data)
        res = AudioSignal(mixed, signal.sample_rate, signal.stft_params)
        return res


class Identity(BaseTransform):
    """Returns the original signal (reference: transforms.py:268-271)."""
    pass


class Compose(BaseTransform):
    """Apply transforms in sequence (reference: transforms.py:289-330)."""

    def __init__(self, *transforms: BaseTransform, name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        flat = []
        for t in transforms:
            flat.extend(t if isinstance(t, (list, tuple)) else [t])
        self.transforms = flat

    def _transform(self, key, signal):
        for t in self.transforms:
            key, k = jax.random.split(key)
            signal = t(k, signal)
        return signal


class VolumeNorm(BaseTransform):
    """Normalize loudness to a dB draw (reference: transforms.py:973-1010;
    db=("const", x) fixed, ("uniform", lo, hi) sampled per item)."""

    def __init__(self, db: Tuple = ("const", -24), name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _transform(self, key, signal):
        if self.db[0] in ("const", "lufs"):
            return signal.normalize(float(self.db[1]))
        lo, hi = float(self.db[1]), float(self.db[2])
        draws = jax.random.uniform(key, (signal.batch_size,),
                                   minval=lo, maxval=hi)
        gain_db = np.asarray(draws) - signal.loudness()
        gain = jnp.asarray(np.exp(gain_db * np.log(10.0) / 20.0),
                           jnp.float32)
        return AudioSignal(signal.audio_data * gain[:, None, None],
                           signal.sample_rate, signal.stft_params)


class VolumeChange(BaseTransform):
    """Uniform gain in dB (reference: transforms.py VolumeChange)."""

    def __init__(self, db: Tuple = ("uniform", -12.0, 0.0),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _transform(self, key, signal):
        lo, hi = float(self.db[1]), float(self.db[2])
        draws = jax.random.uniform(key, (signal.batch_size,),
                                   minval=lo, maxval=hi)
        gain = jnp.exp(draws * jnp.log(10.0) / 20.0)
        return AudioSignal(signal.audio_data * gain[:, None, None],
                           signal.sample_rate, signal.stft_params)


class RescaleAudio(BaseTransform):
    """Clamp-by-rescale to |x| <= val (reference: transforms.py:1173-1207)."""

    def __init__(self, val: float = 1.0, name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.val = val

    def _transform(self, key, signal):
        return signal.ensure_max_of_audio(self.val)


class ShiftPhase(BaseTransform):
    """Uniform constant phase shift in the STFT domain (reference:
    transforms.py ShiftPhase: stft -> phase += shift -> istft)."""

    def __init__(self, shift: Tuple = ("uniform", -np.pi, np.pi),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.shift = shift

    # jitted: eager complex arithmetic is UNIMPLEMENTED on the axon TPU
    _rotate = staticmethod(jax.jit(
        lambda spec, draws: spec * jnp.exp(1j * draws)[:, None, None, None]))

    def _transform(self, key, signal):
        lo, hi = float(self.shift[1]), float(self.shift[2])
        draws = jax.random.uniform(key, (signal.batch_size,),
                                   minval=lo, maxval=hi)
        signal = signal.clone().stft()
        signal.stft_data = self._rotate(signal.stft_data,
                                        draws.astype(jnp.float32))
        return signal.istft()


def _sample_dist(key, dist: Tuple, batch: int = 1):
    """('const', v) | ('uniform', lo, hi) | ('choice', [..]) — the
    reference's util.sample_from_dist. Returns (B,) numpy draws
    ('choice'/'const' return python scalars for shape-static params)."""
    if dist[0] == "const":
        return dist[1]
    if dist[0] == "choice":
        i = int(jax.random.randint(key, (), 0, len(dist[1])))
        return dist[1][i]
    lo, hi = float(dist[1]), float(dist[2])
    return np.asarray(jax.random.uniform(key, (batch,),
                                         minval=lo, maxval=hi))


class ClippingDistortion(BaseTransform):
    """Percentile clipping (reference: transforms.py:531-561)."""

    def __init__(self, perc: Tuple = ("uniform", 0.0, 0.1),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.perc = perc

    def _transform(self, key, signal):
        perc = _sample_dist(key, self.perc, signal.batch_size)
        return signal.clip_distortion(perc)


class Equalizer(BaseTransform):
    """Random mel-band EQ cut (reference: transforms.py:564-601)."""

    def __init__(self, eq_amount: Tuple = ("const", 1.0),
                 n_bands: int = 6, name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.eq_amount = eq_amount
        self.n_bands = n_bands

    def _transform(self, key, signal):
        k_a, k_e = jax.random.split(key)
        amount = _sample_dist(k_a, self.eq_amount, signal.batch_size)
        eq = -np.asarray(amount).reshape(-1, 1) * np.asarray(
            jax.random.uniform(k_e, (signal.batch_size, self.n_bands)))
        return signal.equalizer(eq)


class Quantization(BaseTransform):
    """Uniform quantization (reference: transforms.py:603-633)."""

    def __init__(self, channels: Tuple = ("choice",
                                          [8, 32, 128, 256, 1024]),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.channels = channels

    def _transform(self, key, signal):
        return signal.quantization(_sample_dist(key, self.channels))


class MuLawQuantization(BaseTransform):
    """mu-law quantization (reference: transforms.py:636-668)."""

    def __init__(self, channels: Tuple = ("choice",
                                          [8, 32, 128, 256, 1024]),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.channels = channels

    def _transform(self, key, signal):
        return signal.mulaw_quantization(_sample_dist(key, self.channels))


class LowPass(BaseTransform):
    """Windowed-sinc low-pass (reference: transforms.py:1095-1132)."""

    def __init__(self, cutoff: Tuple = ("choice", [4000, 8000, 16000]),
                 zeros: int = 51, name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.cutoff = cutoff
        self.zeros = zeros

    def _transform(self, key, signal):
        return signal.low_pass(_sample_dist(key, self.cutoff),
                               zeros=self.zeros)


class HighPass(BaseTransform):
    """Complementary high-pass (reference: transforms.py:1134-1171)."""

    def __init__(self, cutoff: Tuple = ("choice",
                                        [50, 100, 250, 500, 1000]),
                 zeros: int = 51, name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.cutoff = cutoff
        self.zeros = zeros

    def _transform(self, key, signal):
        return signal.high_pass(_sample_dist(key, self.cutoff),
                                zeros=self.zeros)


class Smoothing(BaseTransform):
    """Convolve with a smoothing window, rescaled to the input's peak
    (reference: transforms.py:1405-1453)."""

    def __init__(self, window_type: Tuple = ("const", "average"),
                 window_length: Tuple = ("choice",
                                         [8, 16, 32, 64, 128, 256, 512]),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.window_type = window_type
        self.window_length = window_length

    def _transform(self, key, signal):
        k_t, k_l = jax.random.split(key)
        wtype = _sample_dist(k_t, self.window_type)
        wlen = int(_sample_dist(k_l, self.window_length))
        win = (np.hanning(wlen) if wtype == "hann"
               else np.ones(wlen, np.float64))
        win = (win / win.sum()).astype(np.float32)
        w_sig = AudioSignal(win[None, None, :], signal.sample_rate)
        sscale = jnp.maximum(jnp.max(jnp.abs(signal.audio_data), -1,
                                     keepdims=True), 1e-12)
        out = signal.convolve(w_sig)
        oscale = jnp.maximum(jnp.max(jnp.abs(out.audio_data), -1,
                                     keepdims=True), 1e-12)
        return AudioSignal(out.audio_data * (sscale / oscale),
                           signal.sample_rate, signal.stft_params)


class BackgroundNoise(BaseTransform):
    """Mix a random noise clip at a drawn SNR, with a random 3-band EQ
    on the noise (reference: transforms.py:707-800). `sources` is a
    bank of noise clips (N, T) float32 (the reference loads from CSV
    path lists; pass loaded arrays here) — default is seeded pink-ish
    noise so the transform works with no external data."""

    def __init__(self, snr: Tuple = ("uniform", 10.0, 30.0),
                 sources: np.ndarray = None, eq_amount: Tuple = ("const",
                                                                 1.0),
                 n_bands: int = 3, name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.snr = snr
        self.eq_amount = eq_amount
        self.n_bands = n_bands
        self.sources = sources

    def _noise(self, key, signal):
        if self.sources is not None:
            i = int(jax.random.randint(key, (), 0, len(self.sources)))
            clip = np.asarray(self.sources[i], np.float32)
            reps = int(np.ceil(signal.signal_length / len(clip)))
            clip = np.tile(clip, reps)[: signal.signal_length]
            return jnp.broadcast_to(
                jnp.asarray(clip)[None, None, :],
                (signal.batch_size, 1, signal.signal_length))
        # pink-ish noise: white noise shaped by 1/sqrt(f)
        white = jax.random.normal(
            key, (signal.batch_size, 1, signal.signal_length))
        spec = jnp.fft.rfft(white)
        f = np.maximum(np.fft.rfftfreq(signal.signal_length), 1e-3)
        return jnp.fft.irfft(spec / jnp.asarray(np.sqrt(f)),
                             n=signal.signal_length).astype(jnp.float32)

    def _transform(self, key, signal):
        k_n, k_s, k_a, k_e = jax.random.split(key, 4)
        noise = AudioSignal(self._noise(k_n, signal), signal.sample_rate)
        snr = _sample_dist(k_s, self.snr, signal.batch_size)
        amount = _sample_dist(k_a, self.eq_amount, signal.batch_size)
        eq = -np.asarray(amount).reshape(-1, 1) * np.asarray(
            jax.random.uniform(k_e, (signal.batch_size, self.n_bands)))
        return signal.clone().mix(noise, snr, eq)


class RoomImpulseResponse(BaseTransform):
    """Convolve with a room impulse response whose direct-to-reverberant
    ratio is altered to a drawn target (reference: transforms.py:857-940
    + effects.py apply_ir/alter_drr :125-180,560-640). `sources` is a
    bank of IRs (N, T) float32; default is a seeded synthetic
    exponential-decay IR bank."""

    def __init__(self, drr: Tuple = ("uniform", 0.0, 30.0),
                 sources: np.ndarray = None, eq_amount: Tuple = ("const",
                                                                 1.0),
                 n_bands: int = 6, ir_seconds: float = 0.3,
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.drr = drr
        self.eq_amount = eq_amount
        self.n_bands = n_bands
        self.sources = sources
        self.ir_seconds = ir_seconds

    def _ir(self, key, sr: int) -> np.ndarray:
        if self.sources is not None:
            i = int(jax.random.randint(key, (), 0, len(self.sources)))
            return np.asarray(self.sources[i], np.float32)
        t = int(self.ir_seconds * sr)
        rng = np.random.default_rng(
            int(jax.random.randint(key, (), 0, 2 ** 31 - 1)))
        ir = rng.standard_normal(t) * np.exp(
            -np.arange(t) / (0.05 * sr))
        ir[0] = 1.0  # direct path
        return ir.astype(np.float32)

    @staticmethod
    def _alter_drr(ir: np.ndarray, sr: int, target_drr: float
                   ) -> np.ndarray:
        """Scale the late field to hit the target DRR
        (effects.py solve_alpha/alter_drr, Bryan 2020 eqs. 1-5)."""
        td = int(np.argmax(np.abs(ir)))
        t0 = int(sr * 0.0025)
        idx = np.arange(len(ir))
        early_m = (idx >= td - t0) & (idx <= td + t0)
        early = np.where(early_m, ir, 0.0)
        late = np.where(~early_m, ir, 0.0)
        wd = np.zeros_like(ir)
        span = np.nonzero(early_m)[0]
        wd[span] = np.hanning(len(span))
        e_sq, l_sq = early ** 2, late ** 2
        a = (wd ** 2 * e_sq).sum()
        b = (2 * (1 - wd) * wd * e_sq).sum()
        c = (((1 - wd) ** 2) * e_sq).sum() \
            - 10 ** (target_drr / 10) * l_sq.sum()
        disc = max(b * b - 4 * a * c, 0.0)
        alpha = max((-b - np.sqrt(disc)) / (2 * a + 1e-12),
                    (-b + np.sqrt(disc)) / (2 * a + 1e-12))
        peak_l = np.abs(late).max()
        peak_e = max(np.abs(early).max(), 1e-12)
        alpha = max(alpha, peak_l / peak_e)
        out = wd * alpha * early + (1 - wd) * early + late
        return out.astype(np.float32)

    def _transform(self, key, signal):
        k_i, k_d, k_a, k_e = jax.random.split(key, 4)
        drr = float(np.mean(_sample_dist(k_d, self.drr, 1)))
        ir = self._alter_drr(self._ir(k_i, signal.sample_rate),
                             signal.sample_rate, drr)
        amount = _sample_dist(k_a, self.eq_amount, signal.batch_size)
        eq = -np.asarray(amount).reshape(-1, 1) * np.asarray(
            jax.random.uniform(k_e, (signal.batch_size, self.n_bands)))
        ir_sig = AudioSignal(ir[None, None, :],
                             signal.sample_rate).equalizer(eq[:1])
        # preserve the dry peak (apply_ir does, effects.py:160-180)
        peak = jnp.max(jnp.abs(signal.audio_data), -1, keepdims=True)
        out = signal.convolve(ir_sig)
        opeak = jnp.maximum(jnp.max(jnp.abs(out.audio_data), -1,
                                    keepdims=True), 1e-12)
        return AudioSignal(out.audio_data * (peak / opeak),
                           signal.sample_rate, signal.stft_params)


class SpectralTransform(BaseTransform):
    """Base for STFT-domain transforms: stft before, istft after
    (reference: transforms.py SpectralTransform)."""

    def _spectral(self, key, signal: AudioSignal) -> AudioSignal:
        return signal

    def _transform(self, key, signal):
        sig = signal.clone()
        sig.stft_data = None
        sig.stft()
        return self._spectral(key, sig).istft()


class Choose(Compose):
    """Apply ONE of the transforms, chosen per item with optional
    weights (reference: transforms.py Choose)."""

    def __init__(self, *transforms: BaseTransform, weights=None,
                 name: str = None, prob: float = 1.0):
        super().__init__(*transforms, name=name, prob=prob)
        n = len(self.transforms)
        w = np.full(n, 1.0 / n) if weights is None else np.asarray(
            weights, np.float64)
        self.weights = w / w.sum()

    def _transform(self, key, signal):
        k_c, *keys = jax.random.split(key, len(self.transforms) + 1)
        idx = np.asarray(jax.random.choice(
            k_c, len(self.transforms), (signal.batch_size,),
            p=jnp.asarray(self.weights)))
        # run each CHOSEN transform once on just its items (host-side
        # gather/scatter) instead of every transform on the full batch
        out = np.asarray(signal.audio_data).copy()
        for t_i, (t, k) in enumerate(zip(self.transforms, keys)):
            rows = np.nonzero(idx == t_i)[0]
            if rows.size == 0:
                continue
            sub = AudioSignal(out[rows], signal.sample_rate,
                              signal.stft_params)
            out[rows] = np.asarray(t(k, sub).audio_data)
        return AudioSignal(out, signal.sample_rate, signal.stft_params)


class Repeat(Compose):
    """Apply one transform n_repeat times (reference: Repeat)."""

    def __init__(self, transform: BaseTransform, n_repeat: int = 1,
                 name: str = None, prob: float = 1.0):
        import copy
        super().__init__(*[copy.copy(transform) for _ in range(n_repeat)],
                         name=name, prob=prob)
        self.n_repeat = n_repeat


class RepeatUpTo(Choose):
    """Repeat a transform a random 1..max_repeat-1 times
    (reference: RepeatUpTo)."""

    def __init__(self, transform: BaseTransform, max_repeat: int = 5,
                 weights=None, name: str = None, prob: float = 1.0):
        reps = [Repeat(transform, n_repeat=n, name=f"repeat_{n}")
                for n in range(1, max_repeat)]
        super().__init__(*reps, weights=weights, name=name, prob=prob)
        self.max_repeat = max_repeat


class NoiseFloor(BaseTransform):
    """Add a gaussian noise floor at a target LUFS
    (reference: transforms.py NoiseFloor)."""

    def __init__(self, db: Tuple = ("const", -50.0), name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _transform(self, key, signal):
        k_d, k_n = jax.random.split(key)
        db = np.broadcast_to(_sample_dist(k_d, self.db,
                                          signal.batch_size),
                             (signal.batch_size,))
        nz = AudioSignal(jax.random.normal(k_n, signal.audio_data.shape),
                         signal.sample_rate).normalize_per_item(db)
        return AudioSignal(signal.audio_data + nz.audio_data,
                           signal.sample_rate, signal.stft_params)


class CrossTalk(BaseTransform):
    """Mix a second speaker at a drawn SNR, then restore the original
    loudness (reference: transforms.py CrossTalk). `sources` is a bank
    of speech clips (N, T); default is seeded speech-shaped noise."""

    def __init__(self, snr: Tuple = ("uniform", 0.0, 10.0),
                 sources: np.ndarray = None, name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.snr = snr
        self.sources = sources

    def _talker(self, key, signal):
        if self.sources is not None:
            i = int(jax.random.randint(key, (), 0, len(self.sources)))
            clip = np.asarray(self.sources[i], np.float32)
            reps = int(np.ceil(signal.signal_length / len(clip)))
            clip = np.tile(clip, reps)[: signal.signal_length]
            return jnp.broadcast_to(
                jnp.asarray(clip)[None, None, :],
                (signal.batch_size, 1, signal.signal_length))
        # speech-shaped: white noise through a gentle low-pass tilt
        white = jax.random.normal(
            key, (signal.batch_size, 1, signal.signal_length))
        spec = jnp.fft.rfft(white)
        f = np.fft.rfftfreq(signal.signal_length,
                            1.0 / signal.sample_rate)
        tilt = 1.0 / np.sqrt(1.0 + (f / 500.0) ** 2)
        return jnp.fft.irfft(spec * jnp.asarray(tilt),
                             n=signal.signal_length).astype(jnp.float32)

    def _transform(self, key, signal):
        k_t, k_s = jax.random.split(key)
        snr = _sample_dist(k_s, self.snr, signal.batch_size)
        talker = AudioSignal(self._talker(k_t, signal),
                             signal.sample_rate)
        loud = signal.loudness()
        mix = signal.clone().mix(talker, snr)
        return mix.normalize_per_item(loud)


class GlobalVolumeNorm(BaseTransform):
    """VolumeNorm against the WHOLE source file's loudness, carried in
    signal.metadata['loudness'] (reference: GlobalVolumeNorm)."""

    def __init__(self, db: Tuple = ("const", -24), name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _transform(self, key, signal):
        src = signal.metadata.get("loudness")
        if src is None or not np.isfinite(float(src)):
            return signal
        db = float(np.mean(_sample_dist(key, self.db, 1)))
        return signal.volume_change(db - float(src))


class Silence(BaseTransform):
    """Zero out the signal (reference: Silence; default prob 0.1)."""

    def __init__(self, name: str = None, prob: float = 0.1):
        super().__init__(name=name, prob=prob)

    def _transform(self, key, signal):
        return AudioSignal(jnp.zeros_like(signal.audio_data),
                           signal.sample_rate, signal.stft_params)


class InvertPhase(ShiftPhase):
    """Constant pi phase shift (reference: InvertPhase)."""

    def __init__(self, name: str = None, prob: float = 1.0):
        super().__init__(shift=("const", np.pi, np.pi), name=name,
                         prob=prob)

    def _transform(self, key, signal):
        return AudioSignal(-signal.audio_data, signal.sample_rate,
                           signal.stft_params)


class CorruptPhase(SpectralTransform):
    """Add gaussian noise to the STFT phase at a drawn scale
    (reference: CorruptPhase + dsp.corrupt_phase)."""

    def __init__(self, scale: Tuple = ("uniform", 0, np.pi),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.scale = scale

    def _spectral(self, key, signal):
        k_s, k_n = jax.random.split(key)
        scale = float(np.mean(_sample_dist(k_s, self.scale, 1)))
        noise = scale * jax.random.normal(k_n, signal.phase().shape)
        return signal.shift_phase(noise)


class FrequencyMask(SpectralTransform):
    """SpecAug frequency-band mask (reference: FrequencyMask)."""

    def __init__(self, f_center: Tuple = ("uniform", 0.0, 1.0),
                 f_width: Tuple = ("const", 0.1), name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.f_center = f_center
        self.f_width = f_width

    def _band_hz(self, key, signal):
        k_c, k_w = jax.random.split(key)
        c = float(np.mean(_sample_dist(k_c, self.f_center, 1)))
        w = float(np.mean(_sample_dist(k_w, self.f_width, 1)))
        nyq = signal.sample_rate / 2
        return max(c - w / 2, 0.0) * nyq, min(c + w / 2, 1.0) * nyq

    def _spectral(self, key, signal):
        fmin, fmax = self._band_hz(key, signal)
        return signal.mask_frequencies(fmin, fmax)


class TimeMask(SpectralTransform):
    """SpecAug time-span mask (reference: TimeMask)."""

    def __init__(self, t_center: Tuple = ("uniform", 0.0, 1.0),
                 t_width: Tuple = ("const", 0.025), name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.t_center = t_center
        self.t_width = t_width

    def _span_s(self, key, signal):
        k_c, k_w = jax.random.split(key)
        c = float(np.mean(_sample_dist(k_c, self.t_center, 1)))
        w = float(np.mean(_sample_dist(k_w, self.t_width, 1)))
        dur = signal.signal_duration
        return max(c - w / 2, 0.0) * dur, min(c + w / 2, 1.0) * dur

    def _spectral(self, key, signal):
        tmin, tmax = self._span_s(key, signal)
        return signal.mask_timesteps(tmin, tmax)


class MaskLowMagnitudes(SpectralTransform):
    """Zero STFT bins under a drawn dB cutoff
    (reference: MaskLowMagnitudes)."""

    def __init__(self, db_cutoff: Tuple = ("uniform", -10, 10),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db_cutoff = db_cutoff

    def _spectral(self, key, signal):
        db = float(np.mean(_sample_dist(key, self.db_cutoff, 1)))
        return signal.mask_low_magnitudes(db)


class TimeNoise(TimeMask):
    """TimeMask, but masked frames get noise instead of zeros
    (reference: TimeNoise)."""

    def _spectral(self, key, signal):
        k_m, k_a, k_p = jax.random.split(key, 3)
        tmin, tmax = self._span_s(k_m, signal)
        signal = signal.mask_timesteps(tmin, tmax, val=0.0)
        mag, phase = signal.magnitude(), signal.phase()
        hole = (mag == 0.0) & (phase == 0.0)
        mag = jnp.where(hole, jax.random.normal(k_a, mag.shape), mag)
        phase = jnp.where(hole, jax.random.normal(k_p, phase.shape),
                          phase)
        return signal.set_mag_phase(mag, phase)


class FrequencyNoise(FrequencyMask):
    """FrequencyMask, but masked bands get noise instead of zeros
    (reference: FrequencyNoise)."""

    def _spectral(self, key, signal):
        k_m, k_a, k_p = jax.random.split(key, 3)
        fmin, fmax = self._band_hz(k_m, signal)
        signal = signal.mask_frequencies(fmin, fmax, val=0.0)
        mag, phase = signal.magnitude(), signal.phase()
        hole = (mag == 0.0) & (phase == 0.0)
        mag = jnp.where(hole, jax.random.normal(k_a, mag.shape), mag)
        phase = jnp.where(hole, jax.random.normal(k_p, phase.shape),
                          phase)
        return signal.set_mag_phase(mag, phase)


class SpectralDenoising(Equalizer):
    """Spectral-gate denoising against a random EQ'd noise signal
    (reference: SpectralDenoising + ml/layers/spectral_gate.py)."""

    def __init__(self, eq_amount: Tuple = ("const", 1.0),
                 denoise_amount: Tuple = ("uniform", 0.8, 1.0),
                 nz_volume: float = -40, n_bands: int = 6,
                 n_freq: int = 3, n_time: int = 5, name: str = None,
                 prob: float = 1.0):
        super().__init__(eq_amount=eq_amount, n_bands=n_bands,
                         name=name, prob=prob)
        self.nz_volume = nz_volume
        self.denoise_amount = denoise_amount
        self.n_freq, self.n_time = n_freq, n_time

    def _transform(self, key, signal):
        from minimax_speech_tpu.utils.audio_signal import spectral_gate
        k_n, k_a, k_e, k_d = jax.random.split(key, 4)
        amount = _sample_dist(k_a, self.eq_amount, 1)
        eq = -np.asarray(amount).reshape(-1, 1) * np.asarray(
            jax.random.uniform(k_e, (1, self.n_bands)))
        nz = AudioSignal(jax.random.normal(k_n, (1, 1, 22050)),
                         signal.sample_rate)
        nz = nz.normalize(self.nz_volume).equalizer(eq)
        amt = float(np.mean(_sample_dist(k_d, self.denoise_amount, 1)))
        return spectral_gate(signal, nz, amt, n_freq=self.n_freq,
                             n_time=self.n_time)


def build_transform(augment_prob: float = 1.0,
                    preprocess: Sequence[str] = ("Identity",),
                    augment: Sequence[str] = ("Identity",),
                    postprocess: Sequence[str] = ("Identity",)) -> Compose:
    """Reference: dac-vae/train.py:39-49."""
    reg = globals()

    def to_tfm(names):
        return [reg[n]() for n in names]

    return Compose(
        Compose(*to_tfm(preprocess), name="preprocess"),
        Compose(*to_tfm(augment), name="augment", prob=augment_prob),
        Compose(*to_tfm(postprocess), name="postprocess"))
