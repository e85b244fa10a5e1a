"""Native C++ audio loader: build, decode parity vs python wave, threads."""
import wave

import numpy as np
import pytest

from minimax_speech_tpu.data import native_loader
from tests.conftest import synthetic_audio
from tests.test_cli import write_wav


@pytest.fixture(scope="module")
def built():
    if not native_loader.native_available():
        pytest.skip("g++/native build unavailable")
    return True


def test_native_decode_matches_python(built, tmp_path, rng):
    audio = synthetic_audio(rng, 0.7, 16000)
    path = tmp_path / "x.wav"
    write_wav(path, audio, 16000)
    (a, sr), = native_loader.batch_load([str(path)])
    assert sr == 16000
    # python reference decode
    from minimax_speech_tpu.data.pipeline import _load_audio
    b, _ = _load_audio(str(path))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_native_resample_and_threads(built, tmp_path, rng):
    paths = []
    for i in range(8):
        p = tmp_path / f"f{i}.wav"
        write_wav(p, synthetic_audio(rng, 0.3 + 0.05 * i, 16000), 16000)
        paths.append(str(p))
    out = native_loader.batch_load(paths, target_sr=24000, num_threads=4)
    assert len(out) == 8
    for (a, sr), i in zip(out, range(8)):
        assert sr == 24000
        expect = int(round(int((0.3 + 0.05 * i) * 16000) * 1.5))
        assert abs(len(a) - expect) <= 1


def test_native_error_reported(built, tmp_path):
    with pytest.raises(IOError):
        native_loader.batch_load([str(tmp_path / "missing.wav")])


def test_native_opener_stage(built, tmp_path, rng):
    # full pipeline stage with sidecars
    audio = synthetic_audio(rng, 0.5, 24000)
    p = tmp_path / "u.wav"
    write_wav(p, audio, 24000)
    (tmp_path / "u.txt").write_text("hello")
    n_tok = len(audio) // 960
    np.save(tmp_path / "u_fsq.npy", rng.integers(0, 6561, n_tok))
    np.save(tmp_path / "u_latent2x.npy",
            rng.standard_normal((n_tok * 2, 80)).astype(np.float32))
    out = list(native_loader.native_file_opener(iter([{"src": str(p)}])))
    assert len(out) == 1
    s = out[0]
    assert s["text"] == "hello"
    assert len(s["speech_token"]) == n_tok
    assert s["speech_latent"].shape == (n_tok * 2, 80)
    assert abs(len(s["audio"]) - len(audio)) <= 1


def test_native_rejects_malformed_wavs(built, tmp_path):
    """Truncated/lying chunk headers and bits=0 must produce an error,
    not an over-read or SIGFPE (advisor finding, round 1)."""
    import struct

    def riff(body: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # fmt chunk claims 16 bytes but the file is truncated after 4
    trunc = riff(b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x02\x00")
    # fmt with bits=0 (would make bytes_per=0 -> divide by zero)
    fmt0 = (b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 16000, 0, 0, 0))
    zerobits = riff(fmt0 + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    # data chunk claiming 4 GiB
    fmt16 = (b"fmt " + struct.pack("<I", 16)
             + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16))
    lying = riff(fmt16 + b"data" + struct.pack("<I", 0xFFFFFFF0) + b"\x00" * 16)

    paths = []
    for name, payload in [("trunc", trunc), ("zerobits", zerobits)]:
        p = tmp_path / f"{name}.wav"
        p.write_bytes(payload)
        paths.append((str(p), True))
    p = tmp_path / "lying.wav"
    p.write_bytes(lying)
    paths.append((str(p), False))  # lying data len: clamped, decodes 8 frames

    for path, expect_err in paths:
        try:
            (a, sr), = native_loader.batch_load([path])
            assert not expect_err, f"{path} should have errored"
            assert len(a) == 8
        except IOError:
            assert expect_err, f"{path} should have decoded"


# ---------------------------------------------------------------------------
# FLAC (test-local encoder: VERBATIM / CONSTANT / FIXED+rice subframes,
# independent + mid-side + left-side stereo — covers every decoder path in
# native/audio_loader.cpp decode_flac except LPC, which real encoders emit
# but which shares the residual/warmup machinery exercised here)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((int(v) >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def swrite(self, v, nbits):
        self.write(int(v) & ((1 << nbits) - 1), nbits)

    def align(self):
        while self.n:
            self.write(0, 1)


def _flac_streaminfo(sr, channels, bps, total):
    w = _BitWriter()
    w.write(0x80 | 0, 8)          # last-block flag, type 0 = STREAMINFO
    w.write(34, 24)               # length
    w.write(16, 16)               # min blocksize
    w.write(65535, 16)            # max blocksize
    w.write(0, 24)                # min framesize (unknown)
    w.write(0, 24)                # max framesize
    w.write(sr, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    w.write(0, 128)               # md5 (not verified)
    return bytes(w.buf)


def _subframe_verbatim(w, x, bps):
    w.write(0, 1)                 # pad
    w.write(1, 6)                 # VERBATIM
    w.write(0, 1)                 # no wasted bits
    for v in x:
        w.swrite(v, bps)


def _subframe_constant(w, v, bps):
    w.write(0, 1)
    w.write(0, 6)                 # CONSTANT
    w.write(0, 1)
    w.swrite(v, bps)


def _subframe_fixed2(w, x, bps, porder=1):
    """FIXED order-2 predictor with rice-coded residual partitions."""
    w.write(0, 1)
    w.write(8 + 2, 6)             # FIXED, order 2
    w.write(0, 1)
    w.swrite(x[0], bps)           # warmup
    w.swrite(x[1], bps)
    res = [int(x[i]) - (2 * int(x[i - 1]) - int(x[i - 2]))
           for i in range(2, len(x))]
    zz = [(r << 1) ^ (r >> 63) if r >= 0 else ((-r << 1) - 1) for r in res]
    param = max(1, max(z.bit_length() for z in zz) - 3) if zz else 1
    w.write(0, 2)                 # rice method 0 (4-bit params)
    w.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        count = len(x) >> porder
        if p == 0:
            count -= 2
        w.write(param, 4)
        for _ in range(count):
            z = zz[idx]
            idx += 1
            q, r = z >> param, z & ((1 << param) - 1)
            w.write(1, q + 1)     # q zeros then a 1  (value 1 in q+1 bits)
            w.write(r, param)


def _flac_frame(w, frame_no, blocksize, sr_code, ch_code, subframes):
    w.write(0x3FFE, 14)           # sync
    w.write(0, 1)                 # reserved
    w.write(0, 1)                 # fixed blocksize strategy
    w.write(7, 4)                 # blocksize: 16-bit value - 1 follows
    w.write(sr_code, 4)
    w.write(ch_code, 4)
    w.write(0, 3)                 # bps from STREAMINFO
    w.write(0, 1)                 # reserved
    assert frame_no < 128
    w.write(frame_no, 8)          # UTF-8 coded (single byte)
    w.write(blocksize - 1, 16)
    w.write(0, 8)                 # CRC-8 (decoder skips)
    for emit in subframes:
        emit(w)
    w.align()
    w.write(0, 16)                # CRC-16 (decoder skips)


def test_flac_mono_all_subframe_types(built, tmp_path):
    sr, bps = 16000, 16
    rng = np.random.default_rng(7)
    verb = rng.integers(-32768, 32768, 64)
    t = np.arange(128)
    smooth = (8000 * np.sin(2 * np.pi * 3 * t / 128)).astype(np.int64)
    const = np.full(32, -12345, np.int64)
    total = len(verb) + len(smooth) + len(const)

    w = _BitWriter()
    _flac_frame(w, 0, 64, 0, 0, [lambda b: _subframe_verbatim(b, verb, bps)])
    _flac_frame(w, 1, 128, 0, 0,
                [lambda b: _subframe_fixed2(b, smooth, bps, porder=2)])
    _flac_frame(w, 2, 32, 0, 0,
                [lambda b: _subframe_constant(b, -12345, bps)])
    path = tmp_path / "m.flac"
    path.write_bytes(b"fLaC" + _flac_streaminfo(sr, 1, bps, total)
                     + bytes(w.buf))

    (a, got_sr), = native_loader.batch_load([str(path)])
    assert got_sr == sr
    expect = np.concatenate([verb, smooth, const]) / 32768.0
    np.testing.assert_allclose(a, expect.astype(np.float32), atol=1e-7)


def test_flac_stereo_decorrelation(built, tmp_path):
    sr, bps, n = 24000, 16, 96
    rng = np.random.default_rng(11)
    left = rng.integers(-32768, 32768, n)
    right = rng.integers(-32768, 32768, n)

    w = _BitWriter()
    # frame 0: independent stereo (ch_code = nch-1 = 1)
    _flac_frame(w, 0, n, 0, 1,
                [lambda b: _subframe_verbatim(b, left, bps),
                 lambda b: _subframe_verbatim(b, right, bps)])
    # frame 1: left/side (ch_code 8): side = left - right, bps+1
    side = left - right
    _flac_frame(w, 1, n, 0, 8,
                [lambda b: _subframe_verbatim(b, left, bps),
                 lambda b: _subframe_verbatim(b, side, bps + 1)])
    # frame 2: right/side (ch_code 9)
    _flac_frame(w, 2, n, 0, 9,
                [lambda b: _subframe_verbatim(b, side, bps + 1),
                 lambda b: _subframe_verbatim(b, right, bps)])
    # frame 3: mid/side (ch_code 10): mid = (l+r)>>1
    mid = (left + right) >> 1
    _flac_frame(w, 3, n, 0, 10,
                [lambda b: _subframe_verbatim(b, mid, bps),
                 lambda b: _subframe_verbatim(b, side, bps + 1)])
    path = tmp_path / "s.flac"
    path.write_bytes(b"fLaC" + _flac_streaminfo(sr, 2, bps, 4 * n)
                     + bytes(w.buf))

    (a, got_sr), = native_loader.batch_load([str(path)])
    assert got_sr == sr
    mono = ((left + right) / 2 / 32768.0).astype(np.float32)
    for f in range(4):  # every stereo mode must reconstruct the same mono
        np.testing.assert_allclose(a[f * n:(f + 1) * n], mono, atol=1e-7,
                                   err_msg=f"frame {f}")


def test_flac_through_pipeline_opener(built, tmp_path, rng):
    """VERDICT #9 done-bar: the data pipeline loads a flac corpus."""
    sr, n = 24000, 24000 // 2
    pcm = (np.clip(synthetic_audio(rng, 0.5, sr), -1, 1)
           * 32767).astype(np.int64)
    w = _BitWriter()
    _flac_frame(w, 0, n, 0, 0, [lambda b: _subframe_verbatim(b, pcm, 16)])
    p = tmp_path / "u.flac"
    p.write_bytes(b"fLaC" + _flac_streaminfo(sr, 1, 16, n) + bytes(w.buf))
    (tmp_path / "u.txt").write_text("flac sample")
    n_tok = n // 960
    np.save(tmp_path / "u_fsq.npy", rng.integers(0, 6561, n_tok))
    np.save(tmp_path / "u_latent2x.npy",
            rng.standard_normal((n_tok * 2, 80)).astype(np.float32))
    out = list(native_loader.native_file_opener(iter([{"src": str(p)}])))
    assert len(out) == 1
    s = out[0]
    assert s["sample_rate"] == sr
    np.testing.assert_allclose(s["audio"], pcm / 32768.0, atol=1e-7)
    assert s["text"] == "flac sample"
    assert s["speech_token"].shape == (n_tok,)
