"""MP3 decode through libmpg123 (ctypes fallback + native C++ loader).

Validation design: there is no mp3 encoder in this environment, so the
test vectors come from a minimal MPEG-1 Layer III *bitstream writer*
below (mono, long blocks, scalefactors 0, huffman table 1 + silence).
libmpg123 — an independent, battle-tested decoder — is the oracle: if
the writer's header/side-info/huffman layout were wrong, mpg123 would
desync and the tone-frequency / gain-ratio / length assertions would
fail. This checks our loader integration end-to-end on real Layer III
structure (reference loads mp3 corpora like Emilia through ffmpeg:
dac-vae/audiotools/core/ffmpeg.py; speech/tools/download_dataset.py
saves .mp3).
"""
import numpy as np
import pytest

from minimax_speech_tpu.data import mp3 as mp3_mod
from minimax_speech_tpu.data import native_loader

FS = 44100
FRAME_BYTES = 417     # floor(144 * 128000 / 44100), no padding bit
SAMPLES_PER_FRAME = 1152

pytestmark = pytest.mark.skipif(
    not mp3_mod.mpg123_available(), reason="libmpg123 not on this system")


class _BW:
    def __init__(self):
        self.bits = []

    def w(self, val: int, n: int):
        self.bits += [(val >> i) & 1 for i in range(n - 1, -1, -1)]

    def tobytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def _l3_frame(tone: bool, global_gain: int) -> bytes:
    """One self-contained MPEG-1 Layer III mono frame @44.1 kHz 128 kbps.

    Header: sync/MPEG1/LayerIII/no-CRC = FF FB, bitrate idx 9 (128k),
    sr idx 0 (44100), mono. Side info (17 bytes): main_data_begin=0
    (no bit reservoir), scalefac_compress=0 (slen 0/0 -> zero
    scalefactor bits). Tone granules put spectral lines 20,21 = +1,+1:
    ten (0,0) pairs from huffman table 1 (code '1') then one (1,1)
    (code '000' + two positive sign bits); big_values=11, region0 =
    sfb0..5 (lines 0..23) with table 1, regions 1/2 empty, table 0.
    Requantized amplitude per line = 2^((global_gain-210)/4).
    """
    hdr = bytes([0xFF, 0xFB, 0x90, 0xC0])
    side, main = _BW(), _BW()
    side.w(0, 9)   # main_data_begin
    side.w(0, 5)   # private bits (mono)
    side.w(0, 4)   # scfsi
    for _ in range(2):  # two granules, identical
        if tone:
            p23, bv, tables, r0 = 15, 11, (1, 0, 0), 5
        else:
            p23, bv, tables, r0 = 0, 0, (0, 0, 0), 0
        side.w(p23, 12)
        side.w(bv, 9)
        side.w(global_gain, 8)
        side.w(0, 4)   # scalefac_compress
        side.w(0, 1)   # window_switching_flag (normal long block)
        for t in tables:
            side.w(t, 5)
        side.w(r0, 4)  # region0_count
        side.w(0, 3)   # region1_count
        side.w(0, 1)   # preflag
        side.w(0, 1)   # scalefac_scale
        side.w(0, 1)   # count1table_select
        if tone:
            for _ in range(10):
                main.w(1, 1)    # (0,0) -> '1'
            main.w(0, 3)        # (1,1) -> '000'
            main.w(0, 1)        # sign x: positive
            main.w(0, 1)        # sign y: positive
    body = side.tobytes() + main.tobytes()
    assert len(side.tobytes()) == 17
    return hdr + body + b"\0" * (FRAME_BYTES - 4 - len(body))


def write_mp3(path, n_frames=30, tone=False, global_gain=190):
    path.write_bytes(b"".join(
        _l3_frame(tone, global_gain) for _ in range(n_frames)))
    return path


def test_silence_decodes_to_zeros(tmp_path):
    p = write_mp3(tmp_path / "s.mp3", n_frames=20, tone=False)
    audio, sr = mp3_mod.decode_mp3(str(p))
    assert sr == FS
    assert 18 * SAMPLES_PER_FRAME <= len(audio) <= 21 * SAMPLES_PER_FRAME
    assert float(np.sqrt(np.mean(audio ** 2))) < 1e-4


def test_tone_frequency_and_level(tmp_path):
    p = write_mp3(tmp_path / "t.mp3", n_frames=30, tone=True)
    audio, sr = mp3_mod.decode_mp3(str(p))
    assert sr == FS
    # skip the decoder-delay/filterbank warmup, analyze steady state
    x = audio[4 * SAMPLES_PER_FRAME:24 * SAMPLES_PER_FRAME]
    assert float(np.sqrt(np.mean(x ** 2))) > 1e-3
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    peak_hz = np.argmax(spec) * sr / len(x)
    # spectral lines 20,21 of 576 -> (20.5..21.5) * fs/1152 = 785..823 Hz
    assert 730 <= peak_hz <= 880, peak_hz
    # the peak must dominate: >10x the median spectral magnitude
    assert spec.max() > 10 * np.median(spec)


def test_global_gain_scales_output(tmp_path):
    a, _ = mp3_mod.decode_mp3(str(write_mp3(
        tmp_path / "a.mp3", n_frames=20, tone=True, global_gain=190)))
    b, _ = mp3_mod.decode_mp3(str(write_mp3(
        tmp_path / "b.mp3", n_frames=20, tone=True, global_gain=198)))
    lo = slice(4 * SAMPLES_PER_FRAME, 18 * SAMPLES_PER_FRAME)
    ratio = (float(np.sqrt(np.mean(b[lo] ** 2)))
             / float(np.sqrt(np.mean(a[lo] ** 2))))
    # 2^((198-190)/4) = 4x amplitude
    assert 3.4 <= ratio <= 4.6, ratio


def test_native_loader_matches_ctypes(tmp_path):
    if not native_loader.native_available():
        pytest.skip("g++/native build unavailable")
    p = write_mp3(tmp_path / "n.mp3", n_frames=10, tone=True)
    (a, sr), = native_loader.batch_load([str(p)])
    b, sr_b = mp3_mod.decode_mp3(str(p))
    assert sr == sr_b == FS
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_misnamed_wav_routes_by_magic(tmp_path, rng):
    """A RIFF wav named .mp3 must decode as wav on BOTH paths (content
    magic beats the extension)."""
    from tests.conftest import synthetic_audio
    from tests.test_cli import write_wav
    audio = synthetic_audio(rng, 0.3, 16000)
    p = tmp_path / "fake.mp3"
    write_wav(p, audio, 16000)
    assert not mp3_mod.looks_like_mp3(str(p))
    from minimax_speech_tpu.data.pipeline import _load_audio
    a, sr = _load_audio(str(p))
    assert sr == 16000 and len(a) == len(audio)
    if native_loader.native_available():
        (b, sr_n), = native_loader.batch_load([str(p)])
        assert sr_n == 16000 and len(b) == len(audio)


def _id3v2_tag(payload: bytes = b"\0" * 64) -> bytes:
    n = len(payload)
    size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])
    return b"ID3\x04\x00\x00" + size + payload


def test_id3_tagged_flac_not_eaten_by_mp3(tmp_path):
    """Real-world taggers prepend ID3v2 to flac; that must not route to
    libmpg123 (FLAC frame sync aliases MPEG sync -> garbage)."""
    from tests.test_native_loader import (_BitWriter, _flac_frame,
                                          _flac_streaminfo,
                                          _subframe_constant)
    n, sr = 64, 16000
    w = _BitWriter()
    _flac_frame(w, 0, n, 0, 0, [lambda b: _subframe_constant(b, 99, 16)])
    flac = b"fLaC" + _flac_streaminfo(sr, 1, 16, n) + bytes(w.buf)
    p = tmp_path / "tagged.flac"
    p.write_bytes(_id3v2_tag() + flac)
    assert not mp3_mod.looks_like_mp3(str(p))
    if native_loader.native_available():
        (a, sr_n), = native_loader.batch_load([str(p)])
        assert sr_n == sr and len(a) == n
        np.testing.assert_allclose(a, np.full(n, 99 / 32768.0), atol=1e-7)


def test_truncation_is_tolerated_but_errors_raise(tmp_path):
    """mpg123 returns DONE for mid-frame truncation (tail frame dropped,
    no silent half-file reads)."""
    full = b"".join(_l3_frame(True, 190) for _ in range(10))
    p = tmp_path / "trunc.mp3"
    p.write_bytes(full[:-200])
    audio, sr = mp3_mod.decode_mp3(str(p))
    assert sr == FS
    assert len(audio) == 9 * SAMPLES_PER_FRAME


def test_real_world_mp3_if_present():
    """A real encoder's output (MPEG2 LSF, ID3v2 tag, Xing header):
    exercises tag skip + LSF parsing beyond what the writer above emits."""
    import os
    p = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
         "test_data/test.mp3")
    if not os.path.exists(p):
        pytest.skip("no real-world mp3 on this system")
    audio, sr = mp3_mod.decode_mp3(p)
    assert sr in (8000, 11025, 12000, 16000, 22050, 24000, 32000,
                  44100, 48000)
    assert len(audio) > sr // 4  # decoded a meaningful stretch
    assert np.all(np.isfinite(audio))


def test_mp3_through_pipeline_opener(tmp_path, rng):
    """The data pipeline loads an mp3 corpus (Emilia ships mp3)."""
    p = write_mp3(tmp_path / "u.mp3", n_frames=20, tone=True)
    (tmp_path / "u.txt").write_text("mp3 sample")
    n = 20 * SAMPLES_PER_FRAME
    n_tok = n // 960
    np.save(tmp_path / "u_fsq.npy", rng.integers(0, 6561, n_tok))
    np.save(tmp_path / "u_latent2x.npy",
            rng.standard_normal((n_tok * 2, 80)).astype(np.float32))
    out = list(native_loader.native_file_opener(iter([{"src": str(p)}])))
    assert len(out) == 1
    s = out[0]
    assert s["sample_rate"] == FS
    assert abs(len(s["audio"]) - n) <= SAMPLES_PER_FRAME
    assert s["text"] == "mp3 sample"

    # pure-python fallback path routes mp3 too
    from minimax_speech_tpu.data.pipeline import _load_audio
    audio, sr = _load_audio(str(p))
    assert sr == FS and len(audio) == len(s["audio"])
