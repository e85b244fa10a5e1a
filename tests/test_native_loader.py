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
