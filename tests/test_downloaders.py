"""Pretrained/dataset downloaders, exercised fully offline
(reference: scripts/download_pretrained.sh, tools/download_dataset.py).
file:// URLs stand in for the hub; in-memory sample dicts stand in for
the streaming HF dataset."""
import hashlib
import json
import wave
from pathlib import Path

import numpy as np

from minimax_speech_tpu.cli import download_dataset as dd
from minimax_speech_tpu.cli import download_pretrained as dp


def _mirror(tmp_path: Path) -> Path:
    src = tmp_path / "mirror"
    src.mkdir()
    (src / "llm.pt").write_bytes(b"fake-llm-bytes" * 100)
    (src / "cosyvoice2.yaml").write_text("model: {}\n")
    return src


def test_download_pretrained_fetch_manifest_skip(tmp_path):
    src = _mirror(tmp_path)
    out = tmp_path / "model"
    args = ["--model_dir", str(out), "--base_url", src.as_uri(),
            "--files", "llm.pt", "cosyvoice2.yaml"]
    dp.main(args)

    manifest = json.loads((out / "manifest.json").read_text())
    for name in ("llm.pt", "cosyvoice2.yaml"):
        assert (out / name).read_bytes() == (src / name).read_bytes()
        digest = hashlib.sha256((src / name).read_bytes()).hexdigest()
        assert manifest[name]["sha256"] == digest
        assert manifest[name]["bytes"] == (src / name).stat().st_size

    # second run: everything present -> no re-fetch (mirror removed)
    for f in src.iterdir():
        f.unlink()
    dp.main(args)  # must not raise


def test_download_pretrained_resume(tmp_path):
    """A leftover .part file only resumes on an explicit 206; a server
    that ignores Range (file:// always does) returns the full body and
    the fetch must restart from scratch instead of appending it after
    the stale prefix."""
    src = _mirror(tmp_path)
    out = tmp_path / "model"
    out.mkdir()
    # leftover partial content
    (out / "llm.pt.part").write_bytes(b"fake-llm")
    digest = dp.fetch((src / "llm.pt").as_uri(), out / "llm.pt",
                      progress=False)
    got = (out / "llm.pt").read_bytes()
    # file:// has no Range support (no 206): the fetch must detect the
    # ignored Range and restart from scratch — the stale prefix must
    # NOT survive in front of the true content
    assert got == b"fake-llm-bytes" * 100
    assert digest == hashlib.sha256(got).hexdigest()


def _sample(i, sr=16000, with_json=True):
    t = np.arange(sr // 4) / sr
    arr = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
    s = {"mp3": {"array": arr, "sampling_rate": sr}}
    if with_json:
        s["json"] = {"id": f"utt{i}", "text": f"transcript {i}",
                     "wav": f"EN/mp3/utt{i}.mp3"}
    else:
        s.update({"id": f"utt{i}", "text": f"transcript {i}"})
    return s


def test_write_sample_layout_and_skip(tmp_path):
    out = tmp_path / "corpus"
    sid, fresh, wav_path = dd.write_sample(_sample(0), out)
    assert sid == "utt0" and fresh
    assert wav_path == out / "EN/utt0.wav"
    # reference layout: /mp3 dropped, .mp3 -> .wav
    wav = out / "EN/utt0.wav"
    txt = out / "EN/utt0.txt"
    assert wav.exists() and txt.read_text() == "transcript 0"
    with wave.open(str(wav)) as w:
        assert w.getframerate() == 16000
        assert w.getnframes() == 4000
    # resumable: second call skips
    sid, fresh, _ = dd.write_sample(_sample(0), out)
    assert not fresh


def test_write_sample_without_json_meta(tmp_path):
    out = tmp_path / "corpus"
    sid, fresh, wav_path = dd.write_sample(_sample(3, with_json=False),
                                           out)
    assert sid == "utt3" and fresh
    assert (out / "utt3.wav").exists()
    # the returned path must be the one actually written (the flat-meta
    # fallback previously diverged between write and list)
    assert wav_path == out / "utt3.wav"


def test_decode_raw_flac_bytes(tmp_path):
    """Raw container bytes fall back to the native loader."""
    import pytest

    from minimax_speech_tpu.data.native_loader import native_available
    if not native_available():
        pytest.skip("native loader unavailable")
    # build a wav container in memory (RIFF branch of the sniffer)
    import io
    sr = 16000
    pcm = (0.25 * np.sin(2 * np.pi * 440 * np.arange(800) / sr))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((pcm * 32767).astype(np.int16).tobytes())
    audio, got_sr = dd._decode({"mp3": buf.getvalue()})
    assert got_sr == sr
    np.testing.assert_allclose(audio, pcm.astype(np.float32), atol=1e-3)
