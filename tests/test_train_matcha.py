"""cli/train_matcha drives the standalone Matcha losses end-to-end
(reference trains the same triple via Lightning,
speech/matcha/models/matcha_tts.py:23)."""
import json
import wave

import numpy as np

from minimax_speech_tpu.cli import train_matcha


def _write_wav(path, audio, sr=22050):
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_train_matcha_loss_decreases(tmp_path, rng):
    sr = 22050
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    paths = []
    for i, (text, f0) in enumerate([("hello world", 220.0),
                                    ("good morning", 330.0)]):
        t = np.arange(int(0.5 * sr)) / sr
        audio = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        w = corpus / f"u{i}.wav"
        _write_wav(w, audio, sr)
        w.with_suffix(".txt").write_text(text)
        paths.append(str(w))
    lst = corpus / "data.list"
    lst.write_text("\n".join(paths))

    model_dir = tmp_path / "exp"
    train_matcha.main([
        "--train_data", str(lst), "--model_dir", str(model_dir),
        "--num_epochs", "30", "--batch_size", "2", "--lr", "2e-3",
        "--warmup_steps", "5", "--log_interval", "1",
        "--save_epochs", "30",
        "--cleaners", "transliteration_cleaners",
        "--export_npz", str(model_dir / "matcha.npz")])

    rows = [json.loads(l) for l in
            (model_dir / "matcha_metrics.jsonl").read_text().splitlines()]
    assert rows, "no metrics logged"
    first = np.mean([r["loss"] for r in rows[:3]])
    last = np.mean([r["loss"] for r in rows[-3:]])
    assert last < first, (first, last)
    assert (model_dir / "matcha.npz").exists()
    assert (model_dir / "matcha_stats.json").exists()
