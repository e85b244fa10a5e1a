"""Stream a HF audio corpus (Emilia / viVoice layout) to wav+txt pairs.

Reference: speech/tools/download_dataset.py (streaming `load_dataset`
-> per-sample mp3 decode -> wav + transcript sidecar) and
download_vivoice.py. Differences here: stdlib wav writing (no
soundfile), decode preferring the sample's already-decoded array and
falling back to the native loader for raw mp3/flac bytes it can
handle, resumable (existing pairs skipped), and a pure function
(`write_sample`) covering the per-sample logic so it is testable
offline.

  python -m minimax_speech_tpu.cli.download_dataset \
      --dataset amphion/Emilia-Dataset --subset EN --split train \
      --out_dir data/emilia_en [--max_samples N]
"""
from __future__ import annotations

import argparse
import wave
from pathlib import Path

import numpy as np


def _write_wav(path: Path, audio: np.ndarray, sr: int):
    pcm = (np.clip(audio, -1.0, 1.0) * 32767).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _decode(sample: dict):
    """-> (audio float32 mono, sr) from whatever the dataset provides."""
    for key in ("mp3", "audio", "flac", "wav"):
        a = sample.get(key)
        if a is None:
            continue
        if isinstance(a, dict) and a.get("array") is not None:
            arr = np.asarray(a["array"], np.float32)
            if arr.ndim == 2:
                arr = arr.mean(axis=0 if arr.shape[0] <= 2 else 1)
            return arr, int(a["sampling_rate"])
        if isinstance(a, (bytes, bytearray)):
            # raw container bytes: the native loader handles wav/flac
            import tempfile

            from minimax_speech_tpu.data.native_loader import batch_load
            suffix = ".wav" if bytes(a[:4]) == b"RIFF" else ".flac"
            with tempfile.NamedTemporaryFile(suffix=suffix) as f:
                f.write(a)
                f.flush()
                arr, sr = batch_load([f.name])[0]
                return np.asarray(arr, np.float32), int(sr)
    raise ValueError("no decodable audio field in sample")


def sample_paths(meta: dict, out_dir: Path) -> tuple[Path, Path]:
    """Mirror the reference's path layout: metadata['wav'] with the
    /mp3 shard dir dropped and .mp3 -> .wav (download_dataset.py:33)."""
    rel = str(meta.get("wav") or f"{meta['id']}.wav")
    rel = rel.replace("/mp3", "").replace(".mp3", ".wav")
    wav = out_dir / rel
    return wav, wav.with_suffix(".txt")


def write_sample(sample: dict, out_dir: Path) -> tuple[str, bool, Path]:
    """One dataset record -> (id, written, wav_path). Skips existing
    pairs. Returns the path it actually used, so callers never
    re-derive it from a different metadata fallback."""
    meta = sample.get("json") or {
        "id": sample.get("id", "sample"),
        "text": sample.get("text", ""),
        "wav": sample.get("wav")}
    wav_path, txt_path = sample_paths(meta, out_dir)
    if wav_path.exists() and txt_path.exists():
        return str(meta["id"]), False, wav_path
    audio, sr = _decode(sample)
    txt_path.parent.mkdir(parents=True, exist_ok=True)
    txt_path.write_text(meta.get("text", ""))
    _write_wav(wav_path, audio, sr)
    return str(meta["id"]), True, wav_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   help="HF dataset id, e.g. amphion/Emilia-Dataset")
    p.add_argument("--subset", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--data_list", default=None,
                   help="also write a data.list of the wav paths")
    args = p.parse_args(argv)

    try:
        from datasets import load_dataset
    except ImportError:
        raise SystemExit("the `datasets` package is required for "
                         "streaming downloads")

    ds = load_dataset(args.dataset, args.subset, split=args.split,
                      streaming=True)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written, skipped, errors = 0, 0, 0
    paths = []
    for i, sample in enumerate(ds):
        if args.max_samples is not None and i >= args.max_samples:
            break
        try:
            sid, fresh, wav_path = write_sample(sample, out_dir)
            paths.append(str(wav_path))
            written += fresh
            skipped += not fresh
        except Exception as e:  # noqa: BLE001 — skip-and-log convention
            errors += 1
            print(f"  skip sample {i}: {e}")
        if (i + 1) % 100 == 0:
            print(f"  {i + 1} samples ({written} new, {skipped} present, "
                  f"{errors} errors)")
    if args.data_list:
        Path(args.data_list).write_text("\n".join(paths))
    print(f"done: {written} written, {skipped} existing, {errors} errors")


if __name__ == "__main__":
    main()
