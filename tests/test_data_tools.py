"""Data tools + pitch + parquet opener tests."""
import numpy as np
import pytest

from minimax_speech_tpu.cli import data_tools
from minimax_speech_tpu.data import pipeline as dp
from minimax_speech_tpu.ops.pitch import yin_f0
from tests.conftest import synthetic_audio
from tests.test_cli import write_wav


def make_corpus(tmp_path, rng, n=3):
    for i in range(n):
        audio = synthetic_audio(rng, 0.4, 24000)
        write_wav(tmp_path / f"u{i}.wav", audio, 24000)
        (tmp_path / f"u{i}.txt").write_text(f"utterance {i}")
        toks = rng.integers(0, 6561, 10)
        np.save(tmp_path / f"u{i}_fsq.npy", toks)
        np.savez(tmp_path / f"u{i}_latent2x.npz",
                 mu=rng.standard_normal((20, 80)).astype(np.float32))


def test_create_list_and_validate(tmp_path, rng, capsys):
    make_corpus(tmp_path, rng)
    write_wav(tmp_path / "orphan.wav", synthetic_audio(rng, 0.2, 24000), 24000)
    lst = tmp_path / "l.txt"
    data_tools.main(["create_list", "--dir", str(tmp_path),
                     "--out", str(lst)])
    lines = lst.read_text().strip().splitlines()
    assert len(lines) == 3  # orphan excluded
    rc = data_tools.main(["validate", "--list", str(lst)])
    assert not rc
    out = capsys.readouterr().out
    assert "0 problems" in out


def test_index(tmp_path, rng):
    make_corpus(tmp_path, rng, 2)
    idx = tmp_path / "idx.json"
    data_tools.main(["index", "--dir", str(tmp_path), "--out", str(idx)])
    import json
    data = json.loads(idx.read_text())
    assert data["total"] == 2


def test_parquet_roundtrip(tmp_path, rng):
    make_corpus(tmp_path, rng, 4)
    lst = tmp_path / "l.txt"
    data_tools.main(["create_list", "--dir", str(tmp_path), "--out", str(lst)])
    shards = tmp_path / "shards"
    data_tools.main(["make_parquet", "--list", str(lst),
                     "--out_dir", str(shards), "--per_shard", "3"])
    files = sorted(shards.glob("*.parquet"))
    assert len(files) == 2  # 3 + 1
    # reopen through the pipeline stage
    samples = list(dp.parquet_opener(iter([{"src": str(f)} for f in files])))
    assert len(samples) == 4
    s = samples[0]
    assert s["sample_rate"] == 24000 and len(s["audio"]) > 0
    assert len(s["speech_token"]) == 10


def test_yin_f0_on_sine():
    sr = 24000
    t = np.arange(sr) / sr
    audio = 0.6 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    f0 = yin_f0(audio, sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.02)
    # silence is unvoiced
    f0s = yin_f0(np.zeros(sr, np.float32), sr)
    assert (f0s == 0).all()


def test_manifest_and_card(tmp_path, rng):
    make_corpus(tmp_path, rng, 2)
    data_tools.main(["manifest", "--dir", str(tmp_path),
                     "--out_dir", str(tmp_path / "m")])
    scp = (tmp_path / "m" / "wav.scp").read_text().strip().splitlines()
    txt = (tmp_path / "m" / "text").read_text().strip().splitlines()
    assert len(scp) == len(txt) == 2
    assert txt[0].startswith("u0 utterance")

    from minimax_speech_tpu.cli import hub_tools
    hub_tools.main(["card", "--model_dir", str(tmp_path)])
    card = (tmp_path / "README.md").read_text()
    assert "minimax_speech_tpu" in card and "u0.wav" in card


def test_audio_folder(tmp_path, rng):
    from minimax_speech_tpu.data.audio_folder import AudioFolder
    make_corpus(tmp_path, rng, 3)
    ds = AudioFolder(str(tmp_path), duration=0.2, sample_rate=24000)
    assert len(ds) == 3
    batch = ds.sample_batch(4)
    assert batch.shape == (4, 4800)
    assert np.abs(batch).max() <= 1.0
    it = ds.infinite_batches(2)
    assert next(it).shape == (2, 4800)


def test_metrics_logger_and_timer(tmp_path):
    import json
    from minimax_speech_tpu.utils.logging import MetricsLogger, Timer
    lg = MetricsLogger(str(tmp_path), name="t", log_interval=2)
    lg.log(0, {"loss": 1.5})
    lg.log(1, {"loss": 1.0})        # skipped (interval)
    lg.log(1, {"loss": 1.0}, force=True)
    rows = [json.loads(l) for l in
            (tmp_path / "t_metrics.jsonl").read_text().splitlines()]
    assert len(rows) == 2 and rows[0]["loss"] == 1.5

    tm = Timer()
    with tm("phase_a"):
        sum(range(1000))
    snap = tm.snapshot_and_reset()
    assert "time/phase_a" in snap and snap["time/phase_a"] >= 0
    assert tm.snapshot_and_reset() == {}


def test_opener_json_index_and_dir_sources(tmp_path, rng):
    """A data-list entry may be a .json index or a directory
    (reference: tools/inv_file_processor.py:25-45)."""
    import json
    make_corpus(tmp_path, rng, 2)
    # via json index (data_tools index format)
    idx = tmp_path / "index.json"
    data_tools.main(["index", "--dir", str(tmp_path), "--out", str(idx)])
    got = list(dp.individual_file_opener([{"src": str(idx)}]))
    assert len(got) == 2 and all("speech_token" in s for s in got)
    # via directory
    got = list(dp.individual_file_opener([{"src": str(tmp_path)}]))
    assert len(got) == 2
    # reference-style {"data": [...]} index also accepted
    (tmp_path / "ref.json").write_text(json.dumps(
        {"data": [str(tmp_path / "u0.wav")]}))
    got = list(dp.individual_file_opener([{"src": str(tmp_path / "ref.json")}]))
    assert len(got) == 1


def test_manifest_spk_maps(tmp_path, rng):
    """utt2spk/spk2utt outputs (reference: local/prepare_data.py)."""
    for i in range(2):
        audio = synthetic_audio(rng, 0.2, 24000)
        write_wav(tmp_path / f"spk{i}_001.wav", audio, 24000)
        (tmp_path / f"spk{i}_001.txt").write_text("hi")
    data_tools.main(["manifest", "--dir", str(tmp_path),
                     "--out_dir", str(tmp_path / "m")])
    u2s = (tmp_path / "m" / "utt2spk").read_text().strip().splitlines()
    s2u = (tmp_path / "m" / "spk2utt").read_text().strip().splitlines()
    assert u2s == ["spk0_001 spk0", "spk1_001 spk1"]
    assert s2u == ["spk0 spk0_001", "spk1 spk1_001"]
