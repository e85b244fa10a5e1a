"""End-to-end train CLI drive on a synthetic on-disk corpus (tiny, CPU)."""
import json
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import synthetic_audio
from tests.test_cli import write_wav


def make_corpus(tmp_path, rng, n=6):
    paths = []
    for i in range(n):
        audio = synthetic_audio(rng, 1.2, 24000)
        p = tmp_path / f"utt{i}.wav"
        write_wav(p, audio, 24000)
        (tmp_path / f"utt{i}.txt").write_text(f"synthetic utterance {i}")
        n_tok = len(audio) // 960
        np.save(tmp_path / f"utt{i}_fsq.npy",
                rng.integers(0, 6561, n_tok).astype(np.int32))
        np.save(tmp_path / f"utt{i}_latent2x.npy",
                rng.standard_normal((n_tok * 2, 80)).astype(np.float32))
        paths.append(str(p))
    lst = tmp_path / "data.list"
    lst.write_text("\n".join(paths))
    return lst


@pytest.mark.slow
@pytest.mark.parametrize("model_kind", ["llm", "flow"])
def test_train_cli_one_epoch(tmp_path, rng, model_kind):
    from minimax_speech_tpu.cli import train as train_cli
    lst = make_corpus(tmp_path, rng)
    model_dir = tmp_path / f"exp_{model_kind}"
    train_cli.main([
        "--model", model_kind, "--config", "configs/tiny.yaml",
        "--train_data", str(lst), "--cv_data", str(lst),
        "--model_dir", str(model_dir), "--max_epoch", "1", "--dp", "2",
        "--override", "train.save_per_step=3",
        "--override", "train.log_interval=1",
        "--override", "train.max_frames_in_batch=300",
    ])
    metrics_file = model_dir / f"{model_kind}_metrics.jsonl"
    assert metrics_file.exists()
    rows = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    assert any("loss" in r for r in rows)
    assert any(any(k.startswith("cv/") for k in r) for r in rows)
    # checkpoint written and resumable
    ckpts = list((model_dir / "ckpt").iterdir())
    assert ckpts, "no checkpoint saved"


@pytest.mark.slow
def test_train_dac_cli_smoke(tmp_path, rng):
    from minimax_speech_tpu.cli import train_dac
    for i in range(3):
        write_wav(tmp_path / f"w{i}.wav", synthetic_audio(rng, 0.6, 24000),
                  24000)
    model_dir = tmp_path / "exp_dac"
    train_dac.main([
        "--train_folders", str(tmp_path), "--model_dir", str(model_dir),
        "--config", "configs/tiny.yaml", "--batch_size", "2",
        "--duration", "0.1", "--num_iters", "3", "--save_iters", "2",
        "--sample_freq", "2", "--log_interval", "1",
        "--override", "model.dac.encoder_dim=4",
        "--override", "model.dac.decoder_dim=64",
        "--preprocess", "VolumeNorm", "--postprocess", "RescaleAudio",
        "--augment_prob", "0.0"])
    metrics = (model_dir / "dac_metrics.jsonl").read_text().splitlines()
    assert metrics
    import json
    row = json.loads(metrics[-1])
    assert "gen/loss" in row and "disc/loss" in row
    assert list(model_dir.glob("sample_*.npy"))


@pytest.mark.slow
def test_train_hift_cli_smoke(tmp_path, rng):
    from minimax_speech_tpu.cli import train_hift
    for i in range(2):
        write_wav(tmp_path / f"h{i}.wav", synthetic_audio(rng, 0.8, 24000),
                  24000)
    model_dir = tmp_path / "exp_hift"
    train_hift.main([
        "--train_folders", str(tmp_path), "--model_dir", str(model_dir),
        "--config", "configs/tiny.yaml", "--batch_size", "1",
        "--duration", "0.2", "--num_iters", "2", "--save_iters", "2",
        "--log_interval", "1", "--with_pitch",
        "--override", "model.hift.base_channels=32"])
    metrics = (model_dir / "hift_metrics.jsonl").read_text().splitlines()
    import json
    row = json.loads(metrics[-1])
    assert "gen/loss" in row and "gen/mel" in row and "disc/loss" in row


@pytest.mark.slow
def test_train_hift_cli_data_list(tmp_path, rng):
    """HiFT GAN training over the reference's data-list chain
    (truncate -> compute_fbank -> pitch -> padding_gan) instead of raw
    folders (reference: config.yaml gan data_pipeline)."""
    from minimax_speech_tpu.cli import train_hift
    lst = make_corpus(tmp_path, rng, n=3)
    model_dir = tmp_path / "exp_hift_list"
    train_hift.main([
        "--train_data", str(lst), "--model_dir", str(model_dir),
        "--config", "configs/tiny.yaml", "--batch_size", "2",
        "--duration", "0.2", "--num_iters", "2", "--save_iters", "2",
        "--log_interval", "1", "--with_pitch",
        "--override", "model.hift.base_channels=32"])
    metrics = (model_dir / "hift_metrics.jsonl").read_text().splitlines()
    row = json.loads(metrics[-1])
    assert "gen/loss" in row and "gen/f0" in row and "disc/loss" in row


@pytest.mark.slow
def test_train_cli_dpo_epoch(tmp_path, rng):
    """DPO fine-tuning through the train CLI: reject sidecars -> _rej
    plans -> make_dpo_step, rewards logged (VERDICT round-1 item #6)."""
    from minimax_speech_tpu.cli import train as train_cli
    lst = make_corpus(tmp_path, rng)
    for i in range(6):
        n_tok = len(np.load(tmp_path / f"utt{i}_fsq.npy"))
        np.save(tmp_path / f"utt{i}_fsq_reject.npy",
                rng.integers(0, 6561, max(n_tok - 2, 1)).astype(np.int32))
    model_dir = tmp_path / "exp_dpo"
    train_cli.main([
        "--model", "llm", "--config", "configs/tiny.yaml",
        "--train_data", str(lst),
        "--model_dir", str(model_dir), "--max_epoch", "1", "--dp", "2",
        "--dpo",
        "--override", "train.save_per_step=100",
        "--override", "train.log_interval=1",
        "--override", "train.max_frames_in_batch=300",
    ])
    metrics_file = model_dir / "llm_metrics.jsonl"
    rows = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    assert any("dpo/loss" in r for r in rows)
    assert any("dpo/chosen_reward" in r and "dpo/rejected_reward" in r
               for r in rows)


@pytest.mark.slow
def test_train_cli_epoch_resume(tmp_path, rng):
    """Epoch-level resume: a relaunched run continues the epoch budget
    instead of training ANOTHER max_epoch epochs (the gang-restart /
    supervised-attempt case), while a follow-on run with a different
    budget (e.g. a low-LR polish pass on the same model_dir) starts its
    own epoch count at 0."""
    from minimax_speech_tpu.cli import train as train_cli
    lst = make_corpus(tmp_path, rng)
    model_dir = tmp_path / "exp_llm"
    common = [
        "--model", "llm", "--config", "configs/tiny.yaml",
        "--train_data", str(lst), "--model_dir", str(model_dir),
        "--dp", "1",
        "--override", "train.save_per_step=1",
        "--override", "train.log_interval=1",
        "--override", "train.max_frames_in_batch=300",
    ]
    train_cli.main(common + ["--max_epoch", "2"])
    ep = json.loads((model_dir / "epoch_state.json").read_text())
    assert ep["epoch"] == 1
    metrics_file = model_dir / "llm_metrics.jsonl"
    steps_after_first = len(metrics_file.read_text().splitlines())

    # same budget relaunched: all epochs already done -> no new steps
    train_cli.main(common + ["--max_epoch", "2"])
    rows = [json.loads(l) for l in
            metrics_file.read_text().splitlines()[steps_after_first:]]
    assert not any("loss" in r for r in rows), rows

    # different budget (polish analogy): trains again from the ckpt
    train_cli.main(common + ["--max_epoch", "3",
                             "--override", "train.lr=1e-5"])
    rows = [json.loads(l) for l in
            metrics_file.read_text().splitlines()[steps_after_first:]]
    assert any("loss" in r for r in rows)
