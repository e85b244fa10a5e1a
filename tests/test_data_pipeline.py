"""Data pipeline tests: sharding, stage chain on synthetic samples."""
import numpy as np
import pytest

from minimax_speech_tpu.data import pipeline as dp
from tests.conftest import synthetic_audio


class CharTokenizer:
    def encode(self, text):
        return [ord(c) % 97 + 1 for c in text][:50]


def synthetic_source(rng, n=12):
    for i in range(n):
        audio = synthetic_audio(rng, 1.0 + 0.2 * (i % 3), sr=24000)
        n_tok = len(audio) // 960  # 25 Hz at 24 kHz
        yield {
            "src": f"mem://{i}.wav",
            "audio": audio,
            "sample_rate": 24000,
            "text": f"hello world sample {i}",
            "speech_token": rng.integers(0, 6561, n_tok).astype(np.int32),
            "speech_latent": rng.standard_normal((n_tok * 2, 80)).astype(np.float32),
        }


def test_datalist_two_level_sharding():
    items = list(range(20))
    d0 = dp.DataList(items, process_index=0, process_count=2,
                     worker_index=0, worker_count=2)
    d0.set_epoch(3)
    d1 = dp.DataList(items, process_index=1, process_count=2,
                     worker_index=1, worker_count=2)
    d1.set_epoch(3)
    s0 = [s["src"] for s in d0]
    s1 = [s["src"] for s in d1]
    assert len(s0) == 5 and len(s1) == 5
    assert not set(s0) & set(s1)
    # same epoch seed -> deterministic
    d0.set_epoch(3)
    assert [s["src"] for s in d0] == s0


def test_flow_pipeline(rng):
    stages = [
        lambda it: dp.tokenize(it, CharTokenizer()),
        dp.filter_lengths,
        dp.resample,
        dp.extract_reference_mel,
        lambda it: dp.sort_by_len(it, sort_size=4),
        lambda it: dp.dynamic_batch(it, max_frames_in_batch=400),
        dp.padding_flow,
    ]
    batches = list(dp.build_dataset(synthetic_source(rng), stages))
    assert batches
    for b in batches:
        bs, tmax = b["token"].shape
        assert b["feat"].shape == (bs, tmax * 2, 80)
        assert (b["token_len"] <= tmax).all()
        assert b["reference_mel"].shape[-1] == 80
        # padded region must be zeros
        for i in range(bs):
            assert (b["token"][i, b["token_len"][i]:] == 0).all()


def test_llm_pipeline(rng):
    stages = [
        lambda it: dp.tokenize(it, CharTokenizer()),
        dp.filter_lengths,
        dp.extract_reference_mel,
        lambda it: dp.static_batch(it, 4),
        lambda it: dp.padding_llm(it, bistream_prob=0.5),
    ]
    batches = list(dp.build_dataset(synthetic_source(rng), stages))
    assert batches
    for b in batches:
        assert b["src_type"].shape == b["tok_id"].shape == b["target"].shape
        assert b["src_type"].shape[1] % 64 == 0
        assert (b["seq_len"] <= b["src_type"].shape[1]).all()
        # each row starts with sos special
        assert (b["src_type"][:, 0] == 1).all()


def test_resample_changes_rate(rng):
    s = {"audio": synthetic_audio(rng, 0.5, sr=16000), "sample_rate": 16000}
    out = next(iter(dp.resample(iter([s]))))
    assert out["sample_rate"] == 24000
    assert abs(len(out["audio"]) - 12000) <= 1


def test_dpo_pipeline_end_to_end(rng, tmp_path):
    """DPO plumbing (VERDICT round-1 item #6): reject sidecars flow from
    disk through the opener -> filter -> padding_llm(dpo=True) into
    `_rej` plan tensors, and one make_dpo_step trains on them
    (reference pairing: dataset/processor.py:691-703 +
    utils/train_utils.py:327-344)."""
    import struct
    import wave

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.models import llm as llm_mod
    from minimax_speech_tpu.train import gan_steps, schedule, steps

    # write wav + sidecars incl. _fsq_reject
    for i in range(3):
        stem = tmp_path / f"utt{i}"
        audio = synthetic_audio(rng, 1.5, sr=24000)
        with wave.open(str(stem) + ".wav", "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            pcm = (audio * 32000).astype(np.int16)
            w.writeframes(struct.pack(f"<{len(pcm)}h", *pcm))
        (tmp_path / f"utt{i}.txt").write_text(f"sample text {i}")
        n_tok = 12 + i
        np.save(str(stem) + "_fsq.npy",
                rng.integers(0, 40, n_tok).astype(np.int32))
        np.save(str(stem) + "_latent2x.npy",
                rng.standard_normal((n_tok * 2, 80)).astype(np.float32))
        np.save(str(stem) + "_fsq_reject.npy",
                rng.integers(0, 40, n_tok + 2).astype(np.int32))

    source = ({"src": str(tmp_path / f"utt{i}.wav")} for i in range(3))
    stages = [
        dp.individual_file_opener,
        lambda it: dp.tokenize(it, CharTokenizer()),
        dp.filter_lengths,
        lambda it: dp.static_batch(it, 3),
        lambda it: dp.padding_llm(it, bistream_prob=0.0, dpo=True,
                                  eos=40, fill=42),
    ]
    batches = list(dp.build_dataset(source, stages))
    assert len(batches) == 1
    b = batches[0]
    for k in ("src_type", "tok_id", "target", "seq_len"):
        assert k + "_rej" in b
        assert b[k + "_rej"].shape == b[k].shape  # same bucket
    assert (b["seq_len_rej"] != b["seq_len"]).any()

    # one DPO step end-to-end on the pipeline batch
    from tests.test_gan import SMALL_LM
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["spk_emb"] = jnp.zeros((3, 32))
    tx = schedule.make_optimizer(lr=1e-4, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx)
    step = jax.jit(gan_steps.make_dpo_step(model, variables["params"]))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["dpo/loss"]))
    assert np.isfinite(float(metrics["dpo/chosen_reward"]))
    assert np.isfinite(float(metrics["dpo/rejected_reward"]))


def test_filter_static_shapes_keeps_batches_full():
    """Multi-host fixed-shape mode: over-long samples (and DPO samples
    missing their reject sidecar) are dropped BEFORE static_batch, so
    every emitted batch is exactly batch_size and the padding stages
    never shrink a batch (the SPMD equal-local-shape invariant)."""
    def sample(n_text, n_speech, reject=True):
        s = {"text_token": np.zeros(n_text, np.int32),
             "speech_token": np.zeros(n_speech, np.int32)}
        if reject:
            s["reject_speech_token"] = np.zeros(n_speech + 1, np.int32)
        return s

    # llm: plan length = text + speech + 3 (sos+spk+task)
    samples = [sample(10, 20), sample(10, 80), sample(10, 21),
               sample(10, 22), sample(10, 23)]
    out = list(dp.filter_static_shapes(iter(samples), "llm", max_len=64))
    assert len(out) == 4  # the n_speech=80 sample cannot fit 64

    batches = list(dp.static_batch(
        dp.filter_static_shapes(iter(samples), "llm", 64), 2,
        drop_last=True))
    assert [len(b) for b in batches] == [2, 2]

    # dpo: a missing/empty reject sidecar also drops the sample
    s_missing = sample(10, 20, reject=False)
    out = list(dp.filter_static_shapes(
        iter([sample(10, 20), s_missing]), "llm", 64, dpo=True))
    assert len(out) == 1

    # flow: the speech-token length must fit pad_tokens (no plan
    # overhead — tokens go straight to the padded token buffer)
    out = list(dp.filter_static_shapes(
        iter([sample(10, 20), sample(10, 80)]), "flow", 80))
    assert len(out) == 2
    out = list(dp.filter_static_shapes(
        iter([sample(10, 20), sample(10, 80)]), "flow", 64))
    assert len(out) == 1


def test_prefetch_order_and_exceptions():
    """prefetch preserves order, delivers everything, re-raises producer
    errors in the consumer, and stops its thread on early close."""
    import threading

    assert list(dp.prefetch(iter(range(20)), depth=3)) == list(range(20))
    assert list(dp.prefetch(iter(range(5)), depth=0)) == list(range(5))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = dp.prefetch(boom(), depth=2)
    assert next(it) == 1
    try:
        next(it)
        assert False, "expected ValueError"
    except ValueError:
        pass

    # early close: consumer abandons mid-stream; no thread leaks
    before = threading.active_count()
    it = dp.prefetch(iter(range(1000)), depth=2)
    assert next(it) == 0
    it.close()
    deadline = 50
    while threading.active_count() > before and deadline:
        import time
        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before


def test_gan_pipeline_chain(rng):
    """The reference's GAN/vocoder dataset chain (processor.py:304-322
    truncate, 401-428 compute_fbank, 677-687 gan padding): fixed-length
    crops, mel clipped to token length, frame-aligned audio + pitch."""
    hop, n = 480, 4800  # 0.2 s at 24 kHz
    stages = [
        dp.filter_lengths,
        dp.resample,
        lambda it: dp.truncate(it, n),
        dp.compute_fbank,
        lambda it: dp.extract_pitch(it, 24000, hop),
        lambda it: dp.static_batch(it, 2, drop_last=True),
        lambda it: dp.padding_gan(it, hop),
    ]
    batches = list(dp.build_dataset(synthetic_source(rng), stages))
    assert batches
    for b in batches:
        bs, t_mel, n_mels = b["speech_feat"].shape
        assert bs == 2 and n_mels == 80
        # audio is cropped frame-aligned to the mel length
        assert b["audio"].shape == (bs, t_mel * hop)
        assert b["pitch"].shape == (bs, t_mel)
        assert b["speech_feat"].dtype == np.float32
    # mel content parity: recompute from the batch audio
    from minimax_speech_tpu.ops import mel as mel_ops
    b = batches[0]
    want = mel_ops.hifigan_log_mel_np(b["audio"][0]).T[: b["speech_feat"].shape[1]]
    np.testing.assert_allclose(b["speech_feat"][0], want, atol=2e-4, rtol=1e-3)
