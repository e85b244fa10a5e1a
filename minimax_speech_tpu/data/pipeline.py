"""Host-side data pipeline: chained generator stages + two-level sharding.

Re-expresses the reference iterable pipeline
(reference: speech/cosyvoice/dataset/dataset.py:26-151 +
dataset/processor.py:31-705) for the TPU trainer:

  * same stage chain: open -> tokenize -> filter -> resample ->
    reference-mel crop -> fbank/latent align -> shuffle -> sort ->
    batch -> padding
  * same two-level modulo sharding (epoch-seeded shuffle, then
    data[process::n_process][worker::n_workers],
    dataset.py:82-104)
  * the reference's dynamic frame-budget batching
    (processor.py:520-546) becomes frame-budget batching + PAD-TO-BUCKET
    so every batch has a static shape for XLA (SURVEY §7 design stance)
  * padding additionally emits the stage-1 LM "plan" tensors
    (models/llm.py:build_lm_plan) so the device never sees ragged
    per-sample interleave work.

Stages are plain generator transformers: fn(iterable, **cfg) -> iterable
of sample dicts. File IO is pluggable through the opener.
"""
from __future__ import annotations

import io
import logging
import random
from pathlib import Path
from typing import Callable, Iterable, Iterator

import numpy as np

from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.ops import mel as mel_ops


# ---------------------------------------------------------------------------
# source + sharding
# ---------------------------------------------------------------------------

class DataList:
    """Epoch-seeded shuffled list with process/worker modulo sharding
    (reference: dataset/dataset.py:82-122)."""

    def __init__(self, items: list, shuffle: bool = True, partition: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 worker_index: int = 0, worker_count: int = 1):
        self.items = list(items)
        self.shuffle = shuffle
        self.partition = partition
        self.pi, self.pc = process_index, process_count
        self.wi, self.wc = worker_index, worker_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        data = list(self.items)
        if self.shuffle:
            random.Random(self.epoch).shuffle(data)
        if self.partition:
            data = data[self.pi::self.pc]
        data = data[self.wi::self.wc]
        for item in data:
            yield dict(item) if isinstance(item, dict) else {"src": item}


def attach_sidecars(sample: dict, token_latent_ratio: int = 2,
                    require_latent: bool = True) -> Iterator[dict]:
    """Attach {<stem>.txt, <stem>_fsq.*, <stem>_latent2x.*} sidecar data
    to a sample that already carries decoded audio; skip-and-log on error
    (reference: processor.py:31-189; the reference expects the
    `_latent2x.pt` suffix even though its README says `_latent.pt`).

    require_latent=False (GAN/vocoder path): only text + FSQ tokens are
    needed — compute_fbank clips mel to token length and the
    discriminators never see latents."""
    try:
        stem = Path(sample["src"]).with_suffix("")
        txt = Path(str(stem) + ".txt")
        sample["text"] = txt.read_text().strip()
        tok = _load_array(str(stem) + "_fsq")
        if require_latent:
            lat = _load_array(str(stem) + "_latent2x")
        else:
            lat = None
        if lat is None:
            sample["speech_token"] = np.asarray(tok, np.int32)
            yield sample
            return
        if lat.ndim == 3:
            lat = lat[0]
        if lat.shape[0] == 80 and lat.shape[1] != 80:  # (80, T) -> (T, 80)
            lat = lat.T
        n = min(len(tok), lat.shape[0] // token_latent_ratio)
        sample["speech_token"] = np.asarray(tok[:n], np.int32)
        sample["speech_latent"] = np.asarray(
            lat[: n * token_latent_ratio], np.float32)
        # optional DPO reject tokens (reference pairs a rejected sample per
        # utterance, processor.py:691-703; sidecar convention
        # <stem>_fsq_reject.*)
        try:
            rej = _load_array(str(stem) + "_fsq_reject")
            sample["reject_speech_token"] = np.asarray(rej, np.int32)
        except Exception:
            pass
        yield sample
    except Exception as e:  # skip-and-log, like the reference
        print(f"opener skip {sample.get('src')}: {e}")


def _expand_src(src: str) -> Iterator[str]:
    """One data-list entry -> wav paths. A `.json` entry is an index
    file ({"items": [{"wav": ...}]} from data_tools index, or the
    reference's {"data": [...]}) and a directory entry globs
    `*/*/*.wav` (reference: tools/inv_file_processor.py:25-45)."""
    if src.endswith(".json"):
        import json as _json
        idx = _json.loads(Path(src).read_text())
        rows = idx.get("items", idx.get("data", []))
        for r in rows:
            yield r["wav"] if isinstance(r, dict) else r
    elif Path(src).is_dir():
        yield from sorted(str(p) for p in Path(src).rglob("*.wav"))
    else:
        yield src


def individual_file_opener(data: Iterable[dict], token_latent_ratio: int = 2,
                           require_latent: bool = True) -> Iterator[dict]:
    """Read wav + sidecars per item (reference: processor.py:31-189;
    json-index / directory sources per inv_file_processor.py)."""
    for sample in data:
        for wav in _expand_src(str(sample["src"])):
            item = {**sample, "src": wav}
            try:
                audio, sr = _load_audio(wav)
            except Exception as e:
                print(f"opener skip {wav}: {e}")
                continue
            item["audio"] = audio
            item["sample_rate"] = sr
            yield from attach_sidecars(item, token_latent_ratio,
                                       require_latent=require_latent)


def _load_array(stem: str) -> np.ndarray:
    for suffix, loader in ((".npy", np.load), (".npz", _load_npz),
                           (".pt", _load_pt)):
        p = Path(stem + suffix)
        if p.exists():
            return loader(str(p))
    raise FileNotFoundError(stem + ".{npy,npz,pt}")


def _load_npz(path: str) -> np.ndarray:
    """{z, mu, ...} archive (extract_dac_latents convention): prefer mu."""
    z = np.load(path)
    for k in ("mu", "z", "tokens"):
        if k in z.files:
            return z[k]
    return z[z.files[0]]


def _load_pt(path: str):
    import torch
    t = torch.load(path, map_location="cpu")
    if isinstance(t, dict):
        t = t.get("z", t.get("tokens", next(iter(t.values()))))
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


def _load_audio(path: str):
    import wave

    from minimax_speech_tpu.data import mp3 as mp3_mod
    if mp3_mod.looks_like_mp3(path):
        return mp3_mod.decode_mp3(path)
    with wave.open(path) as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        if w.getnchannels() > 1:
            audio = audio.reshape(-1, w.getnchannels())[:, 0]
    return audio, sr


def parquet_opener(data: Iterable[dict]) -> Iterator[dict]:
    """Legacy parquet-shard opener (reference: processor.py:191-216):
    each item's `src` is a parquet file whose rows carry utterance fields
    (audio_data wav bytes, text, speech_token, ...)."""
    import io as _io
    import pyarrow.parquet as pq
    for sample in data:
        try:
            table = pq.read_table(sample["src"]).to_pylist()
        except Exception as e:
            print(f"parquet opener skip {sample.get('src')}: {e}")
            continue
        for row in table:
            out = dict(sample)
            out.update(row)
            if "audio_data" in out:
                import wave
                with wave.open(_io.BytesIO(out.pop("audio_data"))) as w:
                    sr = w.getframerate()
                    raw = w.readframes(w.getnframes())
                audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
                out["audio"] = audio
                out["sample_rate"] = sr
            if "speech_token" in out:
                out["speech_token"] = np.asarray(out["speech_token"], np.int32)
            yield out


def extract_pitch(data, sample_rate: int = 24000, hop: int = 480
                  ) -> Iterator[dict]:
    """Attach YIN f0 per mel frame (the pyworld replacement; GAN path,
    reference: processor.py:23 + padding pitch_feat)."""
    from minimax_speech_tpu.ops.pitch import yin_f0
    for s in data:
        s["pitch_feat"] = yin_f0(s["audio"], sample_rate, hop)
        yield s


# ---------------------------------------------------------------------------
# map stages
# ---------------------------------------------------------------------------

def tokenize(data, tokenizer) -> Iterator[dict]:
    """text -> text_token (reference: processor.py:431-445)."""
    for s in data:
        s["text_token"] = np.asarray(tokenizer.encode(s["text"]), np.int32)
        yield s


def filter_lengths(data, max_length: int = 40960, min_length: int = 100,
                   token_max_length: int = 200, token_min_length: int = 1
                   ) -> Iterator[dict]:
    """Length gates in 10ms frames / text tokens
    (reference: processor.py:219-272)."""
    for s in data:
        frames = len(s["audio"]) / s["sample_rate"] * 100
        if not (min_length < frames < max_length):
            continue
        # GAN/vocoder chains run without tokenize(); text gates only apply
        # when text tokens exist
        if "text_token" in s and not (
                token_min_length <= len(s["text_token"]) <= token_max_length):
            continue
        if len(s.get("speech_token", ())) == 0:
            continue
        # DPO pairs with an empty rejected sequence are unusable
        # (reference: processor.py:263-264)
        if "reject_speech_token" in s and len(s["reject_speech_token"]) == 0:
            continue
        yield s


def resample(data, target_sr: int = 24000) -> Iterator[dict]:
    """Polyphase-free linear resample + peak normalization above 1
    (reference: processor.py:275-301 uses torchaudio; behaviorally
    equivalent for the pipeline's purposes)."""
    for s in data:
        sr = s["sample_rate"]
        if sr != target_sr:
            n_out = int(round(len(s["audio"]) * target_sr / sr))
            x_old = np.linspace(0.0, 1.0, len(s["audio"]), endpoint=False)
            x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
            s["audio"] = np.interp(x_new, x_old, s["audio"]).astype(np.float32)
            s["sample_rate"] = target_sr
        peak = np.abs(s["audio"]).max() if len(s["audio"]) else 0.0
        if peak > 1.0:
            s["audio"] = s["audio"] / peak * 0.9
        yield s


def truncate(data, truncate_length: int = 24480) -> Iterator[dict]:
    """Random fixed-length crop (GAN path, reference: processor.py:304-322)."""
    for s in data:
        a = s["audio"]
        if len(a) > truncate_length:
            start = random.randint(0, len(a) - truncate_length)
            s["audio"] = a[start: start + truncate_length]
        else:
            s["audio"] = np.pad(a, (0, truncate_length - len(a)))
        yield s


def extract_reference_mel(data, sample_rate: int = 24000,
                          min_length: float = 0.5, max_length: float = 4.0,
                          num_crops: int = 1) -> Iterator[dict]:
    """Random speech crops -> 80-bin mels for the speaker encoder
    (reference: processor.py:325-398)."""
    for s in data:
        a = s["audio"]
        crops = []
        for _ in range(num_crops):
            dur = random.uniform(min_length, max_length)
            n = min(int(dur * sample_rate), len(a))
            start = random.randint(0, max(len(a) - n, 0))
            crop = a[start: start + n]
            m = mel_ops.hifigan_log_mel_np(crop).T  # (T, 80)
            crops.append(m.astype(np.float32))
        s["reference_mels"] = crops
        yield s


def compute_fbank(data, token_mel_ratio: int = 2) -> Iterator[dict]:
    """24 kHz mel features clipped to 2x token length
    (reference: processor.py:401-428)."""
    for s in data:
        m = mel_ops.hifigan_log_mel_np(s["audio"]).T
        n = min(m.shape[0] // token_mel_ratio, len(s["speech_token"]))
        s["speech_token"] = s["speech_token"][:n]
        s["speech_feat"] = m[: n * token_mel_ratio].astype(np.float32)
        yield s


def shuffle(data, shuffle_size: int = 1000) -> Iterator[dict]:
    buf = []
    for s in data:
        buf.append(s)
        if len(buf) >= shuffle_size:
            random.shuffle(buf)
            yield from buf
            buf = []
    random.shuffle(buf)
    yield from buf


def sort_by_len(data, sort_size: int = 500,
                key: str = "speech_latent") -> Iterator[dict]:
    buf = []
    for s in data:
        buf.append(s)
        if len(buf) >= sort_size:
            buf.sort(key=lambda x: _len_of(x, key))
            yield from buf
            buf = []
    buf.sort(key=lambda x: _len_of(x, key))
    yield from buf


def _len_of(s, key):
    v = s.get(key, s.get("speech_feat", s.get("speech_token")))
    return len(v)


def dynamic_batch(data, max_frames_in_batch: int = 25000,
                  key: str = "speech_latent") -> Iterator[list]:
    """Frame-budget batching (reference: processor.py:520-546)."""
    buf, longest = [], 0
    for s in data:
        n = _len_of(s, key)
        if buf and (max(longest, n) * (len(buf) + 1)) > max_frames_in_batch:
            yield buf
            buf, longest = [], 0
        buf.append(s)
        longest = max(longest, n)
    if buf:
        yield buf


def filter_static_shapes(data, model_kind: str, max_len: int,
                         dpo: bool = False,
                         use_spk: bool = True) -> Iterator[dict]:
    """Multi-host fixed-shape mode: drop anything that cannot fit the
    fixed pads BEFORE batching. The padding stages' late drops would
    shrink one host's batch below batch_size and desynchronize the SPMD
    step (every host must run the same program on the same shapes), so
    in static mode over-long samples — and, under DPO, samples whose
    reject sidecar is missing — must never reach static_batch.

    For the LM, a sample's plan length is the same for uni- and
    bistream interleaves: sos + (spk) + text + task + speech
    (models/llm.py:build_lm_plan)."""
    overhead = 3 if use_spk else 2
    dropped = 0
    for s in data:
        if model_kind == "llm":
            n = len(s["text_token"]) + overhead
            ok = n + len(s["speech_token"]) <= max_len
            if dpo:
                rej = s.get("reject_speech_token")
                ok = ok and rej is not None and len(rej) > 0 \
                    and n + len(rej) <= max_len
        else:
            ok = len(s["speech_token"]) <= max_len
        if not ok:
            dropped += 1
            if dropped % 100 == 1:
                logging.warning(
                    "filter_static_shapes: dropped %d samples that do "
                    "not fit max_len=%d", dropped, max_len)
            continue
        yield s


def static_batch(data, batch_size: int = 16,
                 drop_last: bool = False) -> Iterator[list]:
    """drop_last=True is required in multi-host SPMD mode: a trailing
    smaller batch would give hosts different array shapes in the same
    jitted step."""
    buf = []
    for s in data:
        buf.append(s)
        if len(buf) >= batch_size:
            yield buf
            buf = []
    if buf and not drop_last:
        yield buf


# ---------------------------------------------------------------------------
# padding -> fixed-shape numpy batches
# ---------------------------------------------------------------------------

def _bucket(n: int, multiple: int = 64) -> int:
    return max(((n + multiple - 1) // multiple) * multiple, multiple)


def padding_flow(batches, token_latent_ratio: int = 2,
                 bucket_multiple: int = 32,
                 pad_tokens: int | None = None,
                 pad_ref: int | None = None) -> Iterator[dict]:
    """Flow-stage batch: tokens, latents, reference mels, all padded to
    shared buckets (reference padding: processor.py:559-705).

    pad_tokens/pad_ref: FIXED pads instead of per-batch buckets —
    multi-host SPMD needs identical shapes on every host each step;
    over-long samples are dropped (skip-and-log)."""
    for batch in batches:
        if pad_tokens is not None:
            kept = [s for s in batch
                    if len(s["speech_token"]) <= pad_tokens]
            if len(kept) < len(batch):
                logging.warning("padding_flow: dropped %d samples longer "
                                "than pad_tokens=%d",
                                len(batch) - len(kept), pad_tokens)
            if not kept:
                continue
            batch = kept
        b = len(batch)
        tl = np.array([len(s["speech_token"]) for s in batch], np.int32)
        tmax = pad_tokens or _bucket(int(tl.max()), bucket_multiple)
        token = np.zeros((b, tmax), np.int32)
        feat = np.zeros((b, tmax * token_latent_ratio, 80), np.float32)
        for i, s in enumerate(batch):
            token[i, : tl[i]] = s["speech_token"]
            lat = s.get("speech_latent", s.get("speech_feat"))
            feat[i, : lat.shape[0]] = lat
        out = {"token": token, "token_len": tl, "feat": feat,
               "feat_len": tl * token_latent_ratio}
        if "reference_mels" in batch[0]:
            out.update(_pad_reference_mels(batch, bucket_multiple, pad_ref))
        yield out


def _pad_reference_mels(batch, bucket_multiple: int,
                        pad_ref: int | None = None) -> dict:
    rl = np.array([min(s["reference_mels"][0].shape[0], pad_ref or 1 << 30)
                   for s in batch], np.int32)
    rmax = pad_ref or _bucket(int(rl.max()), bucket_multiple)
    ref = np.zeros((len(batch), rmax, 80), np.float32)
    for i, s in enumerate(batch):
        ref[i, : rl[i]] = s["reference_mels"][0][: rl[i]]
    return {"reference_mel": ref, "reference_mel_len": rl}


def prefetch(batches: Iterable, depth: int = 2) -> Iterator:
    """Background-thread prefetch: overlap host-side batch prep (wav
    decode, fbank, plan building) with device compute — the
    torch-DataLoader-worker equivalent (reference: train_utils.py:150-168
    builds loaders with prefetch=8 worker processes).

    The producer thread runs the upstream generator chain; the consumer
    (the train loop, and any collectives such as uneven_join_batches)
    stays on the calling thread. Exceptions re-raise at the consumer;
    closing the generator stops the producer promptly."""
    import queue
    import threading

    if depth <= 0:
        yield from batches
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not _put(b):
                    return
            _put(_END)
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            _put(e)

    t = threading.Thread(target=worker, daemon=True,
                         name="batch-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        t.join(timeout=5.0)


def padding_gan(batches, hop: int = 480) -> Iterator[dict]:
    """GAN/vocoder-stage batch (reference: processor.py:677-687): mel
    features + the frame-aligned waveform + optional per-frame pitch.

    Upstream truncate() makes every sample the same length, so shapes are
    static per batch; audio is cropped to t_mel*hop so the generator's
    upsampled output aligns sample-for-sample with the target."""
    for batch in batches:
        feats = [s["speech_feat"] for s in batch]
        t_mel = min(f.shape[0] for f in feats)
        out = {
            "speech_feat": np.stack([f[:t_mel] for f in feats]
                                    ).astype(np.float32),
            "audio": np.stack([s["audio"][: t_mel * hop] for s in batch]
                              ).astype(np.float32),
        }
        if "pitch_feat" in batch[0]:
            # yin_f0 emits 1+(n-frame_length)//hop frames (< t_mel at the
            # tail); pad trailing frames as unvoiced (f0=0)
            pitch = [s["pitch_feat"][:t_mel] for s in batch]
            out["pitch"] = np.stack(
                [np.pad(p, (0, t_mel - len(p))) for p in pitch]
            ).astype(np.float32)
        yield out


def padding_llm(batches, mix_ratio=(5, 15), use_spk: bool = True,
                bucket_multiple: int = 64,
                bistream_prob: float = 0.5,
                dpo: bool = False, eos: int = 6561,
                fill: int = 6563, pad_to: int | None = None,
                pad_ref: int | None = None) -> Iterator[dict]:
    """Stage-1 LM batch: emits the fixed-shape interleave plan
    (replaces the reference's on-device python interleave,
    llm.py:433-527). With dpo=True, also emits `_rej`-suffixed plan
    tensors built from each sample's reject_speech_token (the
    reference's reject pairing, processor.py:691-703), padded to the
    SAME bucket so chosen/rejected run through one jitted step."""
    for batch in batches:
        if dpo:
            # a sample whose _fsq_reject sidecar was absent (sidecar
            # loads are skip-on-error) must be dropped here, not crash
            # the epoch — same skip-and-log convention as the openers
            kept = [s for s in batch if "reject_speech_token" in s]
            if len(kept) < len(batch):
                logging.warning(
                    "padding_llm(dpo): dropping %d/%d samples missing "
                    "reject_speech_token", len(batch) - len(kept),
                    len(batch))
            if not kept:
                continue
            batch = kept
        flags = [random.random() < bistream_prob for _ in batch]

        def plan_for(token_key, pad_to=None):
            return llm_mod.build_lm_plan(
                [s["text_token"] for s in batch],
                [s[token_key] for s in batch],
                mix_ratio=mix_ratio, use_spk=use_spk, bistream_flags=flags,
                pad_to=pad_to, eos=eos, fill=fill)

        plan = plan_for("speech_token")
        longest = int(plan["seq_len"].max())
        if dpo:
            rej_probe = plan_for("reject_speech_token")
            longest = max(longest, int(rej_probe["seq_len"].max()))
        if pad_to is not None:
            if longest > pad_to:
                # fixed-shape (multi-host) mode: drop over-long samples
                keep = [i for i in range(len(batch))
                        if int(plan["seq_len"][i]) <= pad_to
                        and (not dpo
                             or int(rej_probe["seq_len"][i]) <= pad_to)]
                logging.warning("padding_llm: dropped %d samples longer "
                                "than pad_to=%d",
                                len(batch) - len(keep), pad_to)
                if not keep:
                    continue
                batch = [batch[i] for i in keep]
                flags = [flags[i] for i in keep]
            pad = pad_to
        else:
            pad = _bucket(longest, bucket_multiple)
        plan = plan_for("speech_token", pad)
        out = dict(plan)
        if dpo:
            rej = plan_for("reject_speech_token", pad)
            out.update({k + "_rej": v for k, v in rej.items()})
        if "reference_mels" in batch[0]:
            out.update(_pad_reference_mels(batch, 32, pad_ref))
        yield out


# ---------------------------------------------------------------------------
# dataset assembly
# ---------------------------------------------------------------------------

def build_dataset(source: Iterable[dict], stages: list[Callable]
                  ) -> Iterator:
    """Chain stages over the source (reference: Dataset(), dataset.py:125)."""
    it = iter(source)
    for stage in stages:
        it = stage(it)
    return it
