"""Zero-shot synthesis CLI: text + prompt wav -> 24 kHz wav.

The user-facing API slot the reference leaves empty
(speech/inference.py is a 0-byte file; the closest surface is
CosyVoice2.inference_zero_shot, cli/cosyvoice.py:92-104).

  python -m minimax_speech_tpu.cli.synthesize \
      --text "hello there" --prompt_text "reference transcript" \
      --prompt_wav prompt24k.wav --out out.wav \
      [--ckpt_dir DIR] [--stream] [--random_init]

ckpt_dir holds {llm,flow,codec,s3}.npz params (see convert_checkpoint).
"""
from __future__ import annotations

import argparse
import time
import wave
from pathlib import Path

import numpy as np


def write_wav(path: str, audio: np.ndarray, sr: int = 24000):
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--text", required=True)
    p.add_argument("--prompt_text", default="")
    p.add_argument("--prompt_wav", required=True,
                   help="24 kHz mono wav of the reference speaker")
    p.add_argument("--out", default="out.wav")
    p.add_argument("--config", default="configs/default.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--stream", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.infer.frontend import Frontend
    from minimax_speech_tpu.infer.pipeline import TTSPipeline
    from minimax_speech_tpu.infer.session import StreamingSession
    from minimax_speech_tpu.utils.params_io import load_params

    cfg = cfg_lib.load_tts_config(args.config, args.override)
    if args.ckpt_dir:
        d = Path(args.ckpt_dir)
        pipe = TTSPipeline(cfg,
                           lm_vars=load_params(d / "llm.npz"),
                           flow_vars=load_params(d / "flow.npz"),
                           codec_vars=load_params(d / "codec.npz"),
                           s3_vars=load_params(d / "s3.npz"))
    elif args.random_init:
        pipe = TTSPipeline.from_random(cfg, jax.random.PRNGKey(args.seed))
    else:
        raise SystemExit("need --ckpt_dir or --random_init")

    fe = Frontend(args.tokenizer_path)

    audio24, sr = _load_audio(args.prompt_wav)
    assert sr == 24000, f"prompt must be 24 kHz (got {sr})"
    # 16 kHz copy for the FSQ tokenizer (reference resamples in frontend)
    n16 = int(len(audio24) * 16000 / 24000)
    audio16 = np.interp(np.linspace(0, 1, n16, endpoint=False),
                        np.linspace(0, 1, len(audio24), endpoint=False),
                        audio24).astype(np.float32)

    prompt_tokens = pipe.extract_prompt_tokens(audio16)
    prompt_mel = pipe.extract_prompt_mel(audio24)
    prompt_feat = (pipe.extract_prompt_latent(audio24)
                   if cfg.output_type == "latent" else prompt_mel)
    lm_spk, flow_emb = pipe.speaker_embedding(prompt_mel)
    ptext_tokens = fe.extract_text_tokens(args.prompt_text) \
        if args.prompt_text else np.zeros((0,), np.int32)

    pieces = fe.text_normalize(args.text)
    outputs = []
    t0 = time.perf_counter()
    for piece in pieces:
        text_tokens = fe.extract_text_tokens(piece)
        if args.stream:
            sess = StreamingSession(pipe)
            for chunk in sess.synthesize_stream(
                    text_tokens, ptext_tokens, prompt_tokens, prompt_feat,
                    lm_spk, flow_emb, key=jax.random.PRNGKey(args.seed)):
                outputs.append(chunk.audio)
                print(f"chunk: {len(chunk.audio) / 24000:.2f}s "
                      f"(tokens={chunk.tokens}, final={chunk.final})")
        else:
            wav, tim = pipe.synthesize(
                text_tokens, ptext_tokens, prompt_tokens, prompt_feat,
                lm_spk, flow_emb, key=jax.random.PRNGKey(args.seed),
                return_timings=True)
            outputs.append(wav)
            rtf = tim["total_s"] / max(tim["audio_s"], 1e-9)
            print(f"piece: {tim['audio_s']:.2f}s audio, rtf={rtf:.4f}")
    total = np.concatenate(outputs) if outputs else np.zeros(1, np.float32)
    write_wav(args.out, total)
    dt = time.perf_counter() - t0
    print(f"wrote {args.out}: {len(total) / 24000:.2f}s audio in {dt:.2f}s "
          f"(rtf={dt / (len(total) / 24000):.4f})")


if __name__ == "__main__":
    main()
