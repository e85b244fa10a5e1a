"""Batched TTS serving daemon.

The serving-process counterpart of the reference's vLLM path: an HTTP
front door queues requests; a background worker drains the queue every
`max_wait_ms` (or when `max_batch` requests are waiting) and runs ONE
batched synthesis (infer/serving.py) — the AR decode is weight-streaming
bound, so batching multiplies throughput nearly for free.

  python -m minimax_speech_tpu.cli.serve --port 7860 \
      [--ckpt_dir DIR | --random_init] [--config ...]

POST /synthesize {"text": "...", "speaker": "<id>"}        -> wav bytes
POST /register_speaker {"id": "...", "wav_b64": <base64 wav bytes>,
                        "prompt_text": "..."}               -> 200
GET  /healthz                                               -> ok

Speaker registration takes the audio *in* the request (base64 WAV), like
the reference's fastapi/gradio servers accept uploads — never a
server-side filesystem path, which would let any client read arbitrary
host files. The server binds 127.0.0.1 unless --host overrides it.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype(np.int16)
                      .tobytes())
    return buf.getvalue()


class Server:
    def __init__(self, tts, max_batch: int = 8, max_wait_ms: int = 50):
        import jax

        from minimax_speech_tpu.infer.serving import BatchSynthesizer
        self.tts = tts
        self.synth = BatchSynthesizer(tts.pipeline)
        self.queue: "queue.Queue" = queue.Queue()
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._jax = jax
        self._counter = 0
        threading.Thread(target=self._worker, daemon=True).start()

    def submit(self, text: str, speaker: str) -> np.ndarray:
        done = threading.Event()
        slot = {}
        self.queue.put((text, speaker, slot, done))
        done.wait(timeout=300)
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["audio"]

    def _worker(self):
        from minimax_speech_tpu.infer.serving import Request
        while True:
            first = self.queue.get()
            batch = [first]
            import time
            deadline = time.time() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            reqs, slots = [], []
            for text, speaker, slot, done in batch:
                try:
                    info = self.tts.spk2info[speaker]
                    toks = self.tts.frontend.extract_text_tokens(
                        self.tts.frontend.text_normalize(text,
                                                         split=False)[0])
                    reqs.append(Request(
                        text_tokens=toks,
                        prompt_text_tokens=np.asarray(
                            info["prompt_text_tokens"], np.int32),
                        prompt_speech_tokens=np.asarray(
                            info["prompt_tokens"], np.int32),
                        prompt_feat=np.asarray(info["prompt_feat"]),
                        lm_spk=np.asarray(info["lm_spk"]).reshape(-1),
                        flow_emb=np.asarray(info["flow_emb"]).reshape(-1)))
                    slots.append((slot, done))
                except Exception as e:
                    slot["error"] = f"bad request: {e}"
                    done.set()
            if not reqs:
                continue
            try:
                self._counter += 1
                wavs = self.synth.synthesize_batch(
                    reqs, key=self._jax.random.PRNGKey(self._counter))
                for (slot, done), wav in zip(slots, wavs):
                    slot["audio"] = wav
                    done.set()
            except Exception as e:
                for slot, done in slots:
                    slot["error"] = str(e)
                    done.set()


class ContinuousServer:
    """Continuous-batching worker: requests join/leave the running decode
    batch (infer/continuous.py) instead of waiting for an arrival window
    — per-request latency no longer depends on batch-mates (the
    reference's vLLM engine role, speech/cosyvoice/llm/llm.py:715-743)."""

    def __init__(self, tts, slots: int = 4, token_hop: int = 25):
        import jax

        from minimax_speech_tpu.infer.continuous import ContinuousBatcher
        self.tts = tts
        self.cb = ContinuousBatcher(tts.pipeline, slots=slots,
                                    token_hop=token_hop,
                                    key=jax.random.PRNGKey(0))
        self.queue: "queue.Queue" = queue.Queue()
        self._waiters: dict[int, tuple[dict, threading.Event, list]] = {}
        threading.Thread(target=self._worker, daemon=True).start()

    def submit(self, text: str, speaker: str) -> np.ndarray:
        done = threading.Event()
        slot = {}
        self.queue.put((text, speaker, slot, done))
        done.wait(timeout=600)
        if "error" in slot:
            raise RuntimeError(slot["error"])
        if not done.is_set():
            raise RuntimeError("timed out")
        return slot["audio"]

    def _drain_queue(self, block: bool):
        from minimax_speech_tpu.infer.serving import Request
        while True:
            try:
                item = self.queue.get(timeout=0.02 if block else 0)
            except queue.Empty:
                return
            block = False
            text, speaker, slot, done = item
            try:
                info = self.tts.spk2info[speaker]
                toks = self.tts.frontend.extract_text_tokens(
                    self.tts.frontend.text_normalize(text, split=False)[0])
                req = Request(
                    text_tokens=toks,
                    prompt_text_tokens=np.asarray(
                        info["prompt_text_tokens"], np.int32),
                    prompt_speech_tokens=np.asarray(
                        info["prompt_tokens"], np.int32),
                    prompt_feat=np.asarray(info["prompt_feat"]),
                    lm_spk=np.asarray(info["lm_spk"]).reshape(-1),
                    flow_emb=np.asarray(info["flow_emb"]).reshape(-1))
            except Exception as e:
                slot["error"] = f"bad request: {e}"
                done.set()
                continue
            rid = self.cb.submit(req)
            self._waiters[rid] = (slot, done, [])

    def _worker(self):
        while True:
            self._drain_queue(block=not self.cb.busy())
            if not self.cb.busy():
                continue
            try:
                events = self.cb.tick()
            except Exception as e:
                for slot, done, _ in self._waiters.values():
                    slot["error"] = str(e)
                    done.set()
                self._waiters.clear()
                continue
            for ev in events:
                w = self._waiters.get(ev.stream)
                if w is None:
                    continue
                slot, done, chunks = w
                if len(ev.audio):
                    chunks.append(ev.audio)
                if ev.final:
                    slot["audio"] = (np.concatenate(chunks) if chunks
                                     else np.zeros(0, np.float32))
                    done.set()
                    del self._waiters[ev.stream]


def make_handler(server: Server, tts):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/healthz":
                body = b"ok"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self.send_error(400, "invalid json")
                return
            if self.path == "/register_speaker":
                if "id" not in req or "wav_b64" not in req:
                    self.send_error(
                        400, "register_speaker requires 'id' and 'wav_b64'")
                    return
                try:
                    raw = base64.b64decode(req["wav_b64"], validate=True)
                    with wave.open(io.BytesIO(raw), "rb") as w:
                        sr = w.getframerate()
                        nch = w.getnchannels()
                        if w.getsampwidth() != 2:
                            raise ValueError("expected 16-bit PCM wav")
                        pcm = np.frombuffer(
                            w.readframes(w.getnframes()), np.int16)
                    audio = (pcm.reshape(-1, nch).mean(axis=1)
                             / 32768.0).astype(np.float32)
                except Exception as e:
                    self.send_error(400, f"bad wav payload: {e}")
                    return
                if sr != 16000:
                    n = int(round(len(audio) * 16000 / sr))
                    audio = np.interp(
                        np.linspace(0, 1, n, endpoint=False),
                        np.linspace(0, 1, len(audio), endpoint=False),
                        audio).astype(np.float32)
                tts.add_zero_shot_spk(req.get("prompt_text", ""), audio,
                                      req["id"])
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")
            elif self.path == "/synthesize":
                try:
                    audio = server.submit(req.get("text", "hello"),
                                          req.get("speaker"))
                except Exception as e:
                    self.send_error(500, str(e))
                    return
                body = wav_bytes(audio, tts.sample_rate)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, fmt, *a):
            print("[serve]", fmt % a)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (default loopback; set 0.0.0.0 "
                        "explicitly to expose)")
    p.add_argument("--config", default="configs/default.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=int, default=50)
    p.add_argument("--scheduler", choices=("window", "continuous"),
                   default="window",
                   help="window = arrival-window batch; continuous = "
                        "slot-pool continuous batching (requests "
                        "join/leave the running decode)")
    p.add_argument("--slots", type=int, default=4,
                   help="(continuous) decode lanes")
    p.add_argument("--warm", dest="warm", action="store_true", default=True,
                   help="pre-compile serving programs before binding the "
                        "port (default; compiled executables persist via "
                        "the on-disk cache, so later starts take seconds)")
    p.add_argument("--no_warm", dest="warm", action="store_false")
    args = p.parse_args(argv)

    import jax

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.infer.api import TTS
    from minimax_speech_tpu.infer.pipeline import TTSPipeline

    if args.ckpt_dir:
        tts = TTS(model_dir=args.ckpt_dir,
                  tokenizer_path=args.tokenizer_path, config=args.config)
    elif args.random_init:
        cfg = cfg_lib.load_tts_config(args.config, args.override)
        tts = TTS(pipeline=TTSPipeline.from_random(cfg),
                  tokenizer_path=args.tokenizer_path)
    else:
        raise SystemExit("need --ckpt_dir or --random_init")

    if args.warm:
        import time as _time

        from minimax_speech_tpu.infer.warmup import warm_serving
        t0 = _time.time()
        warm_serving(tts, scheduler=args.scheduler,
                     max_batch=args.max_batch, slots=args.slots)
        print(f"warmup finished in {_time.time() - t0:.1f}s; "
              "ready to serve")

    if args.scheduler == "continuous":
        server = ContinuousServer(tts, slots=args.slots)
        mode = f"continuous, {args.slots} slots"
    else:
        server = Server(tts, args.max_batch, args.max_wait_ms)
        mode = f"batch<={args.max_batch}, window {args.max_wait_ms}ms"
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(server, tts))
    print(f"serving on {args.host}:{args.port} ({mode})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
