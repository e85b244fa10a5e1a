"""Top-level zero-shot TTS API — the CosyVoice2-compatible surface.

Mirrors CosyVoice2 (reference: speech/cosyvoice/cli/cosyvoice.py:92-215):
  * inference_zero_shot(tts_text, prompt_text, prompt_speech_16k)
  * inference_cross_lingual(tts_text, prompt_speech_16k)
  * inference_instruct2(tts_text, instruct_text, prompt_speech_16k)
  * inference_vc(source_speech_16k, prompt_speech_16k)
  * speaker cache: add_zero_shot_spk / save_spkinfo (frontend spk2info)

All methods are generators yielding {'tts_speech': np.ndarray (1, T)}
with per-chunk RTF logged — the measurement harness BASELINE.md keys on
(reference: cli/cosyvoice.py:88,101-102). The GPU-accelerator loaders
(load_jit/load_trt/load_vllm) have no TPU meaning: every stage here is
already a jitted XLA executable, which is the TPU-native equivalent.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Generator, Optional

import jax
import numpy as np

from minimax_speech_tpu import config as cfg_lib
from minimax_speech_tpu.infer.frontend import Frontend
from minimax_speech_tpu.infer.pipeline import TTSPipeline
from minimax_speech_tpu.infer.session import StreamingSession


def _resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return audio.astype(np.float32)
    n = int(round(len(audio) * sr_out / sr_in))
    return np.interp(np.linspace(0, 1, n, endpoint=False),
                     np.linspace(0, 1, len(audio), endpoint=False),
                     audio).astype(np.float32)


class TTS:
    """CosyVoice2-equivalent entry object.

    model_dir holds {llm,flow,codec,s3}.npz converted params + optionally
    a config.yaml and a HF tokenizer dir; pass pipeline= for an
    already-built TTSPipeline (e.g. random weights in tests).
    """

    def __init__(self, model_dir: Optional[str] = None,
                 pipeline: Optional[TTSPipeline] = None,
                 tokenizer_path: Optional[str] = None,
                 config: str = "configs/default.yaml",
                 campplus: Optional[str] = None):
        if pipeline is None:
            from minimax_speech_tpu.utils.params_io import load_params
            d = Path(model_dir)
            cfg_file = d / "config.yaml"
            cfg = cfg_lib.load_tts_config(
                cfg_file if cfg_file.exists() else config)
            pipeline = TTSPipeline(
                cfg, lm_vars=load_params(d / "llm.npz"),
                flow_vars=load_params(d / "flow.npz"),
                codec_vars=load_params(d / "codec.npz"),
                s3_vars=load_params(d / "s3.npz"))
            if campplus is None and (d / "campplus.onnx").exists():
                campplus = str(d / "campplus.onnx")
        self.pipeline = pipeline
        self.cfg = pipeline.cfg
        self.sample_rate = self.cfg.sample_rate
        self.frontend = Frontend(tokenizer_path)
        self.spk2info: dict[str, dict] = {}
        self._stream_sess: Optional[StreamingSession] = None
        # campplus x-vector path: the reference's non-speaker-encoder
        # conditioning (frontend.py:104-113, campplus.onnx via ORT) —
        # here a native JAX port (models/campplus.py)
        self._campplus = None
        if campplus is not None:
            self._load_campplus(campplus)

    def _load_campplus(self, path: str):
        import jax.numpy as jnp

        from minimax_speech_tpu.models.campplus import (CAMPPlus,
                                                        CAMPPlusConfig)
        from minimax_speech_tpu.utils import convert
        if str(path).endswith(".onnx"):
            from minimax_speech_tpu.utils.onnx_reader import \
                read_onnx_initializers
            state = read_onnx_initializers(path)
        else:
            import torch
            raw = torch.load(path, map_location="cpu")
            state = {k: v.numpy() for k, v in raw.items()}
        variables = convert.campplus_params(state)
        model = CAMPPlus(CAMPPlusConfig())
        self._campplus = jax.jit(lambda feat: model.apply(variables, feat))

    def xvector(self, prompt_speech_16k: np.ndarray) -> np.ndarray:
        """(T,) 16 kHz audio -> (1, 192) campplus x-vector
        (reference: _extract_spk_embedding frontend.py:104-113:
        kaldi fbank, per-utterance mean subtraction, campplus)."""
        import jax.numpy as jnp

        from minimax_speech_tpu.ops.kaldi_fbank import kaldi_fbank
        feat = kaldi_fbank(jnp.asarray(prompt_speech_16k, jnp.float32))
        feat = feat - feat.mean(axis=0, keepdims=True)
        return np.asarray(self._campplus(feat[None]))

    # -- speaker cache (reference: frontend.py spk2info + cosyvoice.py:63-75)
    def add_zero_shot_spk(self, prompt_text: str,
                          prompt_speech_16k: np.ndarray, spk_id: str) -> bool:
        self.spk2info[spk_id] = self._prompt_features(prompt_speech_16k,
                                                      prompt_text)
        return True

    def save_spkinfo(self, path: str = "spk2info.npz"):
        flat = {}
        for sid, info in self.spk2info.items():
            for k, v in info.items():
                flat[f"{sid}||{k}"] = np.asarray(v)
        np.savez(path, **flat)

    def load_spkinfo(self, path: str):
        data = np.load(path, allow_pickle=False)
        for key in data.files:
            sid, k = key.split("||")
            self.spk2info.setdefault(sid, {})[k] = data[key]

    def list_available_spks(self):
        return list(self.spk2info)

    # -- prompt feature extraction -------------------------------------------
    def _prompt_features(self, prompt_speech_16k: np.ndarray,
                         prompt_text: str = "") -> dict:
        p = self.pipeline
        audio24 = _resample(prompt_speech_16k, 16000, 24000)
        prompt_tokens = p.extract_prompt_tokens(
            prompt_speech_16k.astype(np.float32))
        prompt_mel = p.extract_prompt_mel(audio24)
        prompt_feat = (p.extract_prompt_latent(audio24)
                       if self.cfg.output_type == "latent" else prompt_mel)
        if self._campplus is not None and not self.cfg.flow.use_speaker_encoder:
            # x-vector conditioning from raw audio (the reference's
            # non-speaker-encoder path, frontend.py:104-113)
            import jax.numpy as jnp
            xv = self.xvector(prompt_speech_16k.astype(np.float32))
            flow_emb = xv / max(float(np.linalg.norm(xv)), 1e-12)
            lm_spk = np.asarray(p.lm.apply(
                p.lm_vars, jnp.asarray(flow_emb),
                method=type(p.lm).project_xvector))
            flow_emb = jnp.asarray(flow_emb)
        else:
            lm_spk, flow_emb = p.speaker_embedding(prompt_mel)
        ptext_tokens = (self.frontend.extract_text_tokens(prompt_text)
                        if prompt_text else np.zeros((0,), np.int32))
        return {"prompt_tokens": prompt_tokens, "prompt_feat": prompt_feat,
                "lm_spk": lm_spk, "flow_emb": flow_emb,
                "prompt_text_tokens": ptext_tokens}

    # -- synthesis core --------------------------------------------------------
    def _tts(self, text_pieces, info: dict, stream: bool, speed: float,
             key) -> Generator[dict, None, None]:
        p = self.pipeline
        for piece in text_pieces:
            # fresh randomness per piece (seed-deterministic): the
            # reference's torch RNG state advances across segments, so
            # reusing one key would correlate sampling between sentences
            key, piece_key = jax.random.split(key)
            text_tokens = self.frontend.extract_text_tokens(piece)
            start = time.time()
            if stream:
                # one session per TTS object: its jitted chunk programs
                # (and the chunked-flow caches' compiles) are reused
                # across pieces and calls
                if self._stream_sess is None:
                    self._stream_sess = StreamingSession(p)
                sess = self._stream_sess
                for chunk in sess.synthesize_stream(
                        text_tokens, info["prompt_text_tokens"],
                        info["prompt_tokens"], info["prompt_feat"],
                        info["lm_spk"], info["flow_emb"], key=piece_key):
                    wav = _speed_change(chunk.audio, speed)
                    dur = len(wav) / self.sample_rate
                    logging.info("yield speech len %.2f, rtf %.4f", dur,
                                 (time.time() - start) / max(dur, 1e-9))
                    yield {"tts_speech": wav[None, :]}
                    start = time.time()
            else:
                # fused single-dispatch path (LM+flow+vocoder in one program)
                wav = p.synthesize_fused(
                    text_tokens, info["prompt_text_tokens"],
                    info["prompt_tokens"], info["prompt_feat"],
                    info["lm_spk"], info["flow_emb"], key=piece_key)
                wav = _speed_change(wav, speed)
                dur = len(wav) / self.sample_rate
                logging.info("yield speech len %.2f, rtf %.4f", dur,
                             (time.time() - start) / max(dur, 1e-9))
                yield {"tts_speech": wav[None, :]}

    # -- public API (reference: cli/cosyvoice.py:92-215) ----------------------
    def inference_zero_shot(self, tts_text: str, prompt_text: str,
                            prompt_speech_16k: np.ndarray,
                            zero_shot_spk_id: str = "", stream: bool = False,
                            speed: float = 1.0, seed: int = 0):
        prompt_text_n = self.frontend.text_normalize(prompt_text,
                                                     split=False)[0]
        info = (self.spk2info[zero_shot_spk_id] if zero_shot_spk_id
                else self._prompt_features(prompt_speech_16k, prompt_text_n))
        pieces = self.frontend.text_normalize(tts_text, split=True)
        yield from self._tts(pieces, info, stream, speed,
                             jax.random.PRNGKey(seed))

    def inference_cross_lingual(self, tts_text: str,
                                prompt_speech_16k: np.ndarray,
                                zero_shot_spk_id: str = "",
                                stream: bool = False, speed: float = 1.0,
                                seed: int = 0):
        """Zero-shot without prompt text (reference: frontend_cross_lingual
        drops the prompt transcript, frontend.py:181-187)."""
        info = (self.spk2info[zero_shot_spk_id] if zero_shot_spk_id
                else self._prompt_features(prompt_speech_16k))
        info = {**info, "prompt_text_tokens": np.zeros((0,), np.int32)}
        pieces = self.frontend.text_normalize(tts_text, split=True)
        yield from self._tts(pieces, info, stream, speed,
                             jax.random.PRNGKey(seed))

    def inference_instruct2(self, tts_text: str, instruct_text: str,
                            prompt_speech_16k: np.ndarray,
                            zero_shot_spk_id: str = "", stream: bool = False,
                            speed: float = 1.0, seed: int = 0):
        """Instructed synthesis: the instruction replaces the prompt
        transcript and is terminated with <|endofprompt|>
        (reference: frontend_instruct2, frontend.py:196-203)."""
        info = (self.spk2info[zero_shot_spk_id] if zero_shot_spk_id
                else self._prompt_features(prompt_speech_16k))
        itoks = self.frontend.extract_text_tokens(
            instruct_text + "<|endofprompt|>")
        info = {**info, "prompt_text_tokens": itoks,
                # instruct2 drops the prompt speech tokens from the LM
                # context (frontend.py:199-200) but keeps flow prompts
                "prompt_tokens": np.zeros((0,), np.int32)}
        pieces = self.frontend.text_normalize(tts_text, split=True)
        yield from self._tts(pieces, info, stream, speed,
                             jax.random.PRNGKey(seed))

    def inference_vc(self, source_speech_16k: np.ndarray,
                     prompt_speech_16k: np.ndarray, stream: bool = False,
                     speed: float = 1.0, seed: int = 0):
        """Voice conversion: source FSQ tokens drive the flow directly with
        the prompt speaker's conditioning — the LM is bypassed
        (reference: frontend_vc frontend.py:205-215 + model.vc)."""
        p = self.pipeline
        info = self._prompt_features(prompt_speech_16k)
        source_tokens = p.extract_prompt_tokens(
            source_speech_16k.astype(np.float32))
        start = time.time()
        import jax.numpy as jnp
        from minimax_speech_tpu.infer.pipeline import next_bucket
        all_tokens = np.concatenate([info["prompt_tokens"], source_tokens])
        tl = len(all_tokens)
        pad = next_bucket(tl)
        buf = np.zeros((1, pad), np.int32)
        buf[0, :tl] = all_tokens
        feat = p._flow_infer(p.flow_vars, jnp.asarray(buf), jnp.array([tl]),
                             jnp.asarray(info["prompt_feat"])[None].astype(
                                 jnp.float32),
                             info["flow_emb"], p.noise)
        n_frames = (len(source_tokens)) * self.cfg.token_latent_ratio
        feat = np.asarray(feat)[:, :n_frames]
        wav = np.asarray(p._decode(p.codec_vars,
                                   jnp.asarray(feat))).reshape(-1)
        wav = _speed_change(wav, speed)
        dur = len(wav) / self.sample_rate
        logging.info("yield speech len %.2f, rtf %.4f", dur,
                     (time.time() - start) / max(dur, 1e-9))
        yield {"tts_speech": wav[None, :]}


def _speed_change(wav: np.ndarray, speed: float) -> np.ndarray:
    """Linear-resample speed change (reference uses torchaudio speed,
    cli/model.py:305-311; non-streaming only there as well)."""
    if speed == 1.0:
        return wav
    n = int(round(len(wav) / speed))
    return np.interp(np.linspace(0, 1, n, endpoint=False),
                     np.linspace(0, 1, len(wav), endpoint=False),
                     wav).astype(np.float32)
