"""Text frontend: normalization, sentence splitting, tokenization.

Replaces CosyVoiceFrontEnd's text path (reference:
speech/cosyvoice/cli/frontend.py:39-215 + utils/frontend_utils.py):
  * text normalization — the reference uses ttsfrd (C++) or
    wetext+inflect; both are unavailable here, so we implement the same
    observable behaviors natively (number spell-out, punctuation
    unification, blank collapsing) and keep the interface pluggable.
  * paragraph splitting by token count with sentence-boundary snapping
    (reference: frontend_utils.py split_paragraph semantics).
  * tokenizer: HF AutoTokenizer when a Qwen path is given (the
    reference's QwenTokenizer with TTS special tokens,
    tokenizer/tokenizer.py:241-279); a deterministic byte-level
    fallback otherwise so the pipeline runs hermetically.
"""
from __future__ import annotations

import re
from typing import Iterable, Optional

# TTS special tokens the reference adds to the Qwen tokenizer
# (reference: tokenizer/tokenizer.py:248-266)
SPECIAL_TOKENS = [
    "<|im_start|>", "<|im_end|>", "<|endofprompt|>",
    "[breath]", "<strong>", "</strong>", "[noise]", "[laughter]",
    "[cough]", "[clucking]", "[accent]", "[quick_breath]",
    "<laughter>", "</laughter>", "[hissing]", "[sigh]", "[vocalized-noise]",
    "[lipsmack]", "[mm]",
]

from minimax_speech_tpu.infer.textnorm import (contains_chinese,
                                               is_only_punctuation,
                                               normalize_en, normalize_zh,
                                               spell_number)


def normalize_text(text: str) -> str:
    """Language-routed normalization (reference: frontend.py:121-149):
    zh branch when the text contains Chinese characters, else the
    English wetext/inflect-equivalent path."""
    if contains_chinese(text):
        return normalize_zh(text)
    return normalize_en(text)


def split_paragraph(text: str, tokenize, lang: str = "en",
                    token_max_n: int = 80, token_min_n: int = 60,
                    merge_len: int = 20,
                    comma_split: bool = False) -> list[str]:
    """Sentence-boundary splitting with max/min token budgets and
    short-tail merging (reference: utils/frontend_utils.py:65-120):
    zh counts characters and splits on zh+latin punctuation; en counts
    tokens and splits on latin sentence punctuation. Closing quotes
    attach to the preceding sentence."""
    if lang == "zh":
        pounc = ["。", "？", "！", "；", "：", "、", ".", "?", "!", ";"]
    else:
        pounc = [".", "?", "!", ";", ":"]
    if comma_split:
        pounc.extend(["，", ","])
    if not text:
        return []
    if text[-1] not in pounc:
        text += "。" if lang == "zh" else "."

    def length(s: str) -> int:
        return len(s) if lang == "zh" else len(tokenize(s))

    utts, st = [], 0
    i = 0
    while i < len(text):
        c = text[i]
        if c in pounc:
            if len(text[st:i]) > 0:
                utts.append(text[st:i] + c)
            if i + 1 < len(text) and text[i + 1] in ['"', "”"]:
                if utts:
                    utts[-1] = utts[-1] + text[i + 1]
                st = i + 2
            else:
                st = i + 1
        i += 1

    final, cur = [], ""
    for utt in utts:
        if length(cur + utt) > token_max_n and length(cur) > token_min_n:
            final.append(cur)
            cur = ""
        cur = cur + utt
    if cur:
        if length(cur) < merge_len and final:
            final[-1] = final[-1] + cur
        else:
            final.append(cur)
    return [u.strip() for u in final if u.strip()]


class ByteTokenizer:
    """Hermetic fallback: UTF-8 bytes + 1 (0 reserved for padding)."""
    vocab_size = 257

    def encode(self, text: str, **kw) -> list[int]:
        return [b + 1 for b in text.encode("utf-8")]

    def decode(self, ids: Iterable[int]) -> str:
        return bytes(i - 1 for i in ids if i > 0).decode("utf-8", "ignore")


class QwenTokenizer:
    """HF AutoTokenizer with the reference's TTS special tokens
    (reference: tokenizer/tokenizer.py:241-279)."""

    def __init__(self, token_path: str, skip_special_tokens: bool = True):
        from transformers import AutoTokenizer
        special = {"eos_token": "<|endoftext|>", "pad_token": "<|endoftext|>",
                   "additional_special_tokens": SPECIAL_TOKENS}
        self.tokenizer = AutoTokenizer.from_pretrained(token_path)
        self.tokenizer.add_special_tokens(special)
        self.skip_special_tokens = skip_special_tokens

    def encode(self, text: str, **kw) -> list[int]:
        return self.tokenizer([text], return_tensors="np")["input_ids"][0].tolist()

    def decode(self, ids) -> str:
        return self.tokenizer.batch_decode(
            [list(ids)], skip_special_tokens=self.skip_special_tokens)[0]


def get_tokenizer(token_path: Optional[str] = None):
    """token_path: HF Qwen dir -> QwenTokenizer; a .tiktoken asset ->
    WhisperTikTokenizer (reference: tokenizer/tokenizer.py:169-236);
    None -> hermetic byte fallback."""
    if token_path and str(token_path).endswith(".tiktoken"):
        from minimax_speech_tpu.infer.whisper_tokenizer import \
            WhisperTikTokenizer
        return WhisperTikTokenizer(token_path)
    if token_path:
        return QwenTokenizer(token_path)
    return ByteTokenizer()


class Frontend:
    """normalize -> split -> tokenize; mirrors
    CosyVoiceFrontEnd.text_normalize (reference: frontend.py:121-149)."""

    def __init__(self, token_path: Optional[str] = None):
        self.tokenizer = get_tokenizer(token_path)

    def text_normalize(self, text: str, split: bool = True) -> list[str]:
        """Always returns a list; [normalized] when split=False."""
        if text == "":
            return [text]
        if contains_chinese(text):
            norm = normalize_zh(text)
            lang = "zh"
        else:
            norm = normalize_en(text)
            lang = "en"
        if not split:
            return [norm]
        texts = split_paragraph(norm, self.tokenizer.encode, lang=lang)
        return [t for t in texts if not is_only_punctuation(t)]

    def extract_text_tokens(self, text: str):
        import numpy as np
        return np.asarray(self.tokenizer.encode(text), np.int32)
