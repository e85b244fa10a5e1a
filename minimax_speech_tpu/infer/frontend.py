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

_ONES = ("zero one two three four five six seven eight nine ten eleven "
         "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
         "nineteen").split()
_TENS = ("zero ten twenty thirty forty fifty sixty seventy eighty "
         "ninety").split()


def spell_number(n: int) -> str:
    if n < 0:
        return "minus " + spell_number(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        return _TENS[n // 10] + ("" if n % 10 == 0 else " " + _ONES[n % 10])
    for div, name in ((10 ** 9, "billion"), (10 ** 6, "million"),
                      (10 ** 3, "thousand"), (100, "hundred")):
        if n >= div:
            rest = n % div
            head = spell_number(n // div) + " " + name
            return head if rest == 0 else head + " " + spell_number(rest)
    return _ONES[0]


def normalize_text(text: str) -> str:
    """English-oriented normalization mirroring the wetext/inflect path:
    spell out integers, unify punctuation, collapse whitespace."""
    text = text.strip()
    text = text.replace("“", '"').replace("”", '"')
    text = text.replace("‘", "'").replace("’", "'")
    text = re.sub(r"(\d+)", lambda m: " " + spell_number(int(m.group(1)))
                  + " ", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


_SENT_SPLIT = re.compile(r"(?<=[.!?。！？;；])\s*")


def split_paragraph(text: str, tokenize, token_max_n: int = 80,
                    token_min_n: int = 60, merge_len: int = 20,
                    comma_split: bool = False) -> list[str]:
    """Split text into chunks of <= token_max_n tokens at sentence
    boundaries, merging short tails
    (reference: utils/frontend_utils.py:65-120 semantics)."""
    sents = [s for s in _SENT_SPLIT.split(text) if s.strip()]
    if comma_split:
        expanded = []
        for s in sents:
            expanded.extend(p for p in re.split(r"(?<=[,，])\s*", s) if p)
        sents = expanded
    chunks, cur, cur_n = [], "", 0
    for s in sents:
        n = len(tokenize(s))
        if cur and cur_n + n > token_max_n:
            chunks.append(cur.strip())
            cur, cur_n = "", 0
        cur += (" " if cur else "") + s
        cur_n += n
    if cur:
        if chunks and cur_n < merge_len:
            chunks[-1] = chunks[-1] + " " + cur.strip()
        else:
            chunks.append(cur.strip())
    return chunks


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
    if token_path:
        return QwenTokenizer(token_path)
    return ByteTokenizer()


class Frontend:
    """normalize -> split -> tokenize; mirrors
    CosyVoiceFrontEnd.text_normalize (reference: frontend.py:121-149)."""

    def __init__(self, token_path: Optional[str] = None):
        self.tokenizer = get_tokenizer(token_path)

    def text_normalize(self, text: str, split: bool = True) -> list[str]:
        text = normalize_text(text)
        if not split:
            return [text]
        return split_paragraph(text, self.tokenizer.encode)

    def extract_text_tokens(self, text: str):
        import numpy as np
        return np.asarray(self.tokenizer.encode(text), np.int32)
