"""Whisper-style tiktoken tokenizer with the reference's TTS specials.

Mirrors speech/cosyvoice/tokenizer/tokenizer.py:169-236: a byte-level
BPE over a `.tiktoken` asset (base64 token + rank per line) extended
with the whisper language/audio-event/emotion/TTS-vocal special tokens
and 1501 timestamp tokens. The reference ships the
`multilingual_zh_ja_yue_char_del.tiktoken` asset; any asset with the
same line format loads here.

Uses the `tiktoken` package when importable; otherwise a pure-Python
byte-pair encoder over the same ranks (identical output, slower) so the
framework stays hermetic.
"""
from __future__ import annotations

import base64
from functools import lru_cache
from typing import Dict, List

# reference: tokenizer/tokenizer.py:24-139 (whisper language list)
LANGUAGES = [
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue", "minnan", "wuyu", "dialect", "zh/en", "en/zh"]
AUDIO_EVENTS = ["ASR", "AED", "SER", "Speech", "/Speech", "BGM", "/BGM",
                "Laughter", "/Laughter", "Applause", "/Applause"]
EMOTIONS = ["HAPPY", "SAD", "ANGRY", "NEUTRAL"]
TTS_VOCAL = (["TTS/B", "TTS/O", "TTS/Q", "TTS/A", "TTS/CO", "TTS/CL",
              "TTS/H"] + [f"TTS/SP{i:02d}" for i in range(1, 14)])

PAT_STR = (r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"""
           r"""| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


def special_token_list(num_languages: int = 99) -> List[str]:
    """reference: tokenizer/tokenizer.py:179-196."""
    return (["<|endoftext|>", "<|startoftranscript|>"]
            + [f"<|{lang}|>" for lang in LANGUAGES[:num_languages]]
            + [f"<|{ev}|>" for ev in AUDIO_EVENTS]
            + [f"<|{em}|>" for em in EMOTIONS]
            + ["<|translate|>", "<|transcribe|>", "<|startoflm|>",
               "<|startofprev|>", "<|nospeech|>", "<|notimestamps|>"]
            + [f"<|SPECIAL_TOKEN_{i}|>" for i in range(1, 31)]
            + [f"<|{t}|>" for t in TTS_VOCAL]
            + [f"<|{i * 0.02:.2f}|>" for i in range(1501)])


def load_ranks(asset_path: str) -> Dict[bytes, int]:
    """Parse a .tiktoken asset: 'base64token rank' per line."""
    ranks = {}
    with open(asset_path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            token, rank = line.split()
            ranks[base64.b64decode(token)] = int(rank)
    return ranks


def _bpe_merge(ranks: Dict[bytes, int], piece: bytes) -> List[int]:
    """Pure-Python byte-pair merge by ascending rank (tiktoken
    semantics)."""
    parts = [piece[i: i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best, best_rank = None, None
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        parts = (parts[:best] + [parts[best] + parts[best + 1]]
                 + parts[best + 2:])
    out = []
    for p in parts:
        if p in ranks:
            out.append(ranks[p])
        else:  # unmergeable byte sequence: fall back per byte
            out.extend(ranks.get(p[i: i + 1], 0) for i in range(len(p)))
    return out


class WhisperTikTokenizer:
    """Byte-level BPE + specials; `allowed_special="all"` semantics for
    encode (the reference passes allowed_special into tokenizer.encode,
    frontend.py:137-141)."""

    def __init__(self, asset_path: str, num_languages: int = 99):
        self.ranks = load_ranks(asset_path)
        n = len(self.ranks)
        self.special_tokens = {t: n + i for i, t in
                               enumerate(special_token_list(num_languages))}
        self.vocab_size = n + len(self.special_tokens)
        self._decode_map = {v: k for k, v in self.ranks.items()}
        self._special_by_id = {v: k for k, v in self.special_tokens.items()}
        try:
            import tiktoken
            self._enc = tiktoken.Encoding(
                name="whisper_tts", explicit_n_vocab=self.vocab_size,
                pat_str=PAT_STR, mergeable_ranks=self.ranks,
                special_tokens=self.special_tokens)
        except Exception:
            self._enc = None
            import regex
            self._pat = regex.compile(PAT_STR)
            import re
            self._special_pat = re.compile("|".join(
                re.escape(t) for t in sorted(self.special_tokens,
                                             key=len, reverse=True)))

    @lru_cache(maxsize=4096)
    def _encode_piece(self, piece: str) -> tuple:
        b = piece.encode("utf-8")
        if b in self.ranks:
            return (self.ranks[b],)
        return tuple(_bpe_merge(self.ranks, b))

    def encode(self, text: str, allowed_special="all") -> List[int]:
        if self._enc is not None:
            return self._enc.encode(text, allowed_special="all"
                                    if allowed_special else set())
        out: List[int] = []
        pos = 0
        for m in self._special_pat.finditer(text):
            out.extend(self._encode_ordinary(text[pos: m.start()]))
            out.append(self.special_tokens[m.group(0)])
            pos = m.end()
        out.extend(self._encode_ordinary(text[pos:]))
        return out

    def _encode_ordinary(self, text: str) -> List[int]:
        out: List[int] = []
        for piece in self._pat.findall(text):
            out.extend(self._encode_piece(piece))
        return out

    def decode(self, ids, skip_special: bool = True) -> str:
        if self._enc is not None and not skip_special:
            return self._enc.decode(list(ids))
        chunks = []
        for i in ids:
            if i in self._special_by_id:
                if not skip_special:
                    chunks.append(self._special_by_id[i].encode())
            else:
                chunks.append(self._decode_map.get(i, b""))
        return b"".join(chunks).decode("utf-8", "replace")
