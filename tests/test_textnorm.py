"""Text normalization (EN + ZH) and the whisper-style tiktoken tokenizer
(VERDICT round-1 item #7: real text frontend).

Behaviors mirror wetext/inflect (reference:
speech/cosyvoice/cli/frontend.py:121-149, utils/frontend_utils.py).
"""
import base64

import numpy as np
import pytest

from minimax_speech_tpu.infer import frontend as fe
from minimax_speech_tpu.infer import textnorm as tn


# ------------------------------------------------------------------- English
def test_en_integers_and_commas():
    assert tn.normalize_en("I saw 1,234 birds") == \
        "I saw one thousand two hundred thirty four birds"


def test_en_decimals():
    assert "three point one four" in tn.normalize_en("pi is 3.14")


def test_en_ordinals():
    out = tn.normalize_en("the 1st, 2nd, 3rd, 12th and 22nd")
    for w in ("first", "second", "third", "twelfth", "twenty-second"):
        assert w in out


def test_en_currency():
    assert tn.normalize_en("it costs $5.20 now") == \
        "it costs five dollars and twenty cents now"
    assert "one dollar" in tn.normalize_en("$1 only")
    assert "ten pounds" in tn.normalize_en("£10")


def test_en_percent_and_time():
    assert "fifty percent" in tn.normalize_en("50% off")
    assert "three fifteen" in tn.normalize_en("at 3:15 pm")
    assert "nine o'clock" in tn.normalize_en("at 9:00")
    assert "nine oh five" in tn.normalize_en("at 9:05")


def test_en_negative():
    assert "minus four" in tn.normalize_en("it was -4 degrees")


def test_en_no_digits_remain():
    out = tn.normalize_en("Call 555-0199 on 3/4 at 12:30, pay $1,000.50!")
    assert not any(c.isdigit() for c in out)


# ------------------------------------------------------------------- Chinese
def test_zh_numbers():
    assert tn.spell_number_zh(0) == "零"
    assert tn.spell_number_zh(10) == "十"
    assert tn.spell_number_zh(14) == "十四"
    assert tn.spell_number_zh(123) == "一百二十三"
    assert tn.spell_number_zh(1005) == "一千零五"
    assert tn.spell_number_zh(10000) == "一万"
    assert tn.spell_number_zh(100000001) == "一亿零一"
    assert tn.spell_number_zh(-7) == "负七"


def test_zh_normalize_sentence():
    out = tn.normalize_zh("我有123个苹果")
    assert out == "我有一百二十三个苹果"


def test_zh_percent_currency_year_time():
    assert "百分之五十" in tn.normalize_zh("涨了50%")
    assert "十元" in tn.normalize_zh("只要¥10")
    assert "二零二四年" in tn.normalize_zh("2024年的事")
    assert "三点十五分" in tn.normalize_zh("下午3:15见")


def test_zh_decimal():
    assert "三点一四" in tn.normalize_zh("约为3.14")


def test_zh_cleanups():
    # blank removal between zh chars, kept between ascii words
    assert tn.replace_blank("你 好 ab cd") == "你好ab cd"
    assert tn.replace_corner_mark("5平方米 x²") == "5平方米 x平方"
    assert tn.normalize_zh("（你好）呀，") .endswith("。")
    assert "。" in tn.normalize_zh("你好.")


def test_contains_chinese_routing():
    assert tn.contains_chinese("你好 world")
    assert not tn.contains_chinese("hello world")
    # Frontend routes languages
    f = fe.Frontend()
    zh = f.text_normalize("我有3只猫。", split=True)
    assert zh == ["我有三只猫。"]
    en = f.text_normalize("I have 3 cats.", split=True)
    assert en == ["I have three cats."]


def test_zh_split_paragraph_char_budget():
    text = "这是一个句子。" * 30
    chunks = fe.split_paragraph(text, lambda s: list(s), lang="zh",
                                token_max_n=40, token_min_n=20, merge_len=10)
    assert len(chunks) > 1
    assert "".join(chunks) == text
    assert all(len(c) <= 48 for c in chunks)


def test_is_only_punctuation():
    assert tn.is_only_punctuation("。，！")
    assert tn.is_only_punctuation(" ... ")
    assert not tn.is_only_punctuation("嗯。")


# ----------------------------------------------------------- tiktoken asset
@pytest.fixture
def tiny_asset(tmp_path):
    """Minimal valid .tiktoken asset: 256 byte tokens + a few merges."""
    ranks = {bytes([i]): i for i in range(256)}
    merges = [b"he", b"ll", b"llo", b"hello", b" w", b" wo", b" wor",
              b" worl", b" world"]
    # each merge must split into two existing tokens (tiktoken invariant):
    # he = h+e, ll = l+l, llo = ll+o, hello = he+llo, ...
    for i, m in enumerate(merges):
        ranks[m] = 256 + i
    path = tmp_path / "tiny.tiktoken"
    with open(path, "w") as f:
        for token, rank in ranks.items():
            f.write(base64.b64encode(token).decode() + " " + str(rank) + "\n")
    return str(path)


def test_whisper_tokenizer_roundtrip(tiny_asset):
    from minimax_speech_tpu.infer.whisper_tokenizer import WhisperTikTokenizer
    tok = WhisperTikTokenizer(tiny_asset)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # merges actually applied
    assert len(ids) < len("hello world")


def test_whisper_tokenizer_specials(tiny_asset):
    from minimax_speech_tpu.infer.whisper_tokenizer import WhisperTikTokenizer
    tok = WhisperTikTokenizer(tiny_asset)
    sid = tok.special_tokens["<|endoftext|>"]
    ids = tok.encode("hello<|endoftext|>")
    assert ids[-1] == sid
    assert tok.decode(ids) == "hello"                   # specials skipped
    assert "<|endoftext|>" in tok.decode(ids, skip_special=False)
    # the TTS vocal + timestamp specials registered
    # (reference: tokenizer/tokenizer.py:179-196)
    assert "<|TTS/B|>" in tok.special_tokens
    assert "<|30.00|>" in tok.special_tokens


def test_whisper_tokenizer_pure_python_matches_tiktoken(tiny_asset):
    from minimax_speech_tpu.infer import whisper_tokenizer as wt
    tok = wt.WhisperTikTokenizer(tiny_asset)
    if tok._enc is None:
        pytest.skip("tiktoken not installed; nothing to cross-check")
    texts = ["hello world", "hello<|endoftext|> world", "héllo!",
             "a b  c\nhello"]
    for t in texts:
        fast = tok._enc.encode(t, allowed_special="all")
        # force the pure-python path
        slow = []
        pos = 0
        import re
        spat = re.compile("|".join(
            re.escape(s) for s in sorted(tok.special_tokens,
                                         key=len, reverse=True)))
        import regex
        pat = regex.compile(wt.PAT_STR)
        for m in spat.finditer(t):
            for piece in pat.findall(t[pos:m.start()]):
                slow.extend(wt._bpe_merge(tok.ranks, piece.encode()))
            slow.append(tok.special_tokens[m.group(0)])
            pos = m.end()
        for piece in pat.findall(t[pos:]):
            slow.extend(wt._bpe_merge(tok.ranks, piece.encode()))
        assert slow == fast, t


def test_frontend_tiktoken_asset_path(tiny_asset):
    f = fe.Frontend(token_path=tiny_asset)
    toks = f.extract_text_tokens("hello world")
    assert toks.dtype == np.int32 and len(toks) > 0


# ------------------------------------------------- real reference asset
REF_ASSET = ("/root/reference/speech/cosyvoice/tokenizer/assets/"
             "multilingual_zh_ja_yue_char_del.tiktoken")


@pytest.mark.skipif(not __import__("os").path.exists(REF_ASSET),
                    reason="reference tiktoken asset not mounted")
def test_real_tiktoken_asset_loads_and_tokenizes():
    """Load the reference's released multilingual tiktoken asset
    (read-only data; tokenizer/tokenizer.py:169-206) and check the real
    specials + zh/en round trips."""
    from minimax_speech_tpu.infer.whisper_tokenizer import WhisperTikTokenizer
    tok = WhisperTikTokenizer(REF_ASSET)
    assert "<|startoftranscript|>" in tok.special_tokens
    assert "<|TTS/B|>" in tok.special_tokens
    sid = tok.special_tokens["<|startoftranscript|>"]
    ids = tok.encode("hello<|startoftranscript|>")
    assert ids[-1] == sid
    f = fe.Frontend(token_path=REF_ASSET)
    zh = f.extract_text_tokens("你好，世界。")
    assert len(zh) > 0
    assert tok.decode(list(zh)).startswith("你好")


def test_instruct2_endofprompt_with_real_hf_tokenizer(tmp_path):
    """VERDICT round-1 weak #6: the <|endofprompt|> suffix appended by
    inference_instruct2 (infer/api.py:237) must land as exactly ONE
    special id through a real HF fast tokenizer (the QwenTokenizer path,
    frontend.py:109-127 — built offline here with the same
    byte-level-BPE shape as Qwen\'s)."""
    import json
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from tokenizers import trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(
        ["speak slowly and softly please hello world"], trainer)
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "PreTrainedTokenizerFast"}))

    f = fe.Frontend(token_path=str(tmp_path))
    sid = f.tokenizer.tokenizer.convert_tokens_to_ids("<|endofprompt|>")
    toks = f.extract_text_tokens("Speak slowly and softly.<|endofprompt|>")
    assert toks[-1] == sid
    assert (toks == sid).sum() == 1
    plain = f.extract_text_tokens("Speak slowly and softly.")
    assert sid not in plain
    # every reference TTS special registers as a single id
    for s in ("[breath]", "[laughter]", "<|im_start|>"):
        tid = f.tokenizer.tokenizer.convert_tokens_to_ids(s)
        seq = f.extract_text_tokens(f"hello {s} world")
        assert (seq == tid).sum() == 1
