"""Matcha text frontend + standalone CLI (reference:
speech/matcha/text/* and cli.py)."""
import json
import os

import numpy as np
import pytest

from minimax_speech_tpu.infer import matcha_text as mt


def test_symbol_table_matches_reference():
    # keithito tacotron table: pad + punct + letters + IPA = 178 symbols
    assert len(mt.symbols) == 178
    assert mt.symbols[0] == "_"
    assert mt.SPACE_ID == mt.symbols.index(" ")
    # round trip
    seq = mt.text_to_sequence("hello world!", ["basic_cleaners"])
    assert mt.sequence_to_text(seq) == "hello world!"


def test_intersperse():
    assert mt.intersperse([5, 9], 0) == [0, 5, 0, 9, 0]
    seq, phones = mt.process_text("ab", cleaners=("basic_cleaners",))
    assert seq[0::2] == [0] * (len(seq) // 2 + 1)
    assert phones[1::2] == "ab"


def test_cleaners():
    assert mt.basic_cleaners("Hello   WORLD") == "hello world"
    assert mt.transliteration_cleaners("café") == "cafe"
    out = mt.english_cleaners2("Dr. Smith owes $5.")
    assert "doctor" in out
    assert "five dollars" in out
    assert "$" not in out and "5" not in out
    # expanded text must be fully representable in the symbol table
    seq = mt.text_to_sequence("Mrs. Jones, 3rd st. £2 1,000",
                              ["english_cleaners2"])
    assert len(seq) > 0
    assert all(0 <= i < len(mt.symbols) for i in seq)


@pytest.mark.slow
def test_matcha_cli_end_to_end(tmp_path):
    from minimax_speech_tpu.cli import matcha as cli
    out = tmp_path / "out"
    cli.main(["--text", "Hi there.", "--output_folder", str(out),
              "--random_init", "--steps", "2", "--max_frames", "64",
              "--hidden", "32", "--n_layers", "1"])
    assert (out / "utterance_000.wav").exists()
    assert (out / "utterance_000_mel.npy").exists()
    mel = np.load(out / "utterance_000_mel.npy")
    assert mel.shape[1] == 80 and np.isfinite(mel).all()


@pytest.mark.slow
def test_matcha_cli_batched(tmp_path):
    from minimax_speech_tpu.cli import matcha as cli
    f = tmp_path / "texts.txt"
    f.write_text("one.\ntwo.\nthree.\n")
    out = tmp_path / "out"
    cli.main(["--file", str(f), "--output_folder", str(out), "--batched",
              "--batch_size", "3", "--random_init", "--steps", "2",
              "--max_frames", "64", "--hidden", "32", "--n_layers", "1"])
    wavs = [x for x in os.listdir(out) if x.endswith(".wav")]
    assert len(wavs) == 3
