"""Text frontend unit tests (SURVEY.md §4.1 oracle set)."""

import pytest

from nspeech_tpu.text import sequence_to_text, text_to_sequence
from nspeech_tpu.text.cleaners import (
    basic_cleaners,
    convert_to_ascii,
    english_cleaners,
    transliteration_cleaners,
)
from nspeech_tpu.text.numbers import normalize_numbers, number_to_words, ordinal_to_words
from nspeech_tpu.text.symbols import EOS_ID, PAD_ID, symbols


pytestmark = pytest.mark.smoke  # fast contract tests


CLEANERS = ["english_cleaners"]


def test_symbol_table_contract():
    # 2 specials + 63 chars + 84 arpabet = 149 (reference: symbols.py:9-17)
    assert len(symbols) == 149
    assert symbols[0] == "_" and symbols[1] == "~"
    assert PAD_ID == 0 and EOS_ID == 1
    assert symbols[2] == "A" and "@AA1" in symbols and "@ZH" in symbols
    assert len(set(symbols)) == len(symbols)


def test_text_to_sequence_appends_eos():
    seq = text_to_sequence("hi", CLEANERS)
    assert seq[-1] == EOS_ID
    assert len(seq) == 3


def test_round_trip_plain():
    text = "the quick brown fox."
    seq = text_to_sequence(text, CLEANERS)
    assert sequence_to_text(seq[:-1]) == text


def test_arpabet_curly_braces():
    seq = text_to_sequence("turn {HH AW1 S} left", CLEANERS)
    out = sequence_to_text(seq[:-1])
    assert out == "turn {HH AW1 S} left"


def test_unknown_symbols_dropped():
    # '#' and '%' are not in the symbol set; basic_cleaners keeps them,
    # _keep drops them at id-mapping time.
    seq = text_to_sequence("a#b", ["basic_cleaners"])
    assert sequence_to_text(seq[:-1]) == "ab"


def test_cleaners_basic():
    assert basic_cleaners("Hello   World\t!") == "hello world !"
    assert transliteration_cleaners("Héllo  Wörld") == "hello world"
    assert convert_to_ascii("café naïve £ test — ok’s") == "cafe naive  test - ok's"


def test_english_cleaners_abbreviations():
    assert english_cleaners("Dr. Smith met Mr. Jones.") == "doctor smith met mister jones."
    assert english_cleaners("Mrs. Doe") == "misess doe"


def test_number_to_words_small():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(15) == "fifteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(101) == "one hundred and one"
    assert number_to_words(101, andword="") == "one hundred one"
    assert number_to_words(999) == "nine hundred and ninety-nine"


def test_number_to_words_scales():
    assert number_to_words(1000, andword="") == "one thousand"
    assert number_to_words(1234567, andword="") == (
        "one million, two hundred thirty-four thousand, five hundred sixty-seven"
    )


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(5) == "fifth"
    assert ordinal_to_words(9) == "ninth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty-first"
    assert ordinal_to_words(100) == "one hundredth"


def test_normalize_numbers_years():
    # Year-style reading (reference: numbers.py:47-57)
    assert normalize_numbers("in 1901") == "in nineteen oh one"
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("in 2000") == "in two thousand"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("in 2026") == "in twenty twenty-six"
    assert normalize_numbers("in 1800") == "in eighteen hundred"


def test_normalize_numbers_money():
    # Money expansion leaves digits that the final number pass expands.
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("$5") == "five dollars"
    assert normalize_numbers("$0.01") == "one cent"
    assert normalize_numbers("£20") == "twenty pounds"
    assert english_cleaners("$1.50") == "one dollar, fifty cents"


def test_normalize_numbers_misc():
    # 1234 lands in the 1000-3000 year-style range (reference: numbers.py:49).
    assert normalize_numbers("1,234 things") == "twelve thirty-four things"
    assert normalize_numbers("5,678 things") == (
        "five thousand, six hundred seventy-eight things"
    )
    assert normalize_numbers("3.14 pie") == "three point fourteen pie"
    assert normalize_numbers("21st place") == "twenty-first place"


def test_config_load_parse():
    from nspeech_tpu.config import debug_string, load_config, stft_params

    cfg = load_config("taco1")
    assert cfg.num_mels == 80 and cfg.num_freq == 1025
    assert cfg.sample_rate == 20000
    assert cfg.outputs_per_step == 5
    assert cfg.encoder_prenet == [256, 128]
    assert cfg.adam["beta1"] == 0.9
    assert stft_params(cfg) == (2048, 250, 1000)
    cfg.parse("batch_size=8,attention_type=luong")
    assert cfg.batch_size == 8 and cfg.attention_type == "luong"
    assert "Hyperparameters:" in debug_string(cfg)
    # unknown key rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cfg.parse("not_a_key=1")
    # startup mutation contract (reference: train.py:45)
    cfg.num_speakers = 7
    assert cfg.num_speakers == 7


def test_config_all_models_load():
    from nspeech_tpu.config import load_config

    for model in ["taco1", "taco2", "wavenet", "simple_wavenet"]:
        cfg = load_config(model)
        assert cfg.sample_rate == 20000
        assert cfg.batch_size == 32
