"""Long-form synthesis (serving/longform.py): sentence splitting and
batched piece assembly — removes the reference's decoder frame cap on
total audio length (reference: README.md:82-89)."""

import numpy as np
import pytest

from nspeech_tpu.serving import DynamicBatcher, split_text, synthesize_long
from tests.test_batcher import FakeSynth


def test_split_sentences_keep_punctuation():
    text = "First sentence. Second one!  Third?\nFourth; and fifth."
    assert split_text(text) == [
        "First sentence.", "Second one!", "Third?", "Fourth;",
        "and fifth."]


def test_split_long_sentence_at_clauses_then_words():
    clausey = ("alpha bravo charlie delta, echo foxtrot golf hotel, "
               "india juliett kilo lima")
    pieces = split_text(clausey, max_chars=30)
    assert all(len(p) <= 30 for p in pieces)
    assert " ".join(pieces).replace(",", "") == clausey.replace(",", "")
    monster = "x" * 10 + " " + "y" * 12 + " " + "z" * 8
    pieces = split_text(monster, max_chars=15)
    assert pieces == ["x" * 10, "y" * 12, "z" * 8]  # never split a word
    assert split_text("   ") == []


def test_synthesize_long_orders_and_paces_pieces():
    fake = FakeSynth(delay=0.0)
    text = "Hi there. A much longer second sentence here!"
    wav = synthesize_long(fake, text, speaker_id=3, sample_rate=1000,
                          pause_ms=100)
    # FakeSynth returns 4 samples valued len(piece) per piece; one 100-sample
    # gap between the two pieces.
    assert len(wav) == 4 + 100 + 4
    assert wav[0] == len("Hi there.")
    assert np.all(wav[4:104] == 0)
    assert wav[104] == len("A much longer second sentence here!")
    assert fake.batch_sizes == [2]  # ONE batched program for all pieces


def test_synthesize_long_through_dynamic_batcher():
    fake = FakeSynth(delay=0.0)
    b = DynamicBatcher(fake, max_batch=4, window_ms=1)
    wav = synthesize_long(b, "One. Two. Three.", sample_rate=1000,
                          pause_ms=50)
    b.close()
    assert len(wav) == 3 * 4 + 2 * 50
    with pytest.raises(ValueError, match="text"):
        synthesize_long(fake, "  ", sample_rate=1000)
    with pytest.raises(ValueError, match="sample_rate"):
        synthesize_long(fake, "Hello.")
