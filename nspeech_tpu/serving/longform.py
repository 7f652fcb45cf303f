"""Long-form synthesis: texts beyond the decoder's frame cap.

The reference hard-caps synthesized audio at ``max_iters *
outputs_per_step`` decoder frames (~18.75 s at the shipped defaults) and
its README documents the shape errors long inputs cause, telling users to
raise ``max_iters`` (reference: README.md:82-89, tacotron.py:86). That
scales compiled-program size with the worst-case utterance. Long-form
serving instead splits the text at sentence boundaries, synthesizes all
pieces in ONE padded batch program (the batch buckets the synthesizer
already compiles), and joins the endpoint-trimmed pieces with short
pauses — arbitrary-length text through fixed-size programs.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

# Sentence-final punctuation (kept with the sentence). The reference's
# cleaners already normalize exotic whitespace/abbreviations upstream.
_SENTENCE_END = re.compile(r"(?<=[.!?;])\s+")
_CLAUSE_END = re.compile(r"(?<=[,:])\s+")

# Rough speech rate for sizing: ~14 chars/s of cleaned English text; the
# default decoder cap (300 * 2..5 frames at 12.5 ms) comfortably covers
# a 200-char piece.
DEFAULT_MAX_CHARS = 200


def split_text(text: str, max_chars: int = DEFAULT_MAX_CHARS) -> List[str]:
    """Split into synthesis pieces, each at most ``max_chars`` long:
    sentences first, then clauses, then word boundaries as a last resort.
    Never splits inside a word; pieces keep their punctuation."""
    pieces: List[str] = []
    for sentence in _SENTENCE_END.split(text.strip()):
        sentence = sentence.strip()
        if not sentence:
            continue
        if len(sentence) <= max_chars:
            pieces.append(sentence)
            continue
        for clause in _CLAUSE_END.split(sentence):
            clause = clause.strip()
            if len(clause) <= max_chars:
                if clause:
                    pieces.append(clause)
                continue
            words = clause.split()
            cur = ""
            for w in words:
                if cur and len(cur) + 1 + len(w) > max_chars:
                    pieces.append(cur)
                    cur = w
                else:
                    cur = (cur + " " + w) if cur else w
            if cur:
                pieces.append(cur)
    return pieces


def synthesize_long(
    synthesizer,
    text: str,
    speaker_id: int = -1,
    sample_rate: Optional[int] = None,
    pause_ms: float = 150.0,
    max_chars: int = DEFAULT_MAX_CHARS,
) -> np.ndarray:
    """Arbitrary-length text -> one waveform.

    ``synthesizer`` is anything with ``synthesize_batch(texts,
    speaker_ids) -> (wavs, mels, lins)`` (Synthesizer, TextToSpeech,
    ExportedSynthesizer, or a DynamicBatcher). Pieces are synthesized as
    one batch and joined with ``pause_ms`` of silence (the per-piece
    endpoint trim has already removed trailing decoder silence)."""
    pieces = split_text(text, max_chars)
    if not pieces:
        raise ValueError("no synthesizable text")
    rate = sample_rate or getattr(getattr(synthesizer, "cfg", None),
                                  "sample_rate", None)
    if rate is None:
        raise ValueError("pass sample_rate= (synthesizer has no cfg)")
    wavs, _mels, _lins = synthesizer.synthesize_batch(
        pieces, [speaker_id] * len(pieces))
    gap = np.zeros(int(rate * pause_ms / 1000.0), np.float32)
    joined: List[np.ndarray] = []
    for i, wav in enumerate(wavs):
        if i:
            joined.append(gap)
        joined.append(np.asarray(wav, np.float32))
    return np.concatenate(joined)
