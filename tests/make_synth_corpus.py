"""Generate a tiny synthetic LJSpeech-layout corpus for tests and smoke runs.

Usage: python tests/make_synth_corpus.py <out_dir> [n_utterances] [sample_rate]

Writes wavs/<id>.wav sine/noise clips and a pipe-separated metadata.csv,
matching the format parsed by nspeech_tpu.data.corpus.load_ljspeech
(reference format: neural_speech/datasets/corpus/ljspeech.py:4-11).
"""

import os
import sys

import numpy as np

SENTENCES = [
    "The birch canoe slid on the smooth planks.",
    "Glue the sheet to the dark blue background.",
    "It is easy to tell the depth of a well.",
    "These days a chicken leg is a rare dish.",
    "Rice is often served in round bowls.",
    "The juice of lemons makes fine punch.",
    "The box was thrown beside the parked truck.",
    "The hogs were fed chopped corn and garbage.",
]


def make_corpus(out_dir: str, n: int = 5, sample_rate: int = 20000, seed: int = 7):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "wavs"), exist_ok=True)
    lines = []
    from scipy.io import wavfile

    for i in range(n):
        utt_id = "SYN%03d" % i
        dur = 0.4 + 0.15 * i
        t = np.arange(int(sample_rate * dur)) / sample_rate
        freq = 180.0 + 60.0 * i
        wav = 0.45 * np.sin(2 * np.pi * freq * t)
        wav += 0.18 * np.sin(2 * np.pi * 3 * freq * t)
        wav *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.0 * t)  # AM envelope
        wav += 0.01 * rng.standard_normal(len(t))
        wavfile.write(
            os.path.join(out_dir, "wavs", utt_id + ".wav"),
            sample_rate,
            (np.clip(wav, -1, 1) * 32767).astype(np.int16),
        )
        text = SENTENCES[i % len(SENTENCES)]
        lines.append(f"{utt_id}|{text}|{text}")
    with open(os.path.join(out_dir, "metadata.csv"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_corpus"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sr = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
    make_corpus(out, n, sr)
    print("Wrote %d utterances to %s" % (n, out))
