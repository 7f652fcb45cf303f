"""eval.py harness logic with a stub synthesizer (no model compile):
sentence set, Harvard-group selection, output artifact writing."""

import os

import numpy as np

import eval as eval_mod


class StubSynth:
    def __init__(self):
        self.texts = []

    def synthesize(self, text, speaker_id):
        self.texts.append(text)
        wav = 0.1 * np.sin(np.linspace(0, 100, 2000)).astype(np.float32)
        mel = np.random.rand(10, 80).astype(np.float32)
        lin = np.random.rand(10, 1025).astype(np.float32)
        return wav, mel, lin


class Args:
    speaker = -1


def test_simple_eval_writes_artifacts(tmp_path):
    import nspeech_tpu.config as config

    cfg = config.load_config("taco1")
    synth = StubSynth()
    base = str(tmp_path / "eval")
    eval_mod.simple_eval(Args(), synth, cfg, base)
    assert len(synth.texts) == 8
    wavs = [f for f in os.listdir(tmp_path) if f.endswith(".wav")]
    lins = [f for f in os.listdir(tmp_path) if f.endswith("-lin.png")]
    mels = [f for f in os.listdir(tmp_path) if f.endswith("-mel.png")]
    assert len(wavs) == 8 and len(lins) == 8 and len(mels) == 8


def test_harvard_eval_group_selection(tmp_path):
    import nspeech_tpu.config as config

    cfg = config.load_config("taco1")
    synth = StubSynth()
    eval_mod.harvard_eval(Args(), synth, cfg, str(tmp_path / "eval"))
    # Reference semantics (eval.py:48-54): skip each 11th line (list
    # headers), stop after i/11 > 3.
    assert len(synth.texts) > 20
    # Headers must never be synthesized, and the leading index is stripped.
    for t in synth.texts:
        assert not t.startswith("List")
        assert not t[0].isdigit()
