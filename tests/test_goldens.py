"""Frozen golden regression tests (VERDICT r1 item 5).

tests/test_dsp.py validates properties and an independently-written
oracle; these fixtures additionally pin the CURRENT numerical outputs so a
silent drift in BOTH implementations (or a refactor that changes values)
cannot pass unnoticed. The 1e-3 mel-parity contract (BASELINE.md) only
holds as long as these stay fixed. Regenerate deliberately with
tests/goldens/make_goldens.py and commit the reason.
"""

import json
import os

import numpy as np
import pytest

import nspeech_tpu.config as config
from nspeech_tpu import dsp
from nspeech_tpu.text import text_to_sequence
from tests.goldens.make_goldens import GOLDEN_TEXTS, deterministic_wav


pytestmark = pytest.mark.smoke  # fast contract tests


HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="module")
def goldens():
    with np.load(os.path.join(HERE, "dsp_goldens.npz")) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def cfg():
    return config.load_config("taco1")


def test_golden_wav_is_reproducible(goldens, cfg):
    np.testing.assert_array_equal(deterministic_wav(cfg.sample_rate),
                                  goldens["wav"])


def test_spectrograms_match_goldens(goldens, cfg):
    linear, mel = dsp.spectrograms(goldens["wav"], cfg)
    # float32 accumulation-order slack only; well inside the 1e-3 contract
    np.testing.assert_allclose(np.asarray(linear), goldens["linear"],
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(mel), goldens["mel"],
                               atol=1e-5, rtol=0)


def test_mu_law_matches_goldens(goldens):
    codes = np.asarray(dsp.mu_law_encode(goldens["wav"], 256))
    np.testing.assert_array_equal(codes, goldens["mu_codes"])
    decoded = np.asarray(dsp.mu_law_decode(goldens["mu_codes"], 256))
    np.testing.assert_allclose(decoded, goldens["mu_decoded"], atol=1e-7)


def test_endpoint_matches_golden(goldens, cfg):
    assert dsp.find_endpoint(goldens["wav"], cfg) == int(goldens["endpoint"])


def test_text_sequences_match_goldens():
    with open(os.path.join(HERE, "text_goldens.json")) as f:
        frozen = json.load(f)
    assert set(frozen) == set(GOLDEN_TEXTS)
    for text, seq in frozen.items():
        assert text_to_sequence(text, ["english_cleaners"]) == seq, text
