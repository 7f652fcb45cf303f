"""Stop-threshold calibration (nspeech_tpu/train/stopcal.py)."""

import json
import os

import numpy as np
import pytest

from nspeech_tpu.train.stopcal import (apply_threshold_to_run,
                                       sliding_window_max, stop_statistics)


@pytest.mark.smoke
def test_sliding_window_max_matches_naive(rng):
    x = rng.random(37)
    for w in (1, 2, 3, 5):
        naive = np.array([x[i:i + w].max() for i in range(len(x) - w + 1)])
        np.testing.assert_array_equal(sliding_window_max(x, w), naive)


def _mel(rng, t, floor, speech_level, m=8, tail=5):
    """[t, m] mel whose interior peaks sit at speech_level and whose last
    `tail` frames decay to the floor."""
    mel = rng.uniform(0, 0.5, (t, m)) * speech_level
    mel[np.arange(t), rng.integers(0, m, t)] = speech_level  # frame peaks
    mel[-tail:] = floor * rng.uniform(0.5, 1.0, (tail, m))
    return mel.astype(np.float32)


@pytest.mark.smoke
def test_separated_corpus_yields_usable_threshold(rng):
    mels = [_mel(rng, rng.integers(40, 90), floor=0.02, speech_level=0.8)
            for _ in range(50)]
    stats = stop_statistics(mels, r=2)
    assert stats["n_utterances"] == 50
    assert stats["separation"] > 1.5
    thr = stats["threshold"]
    # fires on the floor, never on speech
    assert stats["floor_p95"] < thr < stats["danger_p05"]


@pytest.mark.smoke
def test_unseparated_corpus_disables_early_stop(rng):
    # interiors with silences as quiet as the endings: no safe threshold
    mels = []
    for _ in range(30):
        mel = _mel(rng, 60, floor=0.1, speech_level=0.8)
        mel[20:24] = 0.05  # mid-utterance near-silence window
        mels.append(mel)
    stats = stop_statistics(mels, r=2)
    assert stats["threshold"] == 0.0
    assert stats["separation"] <= 1.5


@pytest.mark.smoke
def test_r_window_rescues_single_quiet_frames(rng):
    """A single quiet frame mid-speech must NOT drag the danger level
    down when r=2: the stop criterion needs r consecutive quiet frames,
    and the window-max statistic encodes that."""
    mels = []
    for _ in range(30):
        mel = _mel(rng, 60, floor=0.02, speech_level=0.8)
        mel[25] = 0.01  # lone inter-word dip
        mels.append(mel)
    r1 = stop_statistics(mels, r=1)
    r2 = stop_statistics(mels, r=2)
    assert r1["threshold"] == 0.0       # r=1 would truncate at the dip
    assert r2["threshold"] > 0.0        # r=2 is safe


@pytest.mark.smoke
def test_decode_based_calibration(rng):
    """Decode-based statistics: post-boundary emission is the floor even
    when the CORPUS has no trailing silence (the trimmed-corpus case
    where the corpus-based variant must refuse)."""
    from nspeech_tpu.train.stopcal import stop_statistics_from_decodes

    mels, bounds = [], []
    for _ in range(20):
        b = int(rng.integers(40, 60))
        # tightly-trimmed speech: every frame carries a full-level peak
        mel = rng.uniform(0.3, 0.6, (b, 8))
        mel[np.arange(b), rng.integers(0, 8, b)] = 0.9
        post = rng.uniform(0, 0.05, (30, mel.shape[1]))  # model's silence
        mels.append(np.concatenate([mel, post]).astype(np.float32))
        bounds.append(b)
    # corpus-based view of the same speech refuses (no trailing silence)
    assert stop_statistics([m[:b] for m, b in zip(mels, bounds)],
                           r=2)["threshold"] == 0.0
    stats = stop_statistics_from_decodes(mels, bounds, r=2)
    assert stats["separation"] > 1.5
    assert stats["floor_p95"] < stats["threshold"] < stats["danger_p05"]


@pytest.mark.smoke
def test_decode_guard_covers_endpoint_overhang(rng):
    """Observed live on the taco1 formant model (2026-08-20): the audio
    endpoint detector cuts ~16 frames INTO the trailing silence, so with
    a small guard those silence-onset frames leak into the danger
    statistic and calibration wrongly refuses (danger 0.006 < floor
    0.010). The default guard must cover the overhang."""
    from nspeech_tpu.train.stopcal import stop_statistics_from_decodes

    mels, bounds = [], []
    for _ in range(12):
        b = int(rng.integers(60, 80))
        mel = rng.uniform(0.3, 0.6, (b, 8))
        mel[np.arange(b), rng.integers(0, 8, b)] = 0.9
        mel[-16:] = 0.005  # endpoint overhang: silence inside "speech"
        post = rng.uniform(0, 0.01, (40, 8))
        mels.append(np.concatenate([mel, post]).astype(np.float32))
        bounds.append(b)
    tight = stop_statistics_from_decodes(mels, bounds, r=2, guard=4)
    assert tight["threshold"] == 0.0        # the failure being guarded
    good = stop_statistics_from_decodes(mels, bounds, r=2)  # default guard
    assert good["threshold"] > 0.0
    assert good["separation"] > 1.5


@pytest.mark.smoke
def test_apply_threshold_roundtrip(tmp_path):
    ckpt = str(tmp_path)
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump({"model": "taco2", "hparams": {"stop_threshold": 0.0}}, f)
    apply_threshold_to_run(ckpt, 0.125)
    with open(os.path.join(ckpt, "config.json")) as f:
        assert json.load(f)["hparams"]["stop_threshold"] == 0.125
    with pytest.raises(FileNotFoundError):
        apply_threshold_to_run(str(tmp_path / "nope"), 0.1)
