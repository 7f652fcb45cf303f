"""Held-out dev-set evaluation (--holdout): the overfitting signal the
reference lacked entirely (it trained on every utterance and reported
only training loss, reference: train.py:80-84)."""

import json
import os

import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.data.feeder import DataFeeder
from tests.make_synth_corpus import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("holdout_corpus")), n=6)


def _cfg():
    c = load_config("taco1")
    c.parse("batch_size=2,batch_group_size=2")
    return c


def test_feeder_holdout_carving(corpus):
    full = DataFeeder({"ljspeech": corpus}, _cfg())
    feeder = DataFeeder({"ljspeech": corpus}, _cfg(), holdout=2)
    assert len(feeder.holdout_items) == 2
    assert len(feeder._items) == len(full._items) - 2
    held = {it[0] for it in feeder.holdout_items}
    assert held.isdisjoint({it[0] for it in feeder._items})
    # speaker map covers the FULL corpus (ids stable with/without holdout)
    assert feeder.speaker2id == full.speaker2id
    # deterministic: same carving on a rebuild (what multi-host needs)
    again = DataFeeder({"ljspeech": corpus}, _cfg(), holdout=2)
    assert [it[0] for it in again.holdout_items] == \
        [it[0] for it in feeder.holdout_items]

    b1 = feeder.holdout_batch()
    b2 = feeder.holdout_batch()
    assert b1.inputs.shape[0] == 2
    np.testing.assert_array_equal(b1.inputs, b2.inputs)
    np.testing.assert_array_equal(b1.mel_targets, b2.mel_targets)

    with pytest.raises(ValueError, match="holdout"):
        DataFeeder({"ljspeech": corpus}, _cfg(), holdout=6)
    with pytest.raises(ValueError, match="holdout=0"):
        full.holdout_batch()


@pytest.mark.smoke
def test_trainer_reports_holdout_loss(corpus, tmp_path):
    import train as train_cli
    from tests.test_integration import micro_cfg

    args = train_cli.build_parser().parse_args([
        "--ljspeech", corpus, "--model", "taco1",
        "--log-dir", str(tmp_path), "--max-steps", "2",
        "--checkpoint-interval", "2", "--summary-interval", "2",
        "--holdout", "2", "--seed", "1"])
    log_dir = str(tmp_path / "run")
    os.makedirs(log_dir, exist_ok=True)
    train_cli.train(log_dir, args, micro_cfg())

    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    hold = [r for r in recs if "holdout_loss" in r]
    assert hold, recs
    assert np.isfinite(hold[-1]["holdout_loss"])
    assert "holdout_loss_mel" in hold[-1]
