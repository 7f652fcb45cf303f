"""Run-metadata persistence (SURVEY.md §2.4 speaker-map persistence,
reference: neural_speech/datasets/datafeeder.py:56-60): the trainers
snapshot the effective config + speaker map next to the checkpoint, and
serving restores from it with no manual flag hand-off."""

import jax
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.models import create_model
from nspeech_tpu.train import (
    CheckpointManager,
    config_from_checkpoint,
    create_state,
    load_run_metadata,
    make_optimizer,
    save_run_metadata,
)

pytestmark = pytest.mark.smoke


def test_metadata_roundtrip(tmp_path):
    cfg = load_config("taco2")
    cfg.num_speakers = 7  # the startup mutation serving must see
    spk_map = {("vctk", "p225"): 0, ("vctk", "p226"): 1, ("arctic", "bdl"): 2}
    path = save_run_metadata(str(tmp_path), "taco2", cfg, speaker_map=spk_map)
    assert path.endswith("config.json")
    meta = load_run_metadata(str(tmp_path))
    assert meta["model"] == "taco2"
    assert meta["hparams"]["num_speakers"] == 7
    assert ["vctk", "p226", 1] in meta["speaker_map"]


def test_config_from_checkpoint_precedence(tmp_path):
    cfg = load_config("taco1")
    cfg.num_speakers = 4
    save_run_metadata(str(tmp_path), "taco1", cfg)

    # metadata wins over YAML defaults; overrides applied last
    out, name = config_from_checkpoint(str(tmp_path))
    assert name == "taco1" and out.num_speakers == 4
    out, _ = config_from_checkpoint(str(tmp_path), overrides="num_speakers=9")
    assert out.num_speakers == 9
    # explicit model name beats metadata; default_model is the last resort
    _, name = config_from_checkpoint(str(tmp_path), model_name="taco2")
    assert name == "taco2"

    # no metadata: YAML fallback needs a name
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no run metadata"):
        config_from_checkpoint(str(empty))
    out, name = config_from_checkpoint(str(empty), default_model="wavenet")
    assert name == "wavenet" and out.quantization_channels == 256


def test_multispeaker_synthesis_without_flags(tmp_path):
    """Train-side state for a 3-speaker model restores into a Synthesizer
    built ONLY from the checkpoint dir — the num_speakers mutation travels
    via run metadata, not via --num-speakers (which used to fail as an
    Orbax shape error when forgotten)."""
    from nspeech_tpu.serving import Synthesizer

    cfg = load_config("taco1")
    cfg.parse("encoder_cbhg_banks=2,post_cbhg_banks=2,max_iters=3,"
              "attention_dim=16,decoder_dim=16,embedding_dim=16,"
              "num_speakers=3")
    cfg.encoder_prenet = [16, 8]
    cfg.encoder_cbhg_bank_sizes = [16, 8]
    cfg.post_cbhg_bank_sizes = [16]

    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    state = create_state(model, tx, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, state)
    mgr.wait()
    mgr.close()
    save_run_metadata(ckpt_dir, "taco1", cfg,
                      speaker_map={("synth", str(i)): i for i in range(3)})

    synth = Synthesizer.from_checkpoint(ckpt_dir, text_bucket=16)
    assert synth.cfg.num_speakers == 3
    wav, mel, _ = synth.synthesize("hello", speaker_id=2)
    assert np.isfinite(wav).all() and np.isfinite(np.asarray(mel)).all()


def test_load_without_model_name_requires_metadata(tmp_path):
    from nspeech_tpu.serving import Synthesizer

    cfg = load_config("taco1")
    with pytest.raises(ValueError, match="run metadata"):
        Synthesizer(cfg).load(str(tmp_path))


def test_metadata_merges_over_current_yaml_defaults(tmp_path):
    """A key added to the YAMLs AFTER a checkpoint was trained keeps its
    default when serving that checkpoint (the persisted hparams overlay
    the current defaults, they do not replace them)."""
    cfg = load_config("taco2")
    save_run_metadata(str(tmp_path), "taco2", cfg)
    meta_path = tmp_path / "config.json"
    import json
    meta = json.loads(meta_path.read_text())
    del meta["hparams"]["guided_attention_weight"]  # simulate an old run
    meta_path.write_text(json.dumps(meta))

    out, _ = config_from_checkpoint(str(tmp_path))
    assert out.guided_attention_weight == 0.0  # default survives
    out, _ = config_from_checkpoint(
        str(tmp_path), overrides="guided_attention_weight=5.0")
    assert out.guided_attention_weight == 5.0  # and stays overridable


def test_trainer_cli_hparams_from(tmp_path, monkeypatch):
    """train.py --hparams-from <ckpt_dir>: the run-metadata hparams (and
    model name) become the base config for a fine-tune, with --hparams
    overrides on top — no hand-copied flag soup (the mechanism behind
    'resume a run with only scheduled_sampling_ratio changed')."""
    import sys

    import train as train_cli

    cfg = load_config("taco2")
    cfg.encoder_conv_channels = 96  # a non-default the CLI must pick up
    cfg.num_speakers = 3
    save_run_metadata(str(tmp_path / "ckpt"), "taco2", cfg)

    seen = {}
    monkeypatch.setattr(train_cli, "train",
                        lambda log_dir, args, c: seen.update(
                            model=args.model, cfg=c))
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--platform", "cpu", "--log-dir", str(tmp_path / "logs"),
        "--hparams-from", str(tmp_path / "ckpt"),
        "--hparams", "scheduled_sampling_ratio=0.5"])
    train_cli.main()
    assert seen["model"] == "taco2"  # from metadata, not the CLI default
    assert seen["cfg"].encoder_conv_channels == 96
    assert seen["cfg"].num_speakers == 3
    assert seen["cfg"].scheduled_sampling_ratio == 0.5  # override on top

    # without --hparams-from the default model name still applies
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--platform", "cpu", "--log-dir", str(tmp_path / "logs")])
    train_cli.main()
    assert seen["model"] == "taco1"
