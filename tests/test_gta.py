"""GTA (ground-truth-aligned) vocoder conditioning (data/gta.py).

The exporter runs the acoustic model teacher-forced over the corpus and
stores the predicted mels; WaveNetFeeder(gta_dir=...) must splice them in
on EXACTLY the anchor grid the computed-mel path uses (row i of the padded
waveform's mel anchors at sample i*hop). The reference has no GTA path —
its vocoder trains on true mels (reference: train_wavenet.py:47) and
serves on predicted ones.
"""

import json
import os

import jax
import numpy as np
import pytest

import nspeech_tpu.config as config
from nspeech_tpu.config import stft_params
from nspeech_tpu import dsp
from nspeech_tpu.data.gta import (check_fingerprint, export_gta, fingerprint,
                                  gta_path)
from nspeech_tpu.data.wavenet_feeder import WaveNetFeeder
from nspeech_tpu.data.corpus import load_items
from tests.make_synth_corpus import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("gta_corpus")), n=4)


def _write_manifest(gta_dir, cfg, files):
    os.makedirs(gta_dir, exist_ok=True)
    with open(os.path.join(gta_dir, "manifest.json"), "w") as f:
        json.dump({"fingerprint": fingerprint(cfg), "files": files,
                   "model": "test", "checkpoint": "none", "step": None,
                   "count": len(files)}, f)


def test_gta_anchor_grid_exact(corpus, tmp_path):
    """Store a ramp pattern (mel[i, :] = i) as the GTA mel; after the
    feeder's silence-pad splice and per-sample upsampling, sample s of the
    padded waveform must read (s/hop - pad_rows) exactly — verifying the
    whole anchor arithmetic, including the hop-rounded receptive-field pad."""
    cfg = config.load_config("wavenet")
    cfg.parse("batch_size=2,sample_size=1000")
    _, hop, _ = stft_params(cfg)
    rf = 3 * hop + 17  # NOT a hop multiple: exercises the rounding
    threshold = cfg.get("silence_threshold", 0.1)

    items = load_items({"ljspeech": corpus})
    gta_dir = str(tmp_path / "gta")
    os.makedirs(gta_dir)
    files = {}
    for wav_path, _t, _s, _d in items:
        from nspeech_tpu.native import load_wav

        wav = dsp.trim_silence(load_wav(wav_path, cfg.sample_rate), threshold)
        frames = 1 + len(wav) // hop
        ramp = np.tile(np.arange(frames, dtype=np.float32)[:, None],
                       (1, cfg.num_mels))
        np.save(gta_path(gta_dir, wav_path), ramp)
        files[os.path.abspath(wav_path)] = os.path.basename(
            gta_path(gta_dir, wav_path))
    _write_manifest(gta_dir, cfg, files)

    feeder = WaveNetFeeder({"ljspeech": corpus}, rf, cfg, frame_lc=False,
                           gta_dir=gta_dir)
    pad = feeder._gta_pad
    assert pad % hop == 0 and pad >= rf
    pad_rows = pad // hop
    batch = next(feeder.batches())
    # Row index stored at global row j is j - pad_rows (silence rows carry
    # the dB-floor mel, identical across channels and ~0 under the ramp's
    # scale only at exact silence — compare where the ramp region applies).
    # First utterance window starts at offset 0 of the padded wav.
    w = feeder.window
    lc = batch.mel[0]  # [window, M] per-sample layout
    s = np.arange(w)
    expected = s / hop - pad_rows
    region = expected >= 0  # pure-GTA region (past the silence pad)
    np.testing.assert_allclose(lc[region, 0], expected[region], atol=1e-5)
    # Silence rows: identical value across the pad region's anchor points
    anchor0 = lc[0, 0]
    for j in range(pad_rows):
        np.testing.assert_allclose(lc[j * hop, 0], anchor0, atol=1e-6)


def test_gta_fingerprint_mismatch_rejected(corpus, tmp_path):
    cfg = config.load_config("wavenet")
    gta_dir = str(tmp_path / "gta")
    _write_manifest(gta_dir, cfg, {})
    other = config.load_config("wavenet")
    other.num_mels = cfg.num_mels + 1
    with pytest.raises(ValueError, match="num_mels"):
        check_fingerprint(gta_dir, other)
    with pytest.raises(ValueError, match="feature hparams"):
        WaveNetFeeder({"ljspeech": corpus}, 256, other, gta_dir=gta_dir)


def test_gta_missing_or_stale_mel_rejected(corpus, tmp_path):
    cfg = config.load_config("wavenet")
    cfg.parse("batch_size=2,sample_size=1000")
    gta_dir = str(tmp_path / "gta")
    _write_manifest(gta_dir, cfg, {})
    feeder = WaveNetFeeder({"ljspeech": corpus}, 512, cfg, gta_dir=gta_dir)
    with pytest.raises(FileNotFoundError, match="export_gta"):
        next(feeder.batches())
    # Wrong frame count = wav/trim changed since export
    items = load_items({"ljspeech": corpus})
    for wav_path, _t, _s, _d in items:
        np.save(gta_path(gta_dir, wav_path),
                np.zeros((3, cfg.num_mels), np.float32))
    with pytest.raises(ValueError, match="frames"):
        next(feeder.batches())


def test_export_multispeaker_uses_persisted_map(tmp_path):
    """The exporter must map (dataset, speaker) -> id through the
    acoustic checkpoint's PERSISTED speaker map (the training-time
    assignment), and refuse a corpus speaker the checkpoint never saw."""
    import importlib.util

    from nspeech_tpu.models import create_model
    from nspeech_tpu.train import (CheckpointManager, create_state,
                                   make_optimizer, save_run_metadata)

    spec = importlib.util.spec_from_file_location(
        "mac", os.path.join(os.path.dirname(__file__), os.pardir,
                            "scripts", "make_alignment_corpus.py"))
    mac = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mac)
    corpus = mac.make_corpus(str(tmp_path / "c"), n=6, seed=5,
                             style="words", speakers=2)

    cfg = config.load_config("taco1")
    cfg.parse(
        "batch_size=2,batch_group_size=2,max_iters=3,encoder_cbhg_banks=1,"
        "post_cbhg_banks=1,attention_dim=16,decoder_dim=16,embedding_dim=16,"
        "num_speakers=2")
    cfg.encoder_prenet = [16, 16]
    cfg.encoder_cbhg_bank_sizes = [16]
    cfg.post_cbhg_bank_sizes = [80]

    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    state = create_state(model, tx, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, state)
    mgr.wait()
    mgr.close()

    # Persist a map that covers only ONE of the corpus's two speakers.
    from nspeech_tpu.data.corpus import load_items

    items = load_items({"vctk": corpus})
    speakers = sorted({(i[3], str(i[2])) for i in items})
    assert len(speakers) == 2
    save_run_metadata(ckpt_dir, "taco1", cfg,
                      speaker_map={speakers[0]: 0})
    with pytest.raises(ValueError, match="speaker map"):
        export_gta(ckpt_dir, {"vctk": corpus}, str(tmp_path / "g1"),
                   batch_size=2, text_bucket=16, frame_bucket=32,
                   log=lambda *_: None)

    # Full (order-scrambled) map: export succeeds for every utterance.
    save_run_metadata(ckpt_dir, "taco1", cfg,
                      speaker_map={speakers[0]: 1, speakers[1]: 0})
    manifest = export_gta(ckpt_dir, {"vctk": corpus},
                          str(tmp_path / "g2"), batch_size=2,
                          text_bucket=16, frame_bucket=32,
                          log=lambda *_: None)
    assert manifest["count"] == 6


@pytest.mark.smoke
def test_export_then_train_windows(corpus, tmp_path):
    """End-to-end: checkpoint a micro taco1, export GTA mels over the
    corpus, and stream vocoder windows conditioned on them."""
    from nspeech_tpu.models import create_model
    from nspeech_tpu.train import (CheckpointManager, create_state,
                                   make_optimizer, save_run_metadata)

    cfg = config.load_config("taco1")
    cfg.parse(
        "batch_size=2,batch_group_size=2,max_iters=3,encoder_cbhg_banks=1,"
        "post_cbhg_banks=1,attention_dim=16,decoder_dim=16,embedding_dim=16")
    cfg.encoder_prenet = [16, 16]
    cfg.encoder_cbhg_bank_sizes = [16]
    cfg.post_cbhg_bank_sizes = [80]
    cfg.num_speakers = 1

    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    state = create_state(model, tx, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, state)
    mgr.wait()
    mgr.close()
    save_run_metadata(ckpt_dir, "taco1", cfg,
                      speaker_map={("ljspeech", "0"): 0})

    out_dir = str(tmp_path / "gta")
    manifest = export_gta(ckpt_dir, {"ljspeech": corpus}, out_dir,
                          batch_size=2, text_bucket=16, frame_bucket=32,
                          log=lambda *_: None)
    assert manifest["count"] == 4
    _, hop, _ = stft_params(cfg)

    wn_cfg = config.load_config("wavenet")
    wn_cfg.parse("batch_size=2,sample_size=1000,lc_channels=80")
    items = load_items({"ljspeech": corpus})
    threshold = wn_cfg.get("silence_threshold", 0.1)
    for wav_path, _t, _s, _d in items:
        from nspeech_tpu.native import load_wav

        mel = np.load(gta_path(out_dir, wav_path))
        wav = dsp.trim_silence(load_wav(wav_path, wn_cfg.sample_rate),
                               threshold)
        assert mel.shape == (1 + len(wav) // hop, wn_cfg.num_mels)
        assert np.isfinite(mel).all()

    feeder = WaveNetFeeder({"ljspeech": corpus}, 1026, wn_cfg,
                           gta_dir=out_dir)
    batch = next(feeder.batches())
    assert batch.audio.shape == (2, 1026 + 1000)
    assert batch.mel.shape[0] == 2 and batch.mel_phase is not None
    assert np.isfinite(batch.mel).all()
