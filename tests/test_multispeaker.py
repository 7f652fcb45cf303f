"""Multi-speaker paths (BASELINE config #5): Arctic corpus parsing, speaker
embeddings through both Tacotron variants, and the dormant-in-the-reference
CMUDict ARPAbet substitution."""

import io
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import load_config
from nspeech_tpu.data.corpus import build_speaker_map, load_arctic
from nspeech_tpu.models import create_model
from nspeech_tpu.text.cmudict import CMUDict


def make_arctic_corpus(root, speakers=("bdl", "slt")):
    from scipy.io import wavfile

    for spk in speakers:
        d = os.path.join(root, f"cmu_us_{spk}_arctic")
        os.makedirs(os.path.join(d, "wav"), exist_ok=True)
        os.makedirs(os.path.join(d, "etc"), exist_ok=True)
        lines = []
        for i in range(2):
            utt = f"arctic_a{i:04d}"
            t = np.arange(4000) / 20000.0
            wav = (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t) * 32767)
            wavfile.write(os.path.join(d, "wav", utt + ".wav"), 20000,
                          wav.astype(np.int16))
            lines.append(f'( {utt} "Author of the danger trail {i}." )')
        with open(os.path.join(d, "etc", "txt.done.data"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def test_arctic_loader(tmp_path):
    root = make_arctic_corpus(str(tmp_path))
    items = list(load_arctic(root))
    assert len(items) == 4
    speakers = {i[2] for i in items}
    assert speakers == {"bdl", "slt"}
    assert all(i[3] == "arctic" for i in items)
    assert all(os.path.isfile(i[0]) for i in items)
    smap = build_speaker_map(items)
    assert len(smap) == 2


def test_multispeaker_tacotron_forward(rng):
    for name, overrides in [
        ("taco1", "encoder_cbhg_banks=2,post_cbhg_banks=2,attention_dim=16,"
                  "decoder_dim=16,embedding_dim=16,max_iters=2"),
        ("taco2", "max_iters=2,encoder_conv_layers=1,postnet_conv_layers=1,"
                  "expand_conv_layers=1,encoder_conv_channels=16,"
                  "attention_dim=16,postnet_conv_channels=16,"
                  "expand_conv_channels=16,decoder_lstm_units=16,"
                  "encoder_lstm_units=8,expand_lstm_units=8,embedding_dim=16"),
    ]:
        cfg = load_config(name)
        cfg.parse(overrides + ",num_speakers=3")
        if name == "taco1":
            cfg.encoder_prenet = [16, 16]
            cfg.encoder_cbhg_bank_sizes = [16]
            cfg.post_cbhg_bank_sizes = [16]
        model = create_model(name, cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        assert "speaker_embed" in params
        text = jnp.array(rng.integers(2, 60, (2, 8)), jnp.int32)
        lengths = jnp.array([8, 8], jnp.int32)
        mel = jnp.array(rng.random((2, 10, 80)), jnp.float32)
        out, _ = model.forward(params, state, text, lengths,
                               speaker_ids=jnp.array([0, 2], jnp.int32),
                               mel_targets=mel, is_training=True,
                               rng=jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out["mel_outputs"])).all()
        # different speakers produce different outputs for identical text
        out_a, _ = model.forward(params, state, text, lengths,
                                 speaker_ids=jnp.array([1, 1], jnp.int32),
                                 mel_targets=mel, is_training=False)
        out_b, _ = model.forward(params, state, text, lengths,
                                 speaker_ids=jnp.array([2, 2], jnp.int32),
                                 mel_targets=mel, is_training=False)
        assert not np.allclose(np.asarray(out_a["mel_outputs"]),
                               np.asarray(out_b["mel_outputs"]))


def _load_script(name):
    """Import a repo script (scripts/ has no package __init__)."""
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                        name + ".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_multispeaker_alignment_corpus(tmp_path):
    """speakers>1 emits VCTK layout consumable by load_vctk, and the
    per-speaker voices differ by the designed F0 scale (recoverable from
    the rendered audio via the report tool's median_f0)."""
    mac = _load_script("make_alignment_corpus")
    out = mac.make_corpus(str(tmp_path / "c"), n=8, seed=3, style="words",
                          speakers=2)
    from nspeech_tpu.data.corpus import build_speaker_map, load_vctk

    items = list(load_vctk(out))
    assert len(items) == 8
    assert all(i[3] == "vctk" for i in items)
    assert all(i[1].strip() for i in items)  # texts round-trip
    assert len(build_speaker_map(items)) == 2

    ar = _load_script("alignment_report")
    text = "deep wave tone."
    f0 = []
    for k in range(2):
        f_scale, h_tilt = mac.speaker_voice(k, 2)
        wav = mac.render_text(text, 20000, np.random.default_rng(1),
                              f_scale=f_scale, h_tilt=h_tilt)
        f0.append(ar.median_f0(wav, 20000))
    expected = mac.speaker_voice(1, 2)[0] / mac.speaker_voice(0, 2)[0]
    assert f0[0] > 0 and f0[1] > 0
    assert abs(f0[1] / f0[0] - expected) / expected < 0.25, (f0, expected)


def test_spectral_centroid_recovers_voice_ratio():
    """The third (simplest) voice estimator: centroids of two rendered
    speaker_voice() voices scale by the designed f_scale ratio, without
    peak picking (median_f0) or cross-correlation (spectral_shift)."""
    mac = _load_script("make_alignment_corpus")
    ar = _load_script("alignment_report")
    text = "deep wave tone."
    cents = []
    for k in range(2):
        f_scale, h_tilt = mac.speaker_voice(k, 2)
        wav = mac.render_text(text, 20000, np.random.default_rng(1),
                              f_scale=f_scale, h_tilt=h_tilt)
        cents.append(ar.spectral_centroid(wav, 20000))
    expected = mac.speaker_voice(1, 2)[0] / mac.speaker_voice(0, 2)[0]
    assert cents[0] > 0 and cents[1] > 0
    # harmonic tilts are decorrelated from f_scale, so the centroid ratio
    # is noisier than the designed ratio — but it must clearly separate
    # the voices in the right direction
    assert abs(cents[1] / cents[0] - expected) / expected < 0.35, (
        cents, expected)


def test_median_f0_ignores_dominant_harmonics():
    """HPS pins the fundamental even when the 2nd/3rd partials are LOUDER
    (harmonic tilt > 1 speakers): the exact case where an FFT-argmax
    estimator reported a harmonic (observed: per-speaker "F0" ratios of
    1.01 and 4.35 for a designed 1.54 voice pair)."""
    ar = _load_script("alignment_report")
    sr, f0 = 20000, 400.0
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * f0 * t)
           + 0.8 * np.sin(2 * np.pi * 2 * f0 * t)
           + 0.6 * np.sin(2 * np.pi * 3 * f0 * t)).astype(np.float32)
    est = ar.median_f0(wav, sr)
    # n_fft=2048 at 20 kHz -> ~9.8 Hz bins; allow a couple of bins
    assert abs(est - f0) < 25.0, est
    # naive argmax control: the loudest partial is 2*f0, so an estimator
    # that tracked the peak would sit near 800 Hz
    mag = np.abs(np.fft.rfft(wav[:2048] * np.hanning(2048)))
    assert abs(np.argmax(mag) * sr / 2048 - 2 * f0) < 25.0


def test_vctk_feeder_batches_carry_speaker_ids(tmp_path):
    """A VCTK-layout corpus flows through DataFeeder end to end: batches
    carry the global speaker ids from the deterministic speaker map and
    both speakers appear across an epoch (the conditioning input the
    models consume, reference datafeeder.py:96-108)."""
    mac = _load_script("make_alignment_corpus")
    out = mac.make_corpus(str(tmp_path / "c"), n=6, seed=5, style="words",
                          speakers=2)
    from nspeech_tpu.config import load_config
    from nspeech_tpu.data import DataFeeder

    cfg = load_config("taco2")
    cfg.parse("batch_size=2,batch_group_size=2")
    feeder = DataFeeder({"vctk": out}, cfg)
    assert feeder.num_speakers == 2
    seen = set()
    for batch in feeder.epoch_batches(0):
        assert batch.speaker_ids.shape == (2,)
        seen.update(int(s) for s in batch.speaker_ids)
    assert seen == {0, 1}


def test_alignment_report_per_speaker_synthesis(tmp_path):
    """End to end on CPU: 2-speaker VCTK corpus -> tiny taco2 train ->
    checkpoint + run metadata -> alignment_report --speakers drives the
    no-flags serving restore and writes per-speaker wavs, alignments and
    median-F0 ratios into report.json."""
    import json
    import sys

    mac = _load_script("make_alignment_corpus")
    corpus = mac.make_corpus(str(tmp_path / "c"), n=4, seed=7,
                             style="words", speakers=2)

    from nspeech_tpu.data.feeder import DataFeeder
    from nspeech_tpu.train import (CheckpointManager, create_state,
                                   make_optimizer, save_run_metadata)
    from nspeech_tpu.train.loop import build_tacotron_train_step

    cfg = load_config("taco2")
    cfg.parse("batch_size=2,batch_group_size=2,max_iters=3,"
              "encoder_conv_layers=1,postnet_conv_layers=1,"
              "expand_conv_layers=1,encoder_conv_channels=16,"
              "attention_dim=16,postnet_conv_channels=16,"
              "expand_conv_channels=16,decoder_lstm_units=16,"
              "encoder_lstm_units=8,expand_lstm_units=8,embedding_dim=16,"
              "griffin_lim_iters=2")
    feeder = DataFeeder({"vctk": corpus}, cfg, bucket_text=16,
                        bucket_frames=16)
    cfg.num_speakers = feeder.num_speakers
    assert cfg.num_speakers == 2

    model = create_model("taco2", cfg)
    tx, schedule = make_optimizer(cfg, "taco2")
    step_fn = build_tacotron_train_step(model, tx, schedule=schedule)
    state = create_state(model, tx, jax.random.PRNGKey(0))
    batch = next(feeder.epoch_batches(0))
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))

    run_dir = tmp_path / "run"
    ckpt_dir = str(run_dir / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(int(state.step), state)
    mgr.wait()
    mgr.close()
    save_run_metadata(ckpt_dir, "taco2", cfg,
                      speaker_map=feeder.speaker2id)
    with open(run_dir / "metrics.jsonl", "w") as f:
        for s in range(3):
            f.write(json.dumps({"step": s,
                                "attention_sharpness": 0.1 * (s + 1)}) + "\n")

    ar = _load_script("alignment_report")
    out = str(tmp_path / "report")
    argv = ["alignment_report.py", "--run-dir", str(run_dir), "--out", out,
            "--text", "deep tone.", "--speakers", "0,1"]
    old = sys.argv
    try:
        sys.argv = argv
        ar.main()
    finally:
        sys.argv = old

    with open(os.path.join(out, "report.json")) as f:
        report = json.load(f)
    entry = report["texts"][0]
    assert set(entry["per_speaker"]) == {"0", "1"}
    assert len(entry.get("f0_ratio_vs_first_speaker", [1, 1])) == 2
    for spk in (0, 1):
        assert os.path.isfile(os.path.join(out, "eval-0-spk%d.wav" % spk))
        assert os.path.isfile(
            os.path.join(out, "eval-0-spk%d-align.png" % spk))


CMUDICT_SAMPLE = """\
;;; comment line
HELLO  HH AH0 L OW1
WORLD  W ER1 L D
WORLD(1)  W ER1 L D Z
BADSYM  QQ XX
"""


def test_cmudict_and_substitution():
    d = CMUDict(io.StringIO(CMUDICT_SAMPLE))
    assert len(d) == 2  # BADSYM dropped (invalid phones)
    assert d.lookup("hello") == ["HH AH0 L OW1"]
    assert len(d.lookup("WORLD")) == 2
    unamb = CMUDict(io.StringIO(CMUDICT_SAMPLE), keep_ambiguous=False)
    assert unamb.lookup("world") is None

    # Feeder-style substitution: with rng always below threshold, every
    # known word becomes ARPAbet (datafeeder.py:178-186 behavior, activated).
    from nspeech_tpu.data.feeder import DataFeeder

    feeder = DataFeeder.__new__(DataFeeder)
    feeder._cmudict = d

    class AlwaysLow:
        def random(self):
            return 0.0

    text = " ".join(feeder._maybe_arpabet(w, AlwaysLow())
                    for w in "hello strange world".split())
    assert text == "{HH AH0 L OW1} strange {W ER1 L D}"


def test_spectral_shift_ratio_recovers_designed_scale():
    """The log-frequency spectral-shift estimator recovers a known
    frequency scaling between two renderings of the same content —
    including with different harmonic tilts, where a peak-based F0
    estimator tracks the wrong partial."""
    ar = _load_script("alignment_report")
    sr = 20000
    t = np.arange(2 * sr) / sr
    scale = 1.54

    def voice(f0, tilt):
        return sum((tilt ** (h - 1)) * 0.3 * np.sin(2 * np.pi * h * f0 * t)
                   for h in (1, 2, 3)).astype(np.float32)

    # same "utterance" (two tones in sequence), scaled + tilted
    a = np.concatenate([voice(220, 0.6)[:sr], voice(330, 0.6)[:sr]])
    b = np.concatenate([voice(220 * scale, 1.5)[:sr],
                        voice(330 * scale, 1.5)[:sr]])
    est = ar.spectral_shift_ratio(a, b, sr)
    assert abs(est - scale) / scale < 0.05, est
    # identity control
    assert abs(ar.spectral_shift_ratio(a, a, sr) - 1.0) < 0.01


@pytest.mark.smoke
def test_exposure_report_freerun_comparison(tmp_path):
    """exposure_report compares freerun_rms curves across runs: first
    audible step, audible fraction, and the curve PNG."""
    import json as _json
    import subprocess
    import sys as _sys

    for name, rms in (("a", [0.001, 0.002, 0.08, 0.1]),
                      ("b", [0.001, 0.09, 0.12, 0.11])):
        d = tmp_path / name
        d.mkdir()
        with open(d / "metrics.jsonl", "w") as f:
            for i, r in enumerate(rms):
                f.write(_json.dumps({"step": (i + 1) * 500,
                                     "freerun_rms": r,
                                     "freerun_decoder_steps": 300.0,
                                     "loss": 0.5}) + "\n")
            f.write(_json.dumps({"step": 2001, "loss": 0.4}) + "\n")

    out = tmp_path / "out"
    script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "exposure_report.py")
    subprocess.run(
        [_sys.executable, script, "--run", f"ss0.0={tmp_path/'a'}",
         "--run", f"ss0.5={tmp_path/'b'}", "--out", str(out)], check=True)
    with open(out / "report.json") as f:
        rep = _json.load(f)
    assert rep["runs"]["ss0.0"]["first_audible_step"] == 1500
    assert rep["runs"]["ss0.5"]["first_audible_step"] == 1000
    assert rep["runs"]["ss0.5"]["audible_fraction"] == 0.75
    # rows without freerun_rms (plain training metrics) are ignored
    assert len(rep["runs"]["ss0.0"]["points"]) == 4
    assert (out / "freerun_rms.png").is_file()
