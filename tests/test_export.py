"""AOT serving export (serving/export.py): the serialized StableHLO
artifact reproduces the live Synthesizer bit-exactly and loads without
model code or checkpoint."""

import os

import jax
import numpy as np
import pytest

import nspeech_tpu.config as config
from nspeech_tpu.models import create_model
from nspeech_tpu.serving import Synthesizer
from nspeech_tpu.serving.export import ExportedSynthesizer, export_synthesizer
from nspeech_tpu.train import create_state, make_optimizer


def _micro_synth():
    cfg = config.load_config("taco1")
    cfg.parse(
        "batch_size=2,max_iters=3,encoder_cbhg_banks=1,post_cbhg_banks=1,"
        "attention_dim=16,decoder_dim=16,embedding_dim=16,"
        "griffin_lim_iters=2")
    cfg.encoder_prenet = [16, 16]
    cfg.encoder_cbhg_bank_sizes = [16]
    cfg.post_cbhg_bank_sizes = [80]
    cfg.num_speakers = 1
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    st = create_state(model, tx, jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=32)
    synth.set_variables(st.params, st.bn_state, model=model)
    return synth


def test_export_round_trip_exact(tmp_path):
    synth = _micro_synth()
    wav0, mel0, lin0 = synth.synthesize("hello world")

    out = export_synthesizer(synth, str(tmp_path / "art"), text_len=32,
                             batch=1)
    assert os.path.exists(os.path.join(out, "module.stablehlo"))
    assert os.path.exists(os.path.join(out, "export.json"))

    ex = ExportedSynthesizer(out)
    wav1, mel1, lin1 = ex.synthesize("hello world")
    # same compiled math, same rng: spectrograms are bit-identical
    np.testing.assert_array_equal(mel0, mel1)
    np.testing.assert_array_equal(lin0, lin1)
    # wav post-processing twins (scipy lfilter vs associative scan)
    # agree to float tolerance; endpoint trim must pick the same cut
    assert len(wav0) == len(wav1)
    np.testing.assert_allclose(wav0, wav1, atol=1e-4)


def test_export_multiplatform_lowering(tmp_path):
    """One artifact lowered for BOTH cpu and tpu loads and runs here."""
    synth = _micro_synth()
    out = export_synthesizer(synth, str(tmp_path / "art"), text_len=32,
                             batch=1, platforms=("cpu", "tpu"))
    ex = ExportedSynthesizer(out)
    assert set(ex.meta["platforms"]) == {"cpu", "tpu"}
    wav, mel, lin = ex.synthesize("a b c")
    assert len(wav) > 0 and np.isfinite(mel).all()


def test_export_rejects_overlong_text(tmp_path):
    synth = _micro_synth()
    out = export_synthesizer(synth, str(tmp_path / "art"), text_len=8,
                             batch=1)
    ex = ExportedSynthesizer(out)
    with pytest.raises(ValueError, match="text_len"):
        ex.synthesize("this text is far longer than eight symbols")


def test_export_batched_artifact(tmp_path):
    """A batch=2 artifact serves N texts in groups through one compiled
    program; row-0 results equal the single-text call bit for bit."""
    synth = _micro_synth()
    out = export_synthesizer(synth, str(tmp_path / "art"), text_len=32,
                             batch=2)
    ex = ExportedSynthesizer(out)
    wavs, mels, lins = ex.synthesize_batch(
        ["first text", "second text", "third"])
    assert len(wavs) == 3 and mels.shape[0] == 3 and lins.shape[0] == 3
    assert all(np.isfinite(w).all() for w in wavs)
    wav1, mel1, lin1 = ex.synthesize("first text")
    np.testing.assert_array_equal(mels[0], mel1)
    np.testing.assert_array_equal(wavs[0], wav1)


def test_vocoder_export_round_trip_exact(tmp_path):
    """export_vocoder: the serialized mel->wav program (scan generator +
    on-device upsample + mu-law decode) matches the live vocoder
    bit-exactly for the same seed, and trims padded frames back."""
    from nspeech_tpu.models import create_model
    from nspeech_tpu.serving import WaveNetVocoder
    from nspeech_tpu.serving.export import ExportedVocoder, export_vocoder

    vcfg = config.load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=80,batch_size=1")
    net = create_model("wavenet", vcfg)
    vparams = net.init(jax.random.PRNGKey(1))
    vocoder = WaveNetVocoder(vcfg, use_pallas=False).set_variables(
        net, vparams)

    rng = np.random.default_rng(0)
    mel = rng.random((4, 80)).astype(np.float32)
    # temperature=0 (argmax sampling) makes the chain deterministic:
    # stochastic draws are NOT reproducible across compilation boundaries
    # (one ulp of logit difference flips a draw and the autoregressive
    # chain diverges — same reason the Pallas equivalence tests run at 0)
    wav_live = vocoder.vocode(mel, temperature=0.0, seed=3)

    out = export_vocoder(vocoder, str(tmp_path / "art"), frames=4,
                         batch=1, temperature=0.0)
    ex = ExportedVocoder(out)
    wav_exp = ex.vocode(mel, seed=3)
    # the deterministic chains pick identical codes; only the final
    # mu-law float decode differs by ~1 ulp across compilations (any
    # flipped code would diverge the chain and blow far past this atol)
    np.testing.assert_allclose(np.asarray(wav_live, np.float32), wav_exp,
                               atol=1e-5)

    # shorter mel: edge-hold padded inside, trimmed back to T*hop on
    # return — and equal to the live vocoder on the same short mel (the
    # pad replication reproduces the live upsample's frame clip)
    short = ex.vocode(mel[:2], seed=3)
    assert len(short) == 2 * ex.meta["hop"]
    live_short = vocoder.vocode(mel[:2], temperature=0.0, seed=3)
    np.testing.assert_allclose(np.asarray(live_short, np.float32), short,
                               atol=1e-5)

    with pytest.raises(ValueError, match="frames=4"):
        ex.vocode(rng.random((9, 80)).astype(np.float32))
    # empty mel is a client error, not an IndexError from the edge-hold
    with pytest.raises(ValueError, match="empty"):
        ex.vocode(np.zeros((0, 80), np.float32))


def test_demo_server_serves_exported_artifact(tmp_path):
    """demo_server --artifact path: the WSGI app runs on an
    ExportedSynthesizer (no checkpoint/model code) — 200 audio/wav for a
    fitting text, 400 (not 500) for one beyond the exported text_len."""
    from types import SimpleNamespace

    from demo_server import make_app

    synth = _micro_synth()
    out = export_synthesizer(synth, str(tmp_path / "art"), text_len=16,
                             batch=1)
    ex = ExportedSynthesizer(out)
    app = make_app(ex, SimpleNamespace(sample_rate=ex.meta["sample_rate"]))
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    body = b"".join(app({"PATH_INFO": "/synthesize",
                         "QUERY_STRING": "text=hi+there"}, start_response))
    assert captured["status"] == "200 OK"
    assert captured["headers"]["Content-Type"] == "audio/wav"
    assert body[:4] == b"RIFF"

    body = b"".join(app(
        {"PATH_INFO": "/synthesize",
         "QUERY_STRING": "text=a+sentence+well+beyond+sixteen+symbols"},
        start_response))
    assert captured["status"].startswith("400")
    assert b"text_len" in body
