"""End-to-end integration (SURVEY.md §4.3): synthetic corpus ->
train -> checkpoint -> restore -> synthesize on CPU, plus the demo server
route contract (§4.5) through a WSGI test client."""

import os

import jax
import numpy as np
import pytest

import nspeech_tpu.config as config
from nspeech_tpu.data.feeder import DataFeeder
from nspeech_tpu.models import create_model
from nspeech_tpu.serving import Synthesizer
from nspeech_tpu.train import (
    CheckpointManager,
    create_state,
    make_optimizer,
)
from nspeech_tpu.train.loop import build_tacotron_train_step
from tests.make_synth_corpus import make_corpus


def micro_cfg():
    cfg = config.load_config("taco1")
    cfg.parse(
        "batch_size=2,batch_group_size=2,max_iters=3,encoder_cbhg_banks=1,"
        "post_cbhg_banks=1,attention_dim=16,decoder_dim=16,embedding_dim=16,"
        "griffin_lim_iters=2")
    cfg.encoder_prenet = [16, 16]
    cfg.encoder_cbhg_bank_sizes = [16]
    cfg.post_cbhg_bank_sizes = [80]
    return cfg


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("corpus")), n=4)


def test_train_checkpoint_restore_synthesize(corpus, tmp_path):
    cfg = micro_cfg()
    feeder = DataFeeder({"ljspeech": corpus}, cfg, seed=1,
                        bucket_text=16, bucket_frames=15)
    cfg.num_speakers = feeder.num_speakers

    model = create_model("taco1", cfg)
    tx, schedule = make_optimizer(cfg, "taco1")
    step_fn = build_tacotron_train_step(model, tx, schedule=schedule)
    state = create_state(model, tx, jax.random.PRNGKey(0))

    losses = []
    it = feeder.epoch_batches(0)
    batch = next(it)
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]

    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(int(state.step), state)
    mgr.wait()
    mgr.close()

    synth = Synthesizer(cfg, text_bucket=16)
    synth.load(ckpt_dir, "taco1")
    wav, mel, lin = synth.synthesize("hello world")
    assert wav.ndim == 1 and len(wav) > 0
    assert mel.shape == (cfg.max_iters * cfg.outputs_per_step, 80)
    assert lin.shape[1] == 1025
    assert np.isfinite(wav).all()

    # The server contract on top of the same synthesizer (no socket needed).
    from demo_server import make_app

    app = make_app(synth, cfg)
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    body = b"".join(app({"PATH_INFO": "/synthesize",
                         "QUERY_STRING": "text=hi"}, start_response))
    assert captured["status"] == "200 OK"
    assert captured["headers"]["Content-Type"] == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"

    body = b"".join(app({"PATH_INFO": "/synthesize", "QUERY_STRING": ""},
                        start_response))
    assert captured["status"].startswith("400")
    body = b"".join(app({"PATH_INFO": "/", "QUERY_STRING": ""}, start_response))
    assert captured["status"] == "200 OK" and b"<html" in body.lower()
    body = b"".join(app({"PATH_INFO": "/zzz", "QUERY_STRING": ""}, start_response))
    assert captured["status"].startswith("404")


def test_freerun_preview_artifacts(corpus, tmp_path):
    """--freerun-preview dumps autoregressive (serving-path) audio +
    alignment at each checkpoint and logs freerun_rms /
    freerun_decoder_steps — the exposure-bias canary that teacher-forced
    previews cannot provide (a checkpoint can preview perfectly while
    free-running to silence)."""
    import json

    import train as train_cli

    args = train_cli.build_parser().parse_args([
        "--ljspeech", corpus, "--model", "taco1",
        "--log-dir", str(tmp_path), "--max-steps", "2",
        "--checkpoint-interval", "2", "--summary-interval", "2",
        "--freerun-preview", "--freerun-text", "a novel canary line",
        "--seed", "1"])
    log_dir = str(tmp_path / "run")
    os.makedirs(log_dir, exist_ok=True)
    train_cli.train(log_dir, args, micro_cfg())

    assert os.path.exists(os.path.join(log_dir, "step-000002-freerun.wav"))
    assert os.path.exists(
        os.path.join(log_dir, "step-000002-freerun-align.png"))
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    fr = [r for r in recs if "freerun_rms" in r]
    assert fr, recs
    assert np.isfinite(fr[-1]["freerun_rms"])
    assert 1 <= fr[-1]["freerun_decoder_steps"] <= micro_cfg().max_iters


def test_batch_synthesis_and_batch_route(corpus, tmp_path):
    """synthesize_batch: one padded forward for N texts; /synthesize_batch
    returns a zip of wavs (BASELINE config #5 batch serving)."""
    import io
    import json
    import zipfile

    cfg = micro_cfg()
    model = create_model("taco1", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=16)
    synth.set_variables(params, bn_state, model=model)

    wavs, mels, lins = synth.synthesize_batch(["hello there", "bye"])
    assert len(wavs) == 2
    assert mels.shape[0] == 2 and lins.shape[0] == 2
    assert all(np.isfinite(w).all() for w in wavs)
    # batch result matches single-call result for the same text
    w1, m1, _ = synth.synthesize("hello there")
    np.testing.assert_allclose(m1, mels[0], atol=1e-5)

    from demo_server import make_app

    app = make_app(synth, cfg)
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    payload = json.dumps({"texts": ["hi", "yo"]}).encode()
    env = {"PATH_INFO": "/synthesize_batch", "QUERY_STRING": "",
           "CONTENT_LENGTH": str(len(payload)),
           "wsgi.input": io.BytesIO(payload)}
    body = b"".join(app(env, start_response))
    assert captured["status"] == "200 OK"
    assert captured["headers"]["Content-Type"] == "application/zip"
    z = zipfile.ZipFile(io.BytesIO(body))
    assert len(z.namelist()) == 2
    assert z.read("utt_000.wav")[:4] == b"RIFF"

    env = {"PATH_INFO": "/synthesize_batch", "QUERY_STRING": "",
           "CONTENT_LENGTH": "0", "wsgi.input": io.BytesIO(b"")}
    b"".join(app(env, start_response))
    assert captured["status"].startswith("400")

    # malformed payloads are rejected with 400, not a 500 from deep inside
    for bad in ({"texts": ["hi", "yo"], "speaker_ids": [0]},
                {"texts": []},
                {"texts": ["ok", 7]}):
        payload = json.dumps(bad).encode()
        env = {"PATH_INFO": "/synthesize_batch", "QUERY_STRING": "",
               "CONTENT_LENGTH": str(len(payload)),
               "wsgi.input": io.BytesIO(payload)}
        b"".join(app(env, start_response))
        assert captured["status"].startswith("400"), bad


def test_batch_route_speaker_mix_rejected_as_400():
    """A batch mixing explicit speaker_ids with -1 (unconditioned) is a
    client error: the pipeline's ValueError maps to 400, not a 500."""
    import io
    import json

    from demo_server import make_app

    from nspeech_tpu.serving import ClientError

    class MixRejectingSynth:
        def synthesize_batch(self, texts, speaker_ids=None):
            raise ClientError("cannot mix explicit speaker_ids and -1/None")

    cfg = micro_cfg()
    app = make_app(MixRejectingSynth(), cfg)
    captured = {}

    def start_response(status, headers):
        captured["status"] = status

    payload = json.dumps({"texts": ["hi", "yo"],
                          "speaker_ids": [0, -1]}).encode()
    env = {"PATH_INFO": "/synthesize_batch", "QUERY_STRING": "",
           "CONTENT_LENGTH": str(len(payload)),
           "wsgi.input": io.BytesIO(payload)}
    body = b"".join(app(env, start_response))
    assert captured["status"].startswith("400")
    assert b"mix" in body
