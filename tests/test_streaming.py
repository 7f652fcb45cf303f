"""Streaming (chunked) synthesis: every chunked program must reproduce
its one-shot counterpart exactly — WaveNet chunk generation, decoder
chunk scans, and halo'd postnet chunks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.models import create_model


def _micro_wavenet(lc=80):
    cfg = load_config("wavenet")
    cfg.parse("dilations_length=3,dilations_depth=2,residual_channels=8,"
              "dilation_channels=8,skip_channels=16,"
              "quantization_channels=64,lc_channels=%d,batch_size=1" % lc)
    net = create_model("wavenet", cfg)
    params = net.init(jax.random.PRNGKey(1))
    return net, params


@pytest.mark.smoke
def test_wavenet_chunked_generation_matches_one_shot():
    """generate_chunk chained over uneven chunk sizes == generate, at
    temperature 0 (argmax; the deterministic path both share)."""
    net, params = _micro_wavenet()
    rng = np.random.default_rng(0)
    n, total = 2, 48
    lc = jnp.asarray(rng.standard_normal((n, total, 80)), jnp.float32)

    ref = net.generate(params, total, jax.random.PRNGKey(5), batch=n,
                       lc=lc, temperature=0.0)

    carry = net.generate_carry0(batch=n)
    outs = []
    start = 0
    for size in (7, 16, 1, 24):  # uneven on purpose; sums to 48
        codes, carry = net.generate_chunk(
            params, carry, size, jax.random.PRNGKey(5),
            lc=lc[:, start:start + size], temperature=0.0)
        outs.append(np.asarray(codes))
        start += size
    np.testing.assert_array_equal(np.concatenate(outs, axis=1),
                                  np.asarray(ref))


def _toy_step(w, v, t_in, r):
    """Never-stopping decoder-like step (out offset keeps |out| > 0)."""

    def step(carry, x, rng):
        h = carry
        pre = jnp.tanh(x @ w + h @ v) + 0.1
        out = jnp.tile(pre, (1, r))
        align = jax.nn.softmax(jnp.tile(h[:, :1], (1, t_in)), axis=-1)
        return pre, (out, align)

    return step


def _stopping_step(stops, m, t_in):
    """Row i emits exact zeros from decoder step stops[i] on (carry
    counts steps) — exercises per-row early stop and the all-done tail."""

    def step(carry, x, rng):
        t = carry
        live = (t < stops).astype(jnp.float32)[:, None]
        out = live * (1.0 + 0.1 * t.astype(jnp.float32))[:, None] \
            * jnp.ones((1, m))
        align = jnp.full((stops.shape[0], t_in), 1.0 / t_in)
        return t + 1, (out, align)

    return step


@pytest.mark.smoke
@pytest.mark.parametrize("chunks", [(5, 2), (1, 1, 1, 1, 1, 1, 1)])
def test_decoder_chunked_matches_one_shot(chunks):
    from nspeech_tpu.models import decoder as D

    S, N, M, r, t_in = 8, 3, 4, 2, 5
    assert sum(chunks) == S - 1
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((M, M)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, M)) * 0.3, jnp.float32)
    step = _toy_step(w, v, t_in, r)
    cell0 = jnp.zeros((N, M))

    outs1, aligns1, steps1 = D.scan_autoregressive(
        step, cell0, N, M, r, max_iters=S)

    (out0, align0), carry = D.start_autoregressive(
        step, cell0, N, M, max_iters=S)
    outs = [np.asarray(out0)[None]]
    aligns = [np.asarray(align0)[None]]
    for k in chunks:
        (o, a), carry = D.scan_autoregressive_chunk(step, carry, k, M)
        outs.append(np.asarray(o))
        aligns.append(np.asarray(a))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(outs1))
    np.testing.assert_array_equal(np.concatenate(aligns),
                                  np.asarray(aligns1))
    np.testing.assert_array_equal(np.asarray(carry[4]), np.asarray(steps1))


@pytest.mark.smoke
def test_decoder_chunked_early_stop_matches_one_shot():
    """Rows stop at different steps; the all-finished tail of chunked
    output equals the one-shot buffers' untouched zeros, and per-row
    ``steps`` agree."""
    from nspeech_tpu.models import decoder as D

    S, N, M, t_in = 10, 3, 4, 5
    stops = jnp.asarray([2, 5, 5], jnp.int32)  # all done well before S
    step = _stopping_step(stops, M, t_in)
    cell0 = jnp.zeros((N,), jnp.int32)

    outs1, aligns1, steps1 = D.scan_autoregressive(
        step, cell0, N, M, r=1, max_iters=S)

    (out0, align0), carry = D.start_autoregressive(
        step, cell0, N, M, max_iters=S)
    outs, aligns = [np.asarray(out0)[None]], [np.asarray(align0)[None]]
    for k in (4, 3, 2):
        (o, a), carry = D.scan_autoregressive_chunk(step, carry, k, M)
        outs.append(np.asarray(o))
        aligns.append(np.asarray(a))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(outs1))
    np.testing.assert_array_equal(np.concatenate(aligns),
                                  np.asarray(aligns1))
    np.testing.assert_array_equal(np.asarray(carry[4]), np.asarray(steps1))
    assert bool(np.asarray(carry[3]).all())  # finished flags for the host


def _micro_tts(stop_threshold=0.0):
    from nspeech_tpu.serving import Synthesizer, WaveNetVocoder

    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=6,outputs_per_step=2,encoder_conv_layers=1,"
        "postnet_conv_layers=2,postnet_conv_width=3,expand_conv_layers=1,"
        "encoder_conv_channels=16,attention_dim=16,postnet_conv_channels=16,"
        "expand_conv_channels=16,decoder_lstm_units=16,encoder_lstm_units=8,"
        "expand_lstm_units=8,embedding_dim=16,griffin_lim_iters=1,"
        "stop_threshold=%g" % stop_threshold)
    model = create_model("taco2", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=16)
    synth.set_variables(params, bn_state, model=model)

    vcfg = load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=80,batch_size=1")
    net = create_model("wavenet", vcfg)
    vparams = net.init(jax.random.PRNGKey(1))
    vocoder = WaveNetVocoder(vcfg, use_pallas=False).set_variables(
        net, vparams)
    return synth, vocoder


def _one_shot_mel(synth, text, bucket=16, speaker_id=0):
    """The full-buffer postnet mel the stream's windows must reproduce."""
    from nspeech_tpu.data.feeder import round_up
    from nspeech_tpu.text import text_to_sequence
    from nspeech_tpu.text.symbols import PAD_ID

    cfg = synth.cfg
    seq = text_to_sequence(text, [c.strip() for c in cfg.cleaners.split(",")])
    ids = np.full((1, round_up(len(seq), bucket)), PAD_ID, np.int32)
    ids[0, : len(seq)] = seq
    outputs, _ = synth.model.forward(
        synth._params, synth._bn_state, jnp.asarray(ids),
        jnp.asarray([len(seq)], jnp.int32),
        speaker_ids=jnp.full((1,), speaker_id, jnp.int32),
        is_training=False)
    return np.asarray(outputs["mel_outputs"])[0]


def _streaming_reference(synth, vocoder, text, bucket=16):
    """One-shot path the stream must equal: full decode -> full postnet
    mel -> whole-utterance vocode of the voiced frames."""
    from nspeech_tpu.data.feeder import round_up
    from nspeech_tpu.text import text_to_sequence
    from nspeech_tpu.text.symbols import PAD_ID

    cfg = synth.cfg
    seq = text_to_sequence(text, [c.strip() for c in cfg.cleaners.split(",")])
    padded = round_up(len(seq), bucket)
    ids = np.full((1, padded), PAD_ID, np.int32)
    ids[0, : len(seq)] = seq
    outputs, _ = synth.model.forward(
        synth._params, synth._bn_state, jnp.asarray(ids),
        jnp.asarray([len(seq)], jnp.int32),
        speaker_ids=jnp.zeros((1,), jnp.int32), is_training=False)
    steps = int(np.asarray(outputs["decoder_steps"])[0])
    total = min(steps, cfg.max_iters) * cfg.outputs_per_step
    mel = np.asarray(outputs["mel_outputs"])[0, :total]
    wav = vocoder.vocode(mel, temperature=0.0, seed=0)
    return np.asarray(wav, np.float32), total


def test_streaming_tts_matches_one_shot():
    """Full streaming pipeline (chunked decode -> halo postnet -> carried
    WaveNet) == one-shot decode -> postnet -> vocode, bit-exactly at
    temperature 0. The random model never emits a stop frame, so the
    stream runs to max_iters."""
    from nspeech_tpu.serving.streaming import StreamingTTS

    synth, vocoder = _micro_tts()
    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    wav_ref, total = _streaming_reference(synth, vocoder, "hello world")
    assert total == synth.cfg.max_iters * synth.cfg.outputs_per_step

    chunks = list(tts.stream("hello world"))
    assert len(chunks) > 1  # actually streamed
    wav_stream = np.concatenate(chunks)
    assert wav_stream.shape == wav_ref.shape
    # identical code chains; only the final mu-law float decode differs
    # by ~1 ulp across compilations (a flipped code would diverge the
    # chain and blow far past this atol)
    np.testing.assert_allclose(wav_stream, wav_ref, atol=1e-6)
    # mel-level exactness (stronger than the wav check, which could in
    # principle pass through argmax luck): the windowed postnet must
    # reproduce the one-shot postnet INCLUDING the true-boundary frames
    # and the frames next to the decode-budget end
    mel_ref = _one_shot_mel(synth, "hello world")[:tts.last_total_frames]
    np.testing.assert_allclose(tts.last_mel, mel_ref, atol=1e-6)


def test_streaming_tts_early_stop_matches_one_shot():
    """stop_threshold chosen so the model stops mid-utterance: the
    stream trims to the stop frame and still equals the one-shot path."""
    from nspeech_tpu.serving.streaming import StreamingTTS

    # pick a threshold that stops at an interior decoder step: the
    # stop criterion reads the RAW decoder projection per step, so fetch
    # those via the decoder primitives and take an interior per-step min
    from nspeech_tpu.data.feeder import round_up
    from nspeech_tpu.models import decoder as D
    from nspeech_tpu.text import text_to_sequence
    from nspeech_tpu.text.symbols import PAD_ID

    synth0, _ = _micro_tts()
    cfg0 = synth0.cfg
    r = cfg0.outputs_per_step
    seq = text_to_sequence("hello world", ["english_cleaners"])
    ids = np.full((1, round_up(len(seq), 16)), PAD_ID, np.int32)
    ids[0, : len(seq)] = seq
    ctx, cell0 = synth0.model.attention_context(
        synth0._params, synth0._bn_state, jnp.asarray(ids),
        jnp.asarray([len(seq)], jnp.int32), jnp.zeros((1,), jnp.int32))
    step = synth0.model.make_eval_step(synth0._params, ctx)
    raw_outs, _, _ = D.scan_autoregressive(
        step, cell0, 1, cfg0.num_mels, r, max_iters=cfg0.max_iters)
    per_step = np.abs(np.asarray(raw_outs))[:, 0, :].max(axis=1)
    s_star = 1 + int(np.argmin(per_step[1:]))
    thresh = float(per_step[s_star]) + 1e-6

    synth, vocoder = _micro_tts(stop_threshold=thresh)
    wav_ref, total = _streaming_reference(synth, vocoder, "hello world")
    assert 0 < total < synth.cfg.max_iters * r  # really stopped early

    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    wav_stream = tts.synthesize("hello world")
    assert wav_stream.shape == wav_ref.shape
    np.testing.assert_allclose(wav_stream, wav_ref, atol=1e-6)
    mel_ref = _one_shot_mel(synth, "hello world")[:tts.last_total_frames]
    np.testing.assert_allclose(tts.last_mel, mel_ref, atol=1e-6)


@pytest.mark.smoke
def test_wavenet_chunked_generation_unconditioned():
    net, params = _micro_wavenet(lc=0)
    total = 32
    ref = net.generate(params, total, jax.random.PRNGKey(2), batch=1,
                       temperature=0.0)
    carry = net.generate_carry0(batch=1)
    a, carry = net.generate_chunk(params, carry, 20, jax.random.PRNGKey(2),
                                  temperature=0.0)
    b, carry = net.generate_chunk(params, carry, 12, jax.random.PRNGKey(2),
                                  temperature=0.0)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(a), np.asarray(b)], axis=1),
        np.asarray(ref))


def test_streaming_tts_taco1_matches_one_shot():
    """Tacotron-1: no postnet on the mel path (halo=0); the stream still
    equals the one-shot decode -> vocode path."""
    from nspeech_tpu.serving import Synthesizer, StreamingTTS, WaveNetVocoder

    cfg = load_config("taco1")
    cfg.parse("max_iters=6,encoder_cbhg_banks=1,post_cbhg_banks=1,"
              "attention_dim=16,decoder_dim=16,embedding_dim=16,"
              "griffin_lim_iters=1")
    cfg.encoder_prenet = [16, 16]
    cfg.encoder_cbhg_bank_sizes = [16]
    cfg.post_cbhg_bank_sizes = [80]
    model = create_model("taco1", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=16)
    synth.set_variables(params, bn_state, model=model)

    vcfg = load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=80,batch_size=1")
    net = create_model("wavenet", vcfg)
    vocoder = WaveNetVocoder(vcfg, use_pallas=False).set_variables(
        net, net.init(jax.random.PRNGKey(1)))

    wav_ref, total = _streaming_reference(synth, vocoder, "stream me")
    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    assert tts._halo == 0  # taco1: decoder frames ARE the mel
    wav_stream = tts.synthesize("stream me")
    assert wav_stream.shape == wav_ref.shape
    np.testing.assert_allclose(wav_stream, wav_ref, atol=1e-6)


def test_demo_server_streaming_route():
    """GET /synthesize_stream yields a RIFF header with unknown sizes
    followed by PCM chunks as the device produces them; decoded PCM
    equals the StreamingTTS output at fixed gain. Without a streamer the
    route 404s with a hint."""
    from types import SimpleNamespace

    from demo_server import make_app
    from nspeech_tpu.serving.streaming import StreamingTTS

    synth, vocoder = _micro_tts()
    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    app = make_app(synth, synth.cfg, streamer=tts)
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    pieces = list(app({"PATH_INFO": "/synthesize_stream",
                       "QUERY_STRING": "text=hello+world"}, start_response))
    assert captured["status"] == "200 OK"
    assert captured["headers"]["Content-Type"] == "audio/wav"
    assert "Content-Length" not in captured["headers"]  # streamed
    assert pieces[0][:4] == b"RIFF" and pieces[0][8:12] == b"WAVE"
    assert pieces[0][4:8] == b"\xff\xff\xff\xff"  # unknown total size
    assert len(pieces) >= 3  # header + >=2 audio chunks

    pcm = np.frombuffer(b"".join(pieces[1:]), "<i2").astype(np.float32)
    ref = np.clip(tts.synthesize("hello world"), -1, 1) * 32767.0
    np.testing.assert_allclose(pcm, ref.astype(np.int16).astype(np.float32),
                               atol=1.0)

    body = b"".join(app({"PATH_INFO": "/synthesize_stream",
                         "QUERY_STRING": "text=x"},
                        lambda s, h: captured.update(status=s)))
    # same app WITHOUT a streamer: route is absent
    app2 = make_app(synth, synth.cfg)
    body = b"".join(app2({"PATH_INFO": "/synthesize_stream",
                          "QUERY_STRING": "text=x"}, start_response))
    assert captured["status"].startswith("404")
    assert b"vocoder" in body


def test_streaming_tts_passes_global_conditioning():
    """A gc-trained (multi-speaker) vocoder must receive the speaker id
    on the STREAMING path too: the stream equals the one-shot pipeline
    vocoded WITH gc, and differs from the unconditioned stream.
    (Regression: voc_chunk once dropped gc entirely.)"""
    from nspeech_tpu.serving import Synthesizer, StreamingTTS, WaveNetVocoder

    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=4,outputs_per_step=2,encoder_conv_layers=1,"
        "postnet_conv_layers=2,postnet_conv_width=3,expand_conv_layers=1,"
        "encoder_conv_channels=16,attention_dim=16,postnet_conv_channels=16,"
        "expand_conv_channels=16,decoder_lstm_units=16,encoder_lstm_units=8,"
        "expand_lstm_units=8,embedding_dim=16,griffin_lim_iters=1,"
        "num_speakers=3")
    model = create_model("taco2", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=16)
    synth.set_variables(params, bn_state, model=model)

    vcfg = load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=80,batch_size=1,"
               "gc_channels=4,gc_category_cardinality=3")
    net = create_model("wavenet", vcfg)
    vocoder = WaveNetVocoder(vcfg, use_pallas=False).set_variables(
        net, net.init(jax.random.PRNGKey(1)))

    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    wav_spk1 = tts.synthesize("hi there", speaker_id=1)
    # reference conditions BOTH stages on speaker 1 (acoustic embedding
    # and vocoder gc) — exactly what the stream must reproduce
    mel = _one_shot_mel(synth, "hi there",
                        speaker_id=1)[: tts.last_total_frames]
    np.testing.assert_allclose(tts.last_mel, mel, atol=1e-6)
    # the one-shot pipeline semantics: speaker_id >= 0 -> gc_ids=[id]
    ref = np.asarray(vocoder.vocode(mel, speaker_id=1, temperature=0.0,
                                    seed=0), np.float32)
    np.testing.assert_allclose(wav_spk1, ref, atol=1e-6)

    wav_uncond = tts.synthesize("hi there", speaker_id=-1)
    assert np.abs(wav_spk1 - wav_uncond).max() > 1e-3  # gc really applied


def test_stream_batch_matches_one_shot_batch():
    """N concurrent streams == the one-shot BATCH path: the shared-clip
    batched vocode of the streamed mel buffer, trimmed per stream at its
    stop frame. Streams of different lengths end independently (later
    rounds yield None for an ended stream) and every yielded chunk is in
    stream order."""
    from nspeech_tpu.data.feeder import round_up
    from nspeech_tpu.models import decoder as D
    from nspeech_tpu.serving.streaming import StreamingTTS
    from nspeech_tpu.text import text_to_sequence
    from nspeech_tpu.text.symbols import PAD_ID

    # threshold from ALL streams' raw projection traces, chosen so the
    # three texts stop at DIFFERENT interior steps (random-init
    # projections are tiny everywhere, so a single-text threshold tends
    # to stop every stream at step 1)
    texts = ["hello world", "a very different input line", "hi"]
    synth0, _ = _micro_tts()
    cfg0 = synth0.cfg
    r = cfg0.outputs_per_step
    seqs = [text_to_sequence(t, ["english_cleaners"]) for t in texts]
    pad = round_up(max(len(sq) for sq in seqs), 16)
    ids = np.full((len(texts), pad), PAD_ID, np.int32)
    for i, sq in enumerate(seqs):
        ids[i, : len(sq)] = sq
    ctx, cell0 = synth0.model.attention_context(
        synth0._params, synth0._bn_state, jnp.asarray(ids),
        jnp.asarray([len(sq) for sq in seqs], jnp.int32),
        jnp.zeros((len(texts),), jnp.int32))
    step = synth0.model.make_eval_step(synth0._params, ctx)
    raw_outs, _, _ = D.scan_autoregressive(
        step, cell0, len(texts), cfg0.num_mels, r,
        max_iters=cfg0.max_iters)
    per_step = np.abs(np.asarray(raw_outs)).max(axis=2)   # [T, N]
    vals = sorted(set(per_step.ravel().tolist()))
    thresh = None
    for lo, hi in zip(vals, vals[1:]):
        c = (lo + hi) / 2.0   # robustly between two observed projections
        stops = [int(np.argmax(per_step[:, i] <= c))
                 if (per_step[:, i] <= c).any()
                 else cfg0.max_iters for i in range(len(texts))]
        if len(set(stops)) > 1:
            # some streams stop earlier than others (possibly only at
            # the budget cap) — real length divergence either way
            thresh = c
            break
    assert thresh is not None, "no differentiating threshold in traces"

    synth, vocoder = _micro_tts(stop_threshold=thresh)
    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    wavs = tts.synthesize_batch(texts)
    totals = [m.shape[0] for m in tts.last_mels]
    assert len(set(totals)) > 1           # genuinely different lengths
    assert tts.last_mel_batch.shape[1] == max(totals)

    # one-shot batch reference: shared-clip vocode of the same mel batch
    ref = vocoder.vocode_batch(tts.last_mel_batch, temperature=0.0)
    for i in range(len(texts)):
        assert wavs[i].shape == (totals[i] * tts._hop,)
        np.testing.assert_allclose(wavs[i], ref[i, : totals[i] * tts._hop],
                                   atol=1e-6)

    # an ended stream yields None while longer streams continue
    rounds = list(tts.stream_batch(texts))
    i_short = int(np.argmin(totals))
    i_long = int(np.argmax(totals))
    saw_none_with_live_long = any(
        ch[i_short] is None and ch[i_long] is not None and len(ch[i_long])
        for ch in rounds)
    assert saw_none_with_live_long


def test_stream_batch_single_equals_stream():
    """stream() is stream_batch at N=1: identical chunks."""
    from nspeech_tpu.serving.streaming import StreamingTTS

    synth, vocoder = _micro_tts()
    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    a = tts.synthesize("hello world")
    b = tts.synthesize_batch(["hello world"])[0]
    np.testing.assert_array_equal(a, b)


def test_stream_batch_padding_rows_start_finished():
    """Batch-padding rows (length 0) must be finished at t=0 in BOTH
    streaming start programs — otherwise a pad row decoding from PAD
    context can run the whole max_iters budget and stretch every real
    stream's tail (the one-shot path pins this via
    initial_finished=input_lengths < 1, tacotron2.py)."""
    from nspeech_tpu.serving.streaming import StreamingTTS
    from nspeech_tpu.text import text_to_sequence
    from nspeech_tpu.text.symbols import PAD_ID

    synth, vocoder = _micro_tts()
    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    seq = text_to_sequence("hello", ["english_cleaners"])
    ids = np.full((2, 16), PAD_ID, np.int32)
    ids[0, : len(seq)] = seq
    lengths = jnp.asarray([len(seq), 0], jnp.int32)
    spk = jnp.zeros((2,), jnp.int32)

    _ctx, _out0, carry = tts._start(jnp.asarray(ids), lengths, spk)
    finished = np.asarray(carry[3])
    assert bool(finished[1]) and not bool(finished[0])

    assert tts._use_prefix
    _ctx, pcarry, dec0, _mel0 = tts._prefix(jnp.asarray(ids), lengths, spk)
    assert bool(np.asarray(pcarry[3])[1])
    # finished rows emit zeros (the one-shot buffer's zero tail)
    assert float(np.abs(np.asarray(dec0)[1]).max()) == 0.0


def test_stream_batch_accepts_none_speaker():
    """None speaker_id means unconditioned (the documented contract and
    what StreamBatcher forwards) — it must not crash the id packing."""
    from nspeech_tpu.serving.streaming import StreamingTTS

    synth, vocoder = _micro_tts()
    tts = StreamingTTS(synth, vocoder, chunk_frames=4, temperature=0.0,
                       text_bucket=16)
    a = tts.synthesize_batch(["hello world"], [None])[0]
    b = tts.synthesize_batch(["hello world"], [-1])[0]
    np.testing.assert_array_equal(a, b)


def test_stream_growth_schedule_equivalence():
    """The ramped launch schedule (first chunk small, later chunks
    doubling to growth*V) yields the SAME concatenated waveform as
    fixed-size launches — the vocoder is causal with absolute sample
    positions, so only the yield boundaries move — while issuing fewer
    vocoder launches."""
    from nspeech_tpu.serving.streaming import StreamingTTS

    synth, vocoder = _micro_tts()
    text = "hello world"
    fixed = StreamingTTS(synth, vocoder, chunk_frames=2, temperature=0.0,
                         text_bucket=16, growth=1)
    ramped = StreamingTTS(synth, vocoder, chunk_frames=2, temperature=0.0,
                          text_bucket=16, growth=4)
    assert len(ramped._Vs) == 3                       # V, 2V, 4V
    assert fixed._Vs == [fixed._V]
    assert ramped._Vs[0] == fixed._V
    chunks_fixed = list(fixed.stream(text))
    chunks_ramped = list(ramped.stream(text))
    assert len(chunks_ramped) < len(chunks_fixed)     # really amortized
    # first chunk identical (time-to-first-audio unchanged)
    assert chunks_ramped[0].shape == chunks_fixed[0].shape
    np.testing.assert_allclose(
        np.concatenate(chunks_ramped), np.concatenate(chunks_fixed),
        atol=1e-6)
    # mel-level state identical too
    np.testing.assert_allclose(ramped.last_mel, fixed.last_mel, atol=0)
