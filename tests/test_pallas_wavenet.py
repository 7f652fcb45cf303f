"""Pallas WaveNet sampler: interpret-mode equivalence against the lax.scan
generator (which itself is proven equivalent to the full network in
test_models.py), primed and unprimed, with and without global conditioning.

These tests compare autoregressive CODE sequences, which are chaotic in
the inputs: both sides decode with temperature 0 (pure argmax, the same
first-index tie-break rule in both implementations) and each test uses
its own fixed-seed rng so inputs never depend on test order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.models.wavenet import WaveNet
from nspeech_tpu.ops.pallas.wavenet_gen import generate_pallas, pack_params


def tiny_net(extra=""):
    cfg = load_config("wavenet")
    cfg.parse("dilations_length=3,dilations_depth=2,residual_channels=8,"
              "dilation_channels=8,skip_channels=16,quantization_channels=128,"
              "batch_size=1" + ("," + extra if extra else ""))
    return WaveNet(cfg)


def test_pallas_matches_scan_primed():
    rng = np.random.default_rng(1234)
    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0))
    seed_codes = jnp.array(rng.integers(0, 128, (1, net.receptive_field + 4)),
                           jnp.int32)
    scan_out = np.asarray(net.generate(
        params, 25, jax.random.PRNGKey(1), batch=1, seed_codes=seed_codes,
        temperature=0.0))
    pallas_out = np.asarray(generate_pallas(
        net, params, 25, seed_codes=seed_codes, deterministic=True,
        interpret=True))
    np.testing.assert_array_equal(scan_out, pallas_out)


def test_pallas_matches_scan_unprimed():
    rng = np.random.default_rng(1234)
    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0))
    scan_out = np.asarray(net.generate(params, 25, jax.random.PRNGKey(1),
                                       batch=1, temperature=0.0))
    pallas_out = np.asarray(generate_pallas(net, params, 25,
                                            deterministic=True, interpret=True))
    np.testing.assert_array_equal(scan_out, pallas_out)


def test_pallas_global_conditioning():
    rng = np.random.default_rng(1234)
    net = tiny_net("gc_channels=4,gc_category_cardinality=3")
    params = net.init(jax.random.PRNGKey(0))
    gc = jnp.array([2], jnp.int32)
    scan_out = np.asarray(net.generate(params, 20, jax.random.PRNGKey(1),
                                       batch=1, gc_ids=gc, temperature=0.0))
    pallas_out = np.asarray(generate_pallas(net, params, 20, gc_ids=gc,
                                            deterministic=True, interpret=True))
    np.testing.assert_array_equal(scan_out, pallas_out)
    # different speaker -> (almost surely) different stream
    scan_other = np.asarray(net.generate(params, 20, jax.random.PRNGKey(1),
                                         batch=1, gc_ids=jnp.array([0]),
                                         temperature=0.0))
    assert not np.array_equal(scan_out, scan_other)


def test_pack_params_shapes():
    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0))
    packed = pack_params(net, params)
    L, R, DC, S, Q = 6, 8, 8, 16, 128
    LANE = 128
    assert packed["wcc"].shape == (2 * Q, LANE)
    assert packed["wpre0"].shape == (LANE, LANE)
    assert packed["ws"].shape == (L, LANE, LANE + S)
    assert packed["post2"].shape == (S, Q)
    assert "gcside" not in packed  # no gc -> shared bias row only


def test_pallas_local_conditioning_matches_scan():
    rng = np.random.default_rng(1234)
    net = tiny_net("lc_channels=5")
    params = net.init(jax.random.PRNGKey(0))
    n = 20
    lc = jnp.array(rng.random((1, n, 5)), jnp.float32)
    scan_out = np.asarray(net.generate(params, n, jax.random.PRNGKey(1),
                                       batch=1, lc=lc, temperature=0.0))
    pallas_out = np.asarray(generate_pallas(net, params, n, lc=lc,
                                            deterministic=True,
                                            interpret=True))
    np.testing.assert_array_equal(scan_out, pallas_out)
    # different conditioning -> different stream
    lc2 = jnp.array(rng.random((1, n, 5)), jnp.float32)
    other = np.asarray(generate_pallas(net, params, n, lc=lc2,
                                       deterministic=True, interpret=True))
    assert not np.array_equal(pallas_out, other)


def test_pallas_lc_required_when_model_conditioned():
    net = tiny_net("lc_channels=5")
    params = net.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        generate_pallas(net, params, 10, interpret=True)


def test_pallas_batched_matches_scan():
    rng = np.random.default_rng(1234)
    net = tiny_net("gc_channels=4,gc_category_cardinality=3")
    params = net.init(jax.random.PRNGKey(0))
    B = 3
    gc = jnp.array([0, 2, 1], jnp.int32)
    seed_codes = jnp.array(rng.integers(0, 128, (B, net.receptive_field + 3)),
                           jnp.int32)
    scan_out = np.asarray(net.generate(
        params, 20, jax.random.PRNGKey(1), batch=B, gc_ids=gc,
        seed_codes=seed_codes, temperature=0.0))
    pallas_out = np.asarray(generate_pallas(
        net, params, 20, batch=B, gc_ids=gc, seed_codes=seed_codes,
        deterministic=True, interpret=True))
    assert pallas_out.shape == (B, 20)
    np.testing.assert_array_equal(scan_out, pallas_out)
    # streams with different speakers diverge
    assert not np.array_equal(pallas_out[0], pallas_out[1])


def test_pallas_batched_local_conditioning_matches_scan():
    rng = np.random.default_rng(1234)
    """Vocoding N=4 mel-conditioned streams through ONE kernel chain
    (VERDICT r1 item 7) matches per-stream scan generation."""
    net = tiny_net("lc_channels=5")
    params = net.init(jax.random.PRNGKey(0))
    N, n = 4, 18
    lc = jnp.array(rng.random((N, n, 5)), jnp.float32)
    scan_out = np.asarray(net.generate(params, n, jax.random.PRNGKey(1),
                                       batch=N, lc=lc, temperature=0.0))
    pallas_out = np.asarray(generate_pallas(net, params, n, batch=N, lc=lc,
                                            deterministic=True,
                                            interpret=True))
    np.testing.assert_array_equal(scan_out, pallas_out)


def test_pallas_batched_lc_with_gc_and_priming():
    rng = np.random.default_rng(1234)
    """Batched lc composes with per-stream speakers and priming."""
    net = tiny_net("lc_channels=5,gc_channels=4,gc_category_cardinality=3")
    params = net.init(jax.random.PRNGKey(0))
    N, n = 4, 12
    prime = net.receptive_field + 2
    lc = jnp.array(rng.random((N, prime + n, 5)), jnp.float32)
    gc = jnp.array([0, 1, 2, 1], jnp.int32)
    seeds = jnp.array(rng.integers(0, 128, (N, prime)), jnp.int32)
    scan_out = np.asarray(net.generate(
        params, n, jax.random.PRNGKey(1), batch=N, lc=lc, gc_ids=gc,
        seed_codes=seeds, temperature=0.0))
    pallas_out = np.asarray(generate_pallas(
        net, params, n, batch=N, lc=lc, gc_ids=gc, seed_codes=seeds,
        deterministic=True, interpret=True))
    np.testing.assert_array_equal(scan_out, pallas_out)


def test_pallas_unequal_residual_dilation_channels():
    rng = np.random.default_rng(1234)
    """R != DC exercises the ring_shift path (ring rows are rolled so the
    [s, 1] tail still lands on the v lanes)."""
    net = tiny_net("residual_channels=16")   # DC stays 8 -> ring_shift=8
    params = net.init(jax.random.PRNGKey(0))
    scan_out = np.asarray(net.generate(params, 20, jax.random.PRNGKey(1),
                                       batch=1, temperature=0.0))
    pallas_out = np.asarray(generate_pallas(net, params, 20,
                                            deterministic=True,
                                            interpret=True))
    np.testing.assert_array_equal(scan_out, pallas_out)


def test_pallas_chunked_matches_one_shot():
    """Carried-state launches (serving/streaming.py's vocoder backend):
    two aligned 128-sample chunks + one final partial chunk reproduce the
    one-shot kernel exactly — rings/one-hot/causal-half survive the launch
    boundary and ring slots use the absolute sample index."""
    from nspeech_tpu.ops.pallas.wavenet_gen import PallasWaveNetGenerator

    rng = np.random.default_rng(7)
    net = tiny_net("lc_channels=5,dilations_length=4")  # dilations to 8
    params = net.init(jax.random.PRNGKey(0))
    n = 300                                   # 2 x 128 + final 44
    lc = jnp.array(rng.random((1, n, 5)), jnp.float32)
    gen = PallasWaveNetGenerator(net, params, interpret=True)
    ref = np.asarray(gen(n, lc=lc, deterministic=True))
    carry = gen.chunk_carry0(1)
    c1, carry = gen.generate_chunk(carry, 128, lc=lc[:, :128],
                                   deterministic=True)
    assert carry[0] == 128
    c2, carry = gen.generate_chunk(carry, 128, lc=lc[:, 128:256],
                                   deterministic=True)
    c3, carry = gen.generate_chunk(carry, 44, lc=lc[:, 256:],
                                   deterministic=True, final=True)
    assert carry is None                      # final launch ends the stream
    got = np.concatenate([np.asarray(c) for c in (c1, c2, c3)], axis=1)
    np.testing.assert_array_equal(ref, got)


def test_pallas_chunked_rejects_unaligned():
    from nspeech_tpu.ops.pallas.wavenet_gen import PallasWaveNetGenerator

    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0))
    gen = PallasWaveNetGenerator(net, params, interpret=True)
    with pytest.raises(ValueError, match="multiples of 128"):
        gen.generate_chunk(gen.chunk_carry0(1), 100)


def test_streaming_pallas_backend_matches_scan(monkeypatch):
    """StreamingTTS with the Pallas vocoder backend (interpret mode on CPU)
    produces the same waveform as the scan backend at temperature 0 — the
    sample-cursor orchestration and the lc windows are backend-invariant."""
    import nspeech_tpu.ops.pallas.wavenet_gen as wg
    from nspeech_tpu.models import create_model
    from nspeech_tpu.serving.pipeline import WaveNetVocoder
    from nspeech_tpu.serving.streaming import StreamingTTS
    from nspeech_tpu.serving.synthesizer import Synthesizer
    from nspeech_tpu.config import load_config

    cfg = load_config("taco2")
    cfg.parse("max_iters=24,encoder_conv_layers=1,postnet_conv_layers=2,"
              "expand_conv_layers=1,encoder_conv_channels=16,"
              "attention_dim=16,postnet_conv_channels=16,"
              "expand_conv_channels=16,decoder_lstm_units=32,"
              "encoder_lstm_units=16,expand_lstm_units=16,embedding_dim=16")
    model = create_model("taco2", cfg)
    params, bn = model.init(jax.random.PRNGKey(0))
    syn = Synthesizer(cfg, text_bucket=16).set_variables(params, bn,
                                                         model=model)
    vcfg = load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=%d" % cfg.num_mels)
    net = WaveNet(vcfg)
    voc = WaveNetVocoder(vcfg, use_pallas=False).set_variables(
        net, net.init(jax.random.PRNGKey(1)))

    orig = wg.PallasWaveNetGenerator
    monkeypatch.setattr(
        wg, "PallasWaveNetGenerator",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    text = "streaming backends agree."
    ref = StreamingTTS(syn, voc, chunk_frames=8, temperature=0.0,
                       use_pallas=False).synthesize(text)
    got = StreamingTTS(syn, voc, chunk_frames=8, temperature=0.0,
                       use_pallas=True).synthesize(text)
    np.testing.assert_array_equal(ref, got)


def test_stream_batch_pallas_backend_matches_scan(monkeypatch):
    """Batched concurrent streaming on the Pallas backend (batch>1 takes
    the split-skip kernel path) == the scan backend, per stream."""
    import nspeech_tpu.ops.pallas.wavenet_gen as wg
    from nspeech_tpu.models import create_model
    from nspeech_tpu.serving.pipeline import WaveNetVocoder
    from nspeech_tpu.serving.streaming import StreamingTTS
    from nspeech_tpu.serving.synthesizer import Synthesizer
    from nspeech_tpu.config import load_config

    cfg = load_config("taco2")
    cfg.parse("max_iters=16,encoder_conv_layers=1,postnet_conv_layers=2,"
              "expand_conv_layers=1,encoder_conv_channels=16,"
              "attention_dim=16,postnet_conv_channels=16,"
              "expand_conv_channels=16,decoder_lstm_units=32,"
              "encoder_lstm_units=16,expand_lstm_units=16,embedding_dim=16")
    model = create_model("taco2", cfg)
    params, bn = model.init(jax.random.PRNGKey(0))
    syn = Synthesizer(cfg, text_bucket=16).set_variables(params, bn,
                                                         model=model)
    vcfg = load_config("wavenet")
    vcfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
               "dilation_channels=8,skip_channels=16,"
               "quantization_channels=64,lc_channels=%d" % cfg.num_mels)
    net = WaveNet(vcfg)
    voc = WaveNetVocoder(vcfg, use_pallas=False).set_variables(
        net, net.init(jax.random.PRNGKey(1)))

    orig = wg.PallasWaveNetGenerator
    monkeypatch.setattr(
        wg, "PallasWaveNetGenerator",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    texts = ["two streams", "in one batched kernel"]
    ref = StreamingTTS(syn, voc, chunk_frames=8, temperature=0.0,
                       use_pallas=False).synthesize_batch(texts)
    got = StreamingTTS(syn, voc, chunk_frames=8, temperature=0.0,
                       use_pallas=True).synthesize_batch(texts)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
