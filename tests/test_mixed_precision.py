"""Mixed-precision compute policy (``compute_dtype`` hparam, ops/policy.py).

The contract under ``compute_dtype=bfloat16``:

* master params / optimizer state / batch-norm stats stay float32 —
  checkpoints and the optimizer are dtype-unchanged;
* forward arithmetic runs in bf16 (scan carries included) with f32
  matmul accumulation; outputs stay close to the f32 forward;
* losses and gradients come out f32 and finite; training still learns;
* ``compute_dtype=float32`` (the default) is bit-identical to the
  pre-policy code path — pinned by tests/test_goldens.py.

The reference has no reduced-precision mode; this is TPU-native
beyond-parity surface (README "Mixed precision").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.data.feeder import Batch
from nspeech_tpu.data.wavenet_feeder import WaveNetBatch
from nspeech_tpu.models import create_model
from nspeech_tpu.models.wavenet import WaveNet
from nspeech_tpu.ops import policy
from nspeech_tpu.train import (
    build_tacotron_train_step,
    build_wavenet_train_step,
    create_state,
    make_optimizer,
)


def tiny_cfg(name, extra=""):
    cfg = load_config(name)
    if name == "taco1":
        cfg.parse("encoder_cbhg_banks=2,post_cbhg_banks=2,max_iters=4,"
                  "attention_dim=32,decoder_dim=32,embedding_dim=32,"
                  "batch_size=4" + extra)
        cfg.encoder_prenet = [32, 16]
        cfg.encoder_cbhg_bank_sizes = [32, 16]
        cfg.post_cbhg_bank_sizes = [32]
    elif name == "taco2":
        cfg.parse("max_iters=4,attention_dim=32,decoder_lstm_units=32,"
                  "encoder_lstm_units=16,encoder_conv_channels=32,"
                  "expand_lstm_units=16,expand_conv_channels=32,"
                  "postnet_conv_channels=32,embedding_dim=32,batch_size=4"
                  + extra)
    else:
        cfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
                  "dilation_channels=8,skip_channels=16,"
                  "quantization_channels=64,batch_size=4" + extra)
    return cfg


def make_batch(rng, n=4, t_in=10, t_out=10):
    return Batch(
        inputs=jnp.array(rng.integers(2, 60, (n, t_in)), jnp.int32),
        input_lengths=jnp.array([t_in] * n, jnp.int32),
        speaker_ids=jnp.zeros((n,), jnp.int32),
        mel_targets=jnp.array(rng.random((n, t_out, 80)), jnp.float32),
        linear_targets=jnp.array(rng.random((n, t_out, 1025)), jnp.float32),
        audio=jnp.zeros((n, 100), jnp.float32),
    )


def _assert_all_f32(tree, what):
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(leaf.dtype, jnp.inexact):
            assert leaf.dtype == jnp.float32, (
                f"{what}{jax.tree_util.keystr(path)} is {leaf.dtype}")


# ---------------------------------------------------------------------------
# Policy unit behavior
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_policy_cast_rules():
    cfg = tiny_cfg("taco1")
    assert policy.compute_dtype(cfg) == jnp.float32
    cfg.parse("compute_dtype=bfloat16")
    assert policy.compute_dtype(cfg) == jnp.bfloat16

    tree = {"w": jnp.ones((2,), jnp.float32), "ids": jnp.ones((2,), jnp.int32),
            "none": None}
    out = policy.cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == jnp.int32       # ints pass through
    assert out["none"] is None
    assert policy.cast_floats(None, jnp.bfloat16) is None

    cfg.parse("compute_dtype=int8")
    with pytest.raises(ValueError, match="float dtype"):
        policy.compute_dtype(cfg)


# ---------------------------------------------------------------------------
# Forward closeness + state dtypes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["taco1", "taco2"])
def test_bf16_forward_close_to_f32(name, rng):
    """Same weights, teacher-forced forward: bf16 tracks f32 within bf16
    rounding accumulation, and alignments still normalize."""
    cfg32 = tiny_cfg(name)
    model = create_model(name, cfg32)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = make_batch(rng)

    out32, _ = model.forward(params, state, batch.inputs, batch.input_lengths,
                             mel_targets=batch.mel_targets, is_training=False)
    cfg16 = tiny_cfg(name, extra=",compute_dtype=bfloat16")
    model16 = create_model(name, cfg16)
    out16, new_state = model16.forward(
        params, state, batch.inputs, batch.input_lengths,
        mel_targets=batch.mel_targets, is_training=False)

    assert out16["mel_outputs"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16["mel_outputs"], np.float32),
        np.asarray(out32["mel_outputs"]), atol=0.05, rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(out16["alignments"], np.float32).sum(axis=1),
        1.0, atol=0.02)
    # BN running statistics must stay f32 even when the pass is bf16
    _assert_all_f32(new_state, "bn_state")


def test_bf16_autoregressive_decode_runs(rng):
    """mel_targets=None exercises the while_loop decode: the GO frame and
    every carry must hold bf16 or the loop raises a carry-dtype error."""
    cfg = tiny_cfg("taco2", extra=",compute_dtype=bfloat16")
    model = create_model("taco2", cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = make_batch(rng)
    out, _ = model.forward(params, state, batch.inputs, batch.input_lengths,
                           mel_targets=None, is_training=False)
    assert out["mel_outputs"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out["mel_outputs"], np.float32)).all()
    assert out["decoder_steps"].shape == (4,)


# ---------------------------------------------------------------------------
# Training: f32 masters, finite f32 grads, deferred-dW agreement
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["taco1", "taco2"])
def test_bf16_train_step_keeps_f32_masters(name, rng):
    cfg = tiny_cfg(name, extra=",compute_dtype=bfloat16")
    model = create_model(name, cfg)
    tx, _ = make_optimizer(cfg, name)
    step = build_tacotron_train_step(model, tx)  # deferred-dW default on
    state = create_state(model, tx, jax.random.PRNGKey(0))
    batch = make_batch(rng)

    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["loss"].dtype == jnp.float32
    assert float(metrics["grad_norm"]) > 0.0
    _assert_all_f32(state.params, "params")
    _assert_all_f32(state.opt_state, "opt_state")
    assert int(state.step) == 2


def test_bf16_data_parallel_mesh_step(rng):
    """bf16 policy under GSPMD: the sharded step runs on an 8-device
    mesh, masters stay f32, loss matches the single-device step (the
    policy's casts must not perturb sharding propagation)."""
    from nspeech_tpu.parallel import make_mesh, shard_batch

    cfg = tiny_cfg("taco1", extra=",compute_dtype=bfloat16,batch_size=8")
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    batch = make_batch(rng, n=8)

    single = build_tacotron_train_step(model, tx)
    st = create_state(model, tx, jax.random.PRNGKey(0))
    _, m_single = single(st, batch, jax.random.PRNGKey(3))

    mesh = make_mesh()
    sharded = build_tacotron_train_step(model, tx, mesh=mesh)
    st2 = create_state(model, tx, jax.random.PRNGKey(0))
    st2, m_mesh = sharded(st2, shard_batch(batch, mesh), jax.random.PRNGKey(3))
    assert np.isfinite(float(m_mesh["loss"]))
    np.testing.assert_allclose(float(m_mesh["loss"]),
                               float(m_single["loss"]), rtol=2e-2)
    _assert_all_f32(st2.params, "params")


def test_bf16_deferred_matches_nondeferred(rng):
    """Deferred-dW reassociates the dW accumulation; under bf16 the two
    paths share the identical forward (losses equal) and produce
    closely-agreeing gradients."""
    cfg = tiny_cfg("taco2", extra=",compute_dtype=bfloat16")
    model = create_model("taco2", cfg)
    tx, _ = make_optimizer(cfg, "taco2")
    batch = make_batch(rng)

    results = {}
    for mode in (False, True):
        step = build_tacotron_train_step(model, tx, deferred_dw=mode)
        state = create_state(model, tx, jax.random.PRNGKey(0))
        _, metrics = step(state, batch, jax.random.PRNGKey(7))
        results[mode] = (float(metrics["loss"]), float(metrics["grad_norm"]))
    assert results[False][0] == pytest.approx(results[True][0], rel=1e-5)
    assert results[False][1] == pytest.approx(results[True][1], rel=0.05)


def test_bf16_wavenet_trains(rng):
    """WaveNet bf16 train step: finite f32 loss that decreases over a few
    steps on a fixed batch, masters stay f32."""
    cfg = tiny_cfg("wavenet", extra=",compute_dtype=bfloat16")
    net = WaveNet(cfg)
    tx, _ = make_optimizer(cfg, "wavenet")
    step = build_wavenet_train_step(net, tx, cfg)
    state = create_state(net, tx, jax.random.PRNGKey(0))
    W = net.receptive_field + 32
    batch = WaveNetBatch(
        audio=jnp.array(rng.uniform(-0.5, 0.5, (4, W)), jnp.float32),
        speaker_ids=jnp.zeros((4,), jnp.int32),
        mel=jnp.array(rng.random((4, W, 80)), jnp.float32),
    )
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    _assert_all_f32(state.params, "params")
    _assert_all_f32(state.opt_state, "opt_state")


def test_bf16_checkpoint_serves(rng, tmp_path):
    """A bf16-trained checkpoint must serve end-to-end: the decode runs
    bf16, Griffin-Lim upcasts at the DSP boundary, the wav comes out
    f32-finite. This is the boundary a dtype regression would break
    first (jnp.fft rejects bf16)."""
    from nspeech_tpu.serving.synthesizer import Synthesizer
    from nspeech_tpu.train import CheckpointManager

    cfg = tiny_cfg("taco1", extra=",compute_dtype=bfloat16")
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    step = build_tacotron_train_step(model, tx)
    state = create_state(model, tx, jax.random.PRNGKey(0))
    state, _ = step(state, make_batch(rng), jax.random.PRNGKey(0))

    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(int(state.step), state)
    mgr.wait()
    mgr.close()

    cfg.parse("griffin_lim_iters=3")
    synth = Synthesizer(cfg, text_bucket=16)
    synth.load(ckpt_dir, "taco1")
    wav, mel, lin = synth.synthesize("hello")
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(np.asarray(wav, np.float32)).all()
    assert np.isfinite(np.asarray(mel, np.float32)).all()


def test_bf16_aot_export_round_trip(tmp_path):
    """AOT jax.export of a bf16-policy synthesizer: the artifact embeds
    the bf16 program, loads with no model code, and reproduces the live
    synthesizer's spectrograms bit-for-bit."""
    import nspeech_tpu.config as config
    from nspeech_tpu.serving.export import (ExportedSynthesizer,
                                            export_synthesizer)
    from nspeech_tpu.serving.synthesizer import Synthesizer

    cfg = config.load_config("taco1")
    cfg.parse(
        "batch_size=2,max_iters=3,encoder_cbhg_banks=1,post_cbhg_banks=1,"
        "attention_dim=16,decoder_dim=16,embedding_dim=16,"
        "griffin_lim_iters=2,compute_dtype=bfloat16")
    cfg.encoder_prenet = [16, 16]
    cfg.encoder_cbhg_bank_sizes = [16]
    cfg.post_cbhg_bank_sizes = [80]
    cfg.num_speakers = 1
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    st = create_state(model, tx, jax.random.PRNGKey(0))
    synth = Synthesizer(cfg, text_bucket=32)
    synth.set_variables(st.params, st.bn_state, model=model)

    wav0, mel0, lin0 = synth.synthesize("hello world")
    out = export_synthesizer(synth, str(tmp_path / "art"), text_len=32,
                             batch=1)
    ex = ExportedSynthesizer(out)
    wav1, mel1, lin1 = ex.synthesize("hello world")
    np.testing.assert_array_equal(mel0, mel1)
    np.testing.assert_array_equal(lin0, lin1)
    assert np.isfinite(np.asarray(wav1, np.float32)).all()


def test_bf16_wavenet_logits_close_to_f32(rng):
    cfg = tiny_cfg("wavenet")
    net32 = WaveNet(cfg)
    params = net32.init(jax.random.PRNGKey(0))
    W = net32.receptive_field + 16
    audio = jnp.array(rng.uniform(-0.5, 0.5, (2, W)), jnp.float32)
    logits32, targets32 = net32.forward_train(params, audio)

    cfg16 = tiny_cfg("wavenet", extra=",compute_dtype=bfloat16")
    net16 = WaveNet(cfg16)
    logits16, targets16 = net16.forward_train(params, audio)
    assert logits16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(targets16), np.asarray(targets32))
    np.testing.assert_allclose(np.asarray(logits16, np.float32),
                               np.asarray(logits32), atol=0.05, rtol=0.05)
