"""Scheduled sampling (`scheduled_sampling_ratio` hparam, decoder.py):
at ratio=1.0 the teacher scan IS the autoregressive decode; at
intermediate ratios the deferred-dW train step stays exact (the fed-back
frame enters under stop_gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.models import decoder as D


def _toy_step(w, v, t_in, r):
    """Deterministic decoder-like step: out = tanh(x@W + h@V) + 0.1,
    never all-zero (so the autoregressive stop criterion never fires)."""

    def step(carry, x, rng):
        h = carry
        pre = jnp.tanh(x @ w + h @ v) + 0.1
        out = jnp.tile(pre, (1, r))
        align = jax.nn.softmax(jnp.tile(h[:, :1], (1, t_in)), axis=-1)
        return pre, (out, align)

    return step


@pytest.mark.smoke
def test_ratio_one_equals_autoregressive():
    """sampling_ratio=1.0 feeds back the model's own frames from the GO
    frame on — exactly the autoregressive decode, step for step."""
    S, N, M, r, t_in = 6, 3, 4, 2, 5
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((M, M)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, M)) * 0.3, jnp.float32)
    step = _toy_step(w, v, t_in, r)
    carry0 = jnp.zeros((N, M))
    teacher = jnp.asarray(rng.standard_normal((S, N, M)), jnp.float32)

    outs_ss, aligns_ss = D.scan_teacher(
        step, carry0, teacher, jax.random.PRNGKey(1), sampling_ratio=1.0)
    outs_ar, aligns_ar, steps = D.scan_autoregressive(
        step, carry0, N, M, r, max_iters=S)

    np.testing.assert_allclose(np.asarray(outs_ss), np.asarray(outs_ar),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(aligns_ss), np.asarray(aligns_ar),
                               atol=1e-6)
    assert (np.asarray(steps) == S).all()  # stop never fires for this toy


@pytest.mark.smoke
def test_ratio_zero_is_pure_teacher_forcing():
    """Explicit ratio=0.0 returns bit-identical results to the default
    teacher path (same code, but guard the dispatch)."""
    S, N, M, r, t_in = 5, 2, 3, 1, 4
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
    step = _toy_step(w, v, t_in, r)
    carry0 = jnp.zeros((N, M))
    teacher = jnp.asarray(rng.standard_normal((S, N, M)), jnp.float32)

    a = D.scan_teacher(step, carry0, teacher, jax.random.PRNGKey(2))
    b = D.scan_teacher(step, carry0, teacher, jax.random.PRNGKey(2),
                       sampling_ratio=0.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_taco2_train_step_deferred_matches_naive_with_sampling():
    """With scheduled_sampling_ratio=0.5 active, the deferred-dW train step
    still produces the same updated parameters as the naive transpose
    (stop_gradient on the feedback keeps the post-hoc dW matmuls exact,
    and both paths draw identical Bernoulli masks from the step rng)."""
    from nspeech_tpu.config import load_config
    from nspeech_tpu.data.feeder import Batch
    from nspeech_tpu.models import create_model
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_tacotron_train_step
    from tests.test_deferred import _tree_close

    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=4,encoder_conv_layers=2,postnet_conv_layers=2,"
        "expand_conv_layers=2,encoder_conv_channels=32,attention_dim=32,"
        "postnet_conv_channels=32,expand_conv_channels=32,"
        "decoder_lstm_units=48,encoder_lstm_units=24,expand_lstm_units=24,"
        "embedding_dim=32,batch_size=2,scheduled_sampling_ratio=0.5")
    model = create_model("taco2", cfg)
    tx, _ = make_optimizer(cfg, "taco2")

    rng = np.random.default_rng(5)
    batch = Batch(
        inputs=jnp.asarray(rng.integers(2, 40, (2, 11)), jnp.int32),
        input_lengths=jnp.asarray([11, 8], jnp.int32),
        speaker_ids=jnp.zeros((2,), jnp.int32),
        mel_targets=jnp.asarray(rng.random((2, 15, cfg.num_mels)),
                                jnp.float32),
        linear_targets=jnp.asarray(rng.random((2, 15, cfg.num_freq)),
                                   jnp.float32),
        audio=jnp.zeros((2, 4), jnp.float32),
    )

    results = {}
    for mode in (False, True):
        step_fn = build_tacotron_train_step(model, tx, deferred_dw=mode)
        state = create_state(model, tx, jax.random.PRNGKey(0))
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
        results[mode] = (state.params, float(metrics["loss"]))

    assert np.isclose(results[False][1], results[True][1], atol=1e-5)
    _tree_close(results[True][0], results[False][0], atol=2e-5)


def test_sampling_actually_mixes_model_frames():
    """At an intermediate ratio the outputs differ from pure teacher
    forcing (the Bernoulli mask really gates model feedback in)."""
    S, N, M, r, t_in = 8, 4, 3, 1, 4
    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, M)), jnp.float32)
    step = _toy_step(w, v, t_in, r)
    carry0 = jnp.zeros((N, M))
    teacher = jnp.asarray(rng.standard_normal((S, N, M)), jnp.float32)

    tf_outs, _ = D.scan_teacher(step, carry0, teacher, jax.random.PRNGKey(4))
    ss_outs, _ = D.scan_teacher(step, carry0, teacher, jax.random.PRNGKey(4),
                                sampling_ratio=0.5)
    assert float(np.abs(np.asarray(tf_outs - ss_outs)).max()) > 1e-4
