"""Deferred (post-hoc) weight-gradient accumulation for in-scan matmuls
(ops/deferred.py) is EXACT: same gradients as the naive scan transpose,
on a bare LSTM scan and on the full Tacotron-2 train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.ops import deferred as DF
from nspeech_tpu.ops import layers as L

def _tree_close(a, b, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, va in flat_a:
        vb = flat_b[path]
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   atol=atol, rtol=1e-4,
                                   err_msg=str(path))


@pytest.mark.smoke
def test_deferred_lstm_scan_grads_match_naive():
    S, B, I, H = 7, 3, 5, 4
    rng = np.random.default_rng(0)
    params = L.init_lstm(jax.random.PRNGKey(1), I, H)
    xs = jnp.asarray(rng.standard_normal((S, B, I)), jnp.float32)
    c0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))

    def loss_naive(params):
        def body(carry, x):
            out, carry = L.lstm_cell(params, x, carry)
            return carry, out
        _, outs = jax.lax.scan(body, c0, xs)
        return jnp.sum(jnp.sin(outs) * outs)

    def loss_deferred(params, z):
        def body(carry, xz):
            x, z_t = xz
            out, carry, xh = DF.lstm_cell_deferred(params, x, carry, z_t)
            return carry, (out, xh)
        _, (outs, xhs) = jax.lax.scan(body, c0, (xs, z))
        return jnp.sum(jnp.sin(outs) * outs), xhs

    g_naive = jax.grad(loss_naive)(params)
    z0 = jnp.zeros((S, B, 4 * H))
    (gp, dz), xhs = jax.grad(loss_deferred, argnums=(0, 1),
                             has_aux=True)(params, z0)
    # in-scan weight grads are exactly zero under stop_gradient...
    assert float(jnp.abs(gp["kernel"]).max()) == 0.0
    # ...and the post-hoc matmul recovers the naive ones
    g_post = DF.matmul_grads(xhs, dz)
    _tree_close(g_post, g_naive, atol=1e-5)


@pytest.mark.smoke
def test_deferred_gru_scan_grads_match_naive():
    S, B, I, H = 6, 2, 4, 3
    rng = np.random.default_rng(2)
    params = L.init_gru(jax.random.PRNGKey(3), I, H)
    xs = jnp.asarray(rng.standard_normal((S, B, I)), jnp.float32)
    h0 = jnp.zeros((B, H))

    def loss_naive(params):
        def body(h, x):
            h = L.gru_cell(params, x, h)
            return h, h
        _, outs = jax.lax.scan(body, h0, xs)
        return jnp.sum(outs ** 2)

    def loss_deferred(params, zs):
        def body(h, xz):
            x, zg, zc = xz
            h, xh, xrh = DF.gru_cell_deferred(params, x, h, zg, zc)
            return h, (h, xh, xrh)
        _, (outs, xh, xrh) = jax.lax.scan(
            body, h0, (xs, zs["gate"], zs["cand"]))
        return jnp.sum(outs ** 2), (xh, xrh)

    g_naive = jax.grad(loss_naive)(params)
    zs0 = {"gate": jnp.zeros((S, B, 2 * H)), "cand": jnp.zeros((S, B, H))}
    (gp, dz), (xh, xrh) = jax.grad(loss_deferred, argnums=(0, 1),
                                   has_aux=True)(params, zs0)
    g_post = dict(DF.matmul_grads(xh, dz["gate"], "gate_kernel", "gate_bias"))
    g_post.update(DF.matmul_grads(xrh, dz["cand"], "cand_kernel", "cand_bias"))
    _tree_close(g_post, g_naive, atol=1e-5)


@pytest.mark.smoke
def test_deferred_bilstm_wh_grads_match_naive():
    """Fused one-scan BiLSTM: deferred recurrent-kernel grads (injection +
    post-hoc bilstm_wh_grads) == naive transpose, under length masking."""
    N, T, C, H = 3, 9, 5, 4
    rng = np.random.default_rng(7)
    p_fw = L.init_lstm(jax.random.PRNGKey(11), C, H)
    p_bw = L.init_lstm(jax.random.PRNGKey(12), C, H)
    x = jnp.asarray(rng.standard_normal((N, T, C)), jnp.float32)
    lengths = jnp.asarray([9, 6, 3], jnp.int32)

    def loss_naive(ps):
        out = L.bilstm_rnn(ps[0], ps[1], x, lengths, H)
        return jnp.sum(jnp.sin(out) * out)

    def loss_deferred(ps, z):
        out, h_entry = L.bilstm_rnn(ps[0], ps[1], x, lengths, H, z=z)
        return jnp.sum(jnp.sin(out) * out), h_entry

    g_naive = jax.grad(loss_naive)((p_fw, p_bw))
    z0 = jnp.zeros((T, 2 * N, 4 * H))
    (gp, dz), h_entry = jax.grad(loss_deferred, argnums=(0, 1),
                                 has_aux=True)((p_fw, p_bw), z0)
    # recurrent rows are exactly zero under stop_gradient; input rows and
    # biases keep their natural grads through the hoisted projection
    for g in gp:
        assert float(jnp.abs(g["kernel"][C:]).max()) == 0.0
    dwh_fw, dwh_bw = DF.bilstm_wh_grads(h_entry, dz)
    merged = (
        {"kernel": gp[0]["kernel"].at[C:].set(dwh_fw), "bias": gp[0]["bias"]},
        {"kernel": gp[1]["kernel"].at[C:].set(dwh_bw), "bias": gp[1]["bias"]},
    )
    _tree_close(merged, g_naive, atol=1e-5)


def test_taco2_train_step_deferred_matches_naive():
    """The full jitted Tacotron-2 train step produces the same updated
    parameters with and without deferred-dW."""
    from nspeech_tpu.config import load_config
    from nspeech_tpu.models import create_model
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_tacotron_train_step

    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=4,encoder_conv_layers=2,postnet_conv_layers=2,"
        "expand_conv_layers=2,encoder_conv_channels=32,attention_dim=32,"
        "postnet_conv_channels=32,expand_conv_channels=32,"
        "decoder_lstm_units=48,encoder_lstm_units=24,expand_lstm_units=24,"
        "embedding_dim=32,batch_size=2")
    model = create_model("taco2", cfg)
    tx, _ = make_optimizer(cfg, "taco2")

    rng = np.random.default_rng(5)
    from nspeech_tpu.data.feeder import Batch

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
    # pad targets to a multiple of r like the feeder does
    pad = (-batch.mel_targets.shape[1]) % cfg.outputs_per_step
    batch = batch._replace(
        mel_targets=jnp.pad(batch.mel_targets, ((0, 0), (0, pad), (0, 0))),
        linear_targets=jnp.pad(batch.linear_targets,
                               ((0, 0), (0, pad), (0, 0))))

    results = {}
    for mode in (False, True):
        step_fn = build_tacotron_train_step(model, tx, deferred_dw=mode)
        state = create_state(model, tx, jax.random.PRNGKey(0))
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
        results[mode] = (state.params, float(metrics["loss"]),
                         float(metrics["grad_norm"]))

    assert np.isclose(results[False][1], results[True][1], atol=1e-5)
    assert np.isclose(results[False][2], results[True][2], atol=1e-3)
    _tree_close(results[True][0], results[False][0], atol=2e-5)


def test_taco1_train_step_deferred_matches_naive():
    """Tacotron-1 (GRU decoder): deferred-dW train step matches naive."""
    from nspeech_tpu.config import load_config
    from nspeech_tpu.data.feeder import Batch
    from nspeech_tpu.models import create_model
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_tacotron_train_step

    cfg = load_config("taco1")
    cfg.parse("encoder_cbhg_banks=3,post_cbhg_banks=3,max_iters=4,"
              "attention_dim=32,decoder_dim=32,embedding_dim=32,batch_size=2")
    cfg.encoder_prenet = [32, 16]
    cfg.encoder_cbhg_bank_sizes = [32, 16]
    cfg.post_cbhg_bank_sizes = [32]
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")

    rng = np.random.default_rng(5)
    batch = Batch(
        inputs=jnp.asarray(rng.integers(2, 40, (2, 11)), jnp.int32),
        input_lengths=jnp.asarray([11, 8], jnp.int32),
        speaker_ids=jnp.zeros((2,), jnp.int32),
        mel_targets=jnp.asarray(rng.random((2, 15, cfg.num_mels)), jnp.float32),
        linear_targets=jnp.asarray(rng.random((2, 15, cfg.num_freq)), jnp.float32),
        audio=jnp.zeros((2, 4), jnp.float32),
    )
    pad = (-batch.mel_targets.shape[1]) % cfg.outputs_per_step
    batch = batch._replace(
        mel_targets=jnp.pad(batch.mel_targets, ((0, 0), (0, pad), (0, 0))),
        linear_targets=jnp.pad(batch.linear_targets, ((0, 0), (0, pad), (0, 0))))

    results = {}
    for mode in (False, True):
        step_fn = build_tacotron_train_step(model, tx, deferred_dw=mode)
        state = create_state(model, tx, jax.random.PRNGKey(0))
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
        results[mode] = (state.params, float(metrics["loss"]),
                        float(metrics["grad_norm"]))

    assert np.isclose(results[False][1], results[True][1], atol=1e-5)
    assert np.isclose(results[False][2], results[True][2], atol=1e-3)
    _tree_close(results[True][0], results[False][0], atol=2e-5)
