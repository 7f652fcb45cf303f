"""Fused bidirectional RNNs (one stacked scan, hoisted input projections)
must match the separate-per-direction scans they replaced."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.ops import layers as L

pytestmark = pytest.mark.smoke


def _lengths(rng, n, t):
    return jnp.asarray(rng.integers(2, t + 1, (n,)), jnp.int32)


def test_bilstm_matches_separate_scans(rng):
    n, t, c, units = 3, 11, 6, 5
    key = jax.random.PRNGKey(0)
    pf = L.init_lstm(key, c, units)
    pb = L.init_lstm(jax.random.fold_in(key, 1), c, units)
    x = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
    lengths = _lengths(rng, n, t)

    ref = L.bidirectional(
        lambda seq: L.lstm_rnn(pf, seq, lengths, units),
        lambda seq: L.lstm_rnn(pb, seq, lengths, units),
        x, lengths)
    fused = L.bilstm_rnn(pf, pb, x, lengths, units)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-5, atol=1e-5)


def test_bilstm_no_lengths(rng):
    n, t, c, units = 2, 7, 4, 3
    key = jax.random.PRNGKey(2)
    pf = L.init_lstm(key, c, units)
    pb = L.init_lstm(jax.random.fold_in(key, 1), c, units)
    x = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
    ref = L.bidirectional(
        lambda seq: L.lstm_rnn(pf, seq, None, units),
        lambda seq: L.lstm_rnn(pb, seq, None, units),
        x, None)
    fused = L.bilstm_rnn(pf, pb, x, None, units)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-5, atol=1e-5)


def test_bigru_matches_separate_scans_with_h0(rng):
    n, t, c, units = 3, 9, 5, 4
    key = jax.random.PRNGKey(3)
    pf = L.init_gru(key, c, units)
    pb = L.init_gru(jax.random.fold_in(key, 1), c, units)
    x = jnp.asarray(rng.standard_normal((n, t, c)), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((n, units)), jnp.float32)
    lengths = _lengths(rng, n, t)

    ref = L.bidirectional(
        lambda seq: L.gru_rnn(pf, seq, h0, lengths, units),
        lambda seq: L.gru_rnn(pb, seq, h0, lengths, units),
        x, lengths)
    fused = L.bigru_rnn(pf, pb, x, h0, lengths, units)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-5, atol=1e-5)
