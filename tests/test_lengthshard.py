"""Tacotron length sharding (SURVEY.md §2.7 SP row, VERDICT r1 item 10):
postnet/encoder conv stacks sharded over the frame axis on 8 virtual
devices must match the unsharded stacks bit-for-bit (the bidirectional
zero halo equals SAME padding's convention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.models.modules import (
    conv_and_lstm,
    init_conv_and_lstm,
    init_postnet,
    postnet,
)
from nspeech_tpu.parallel import make_mesh
from nspeech_tpu.parallel.lengthshard import (
    make_length_sharded_encoder_convs,
    make_length_sharded_postnet,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # 8 virtual CPU devices, data axis


def test_sharded_postnet_matches_unsharded(mesh, rng):
    params, state = init_postnet(jax.random.PRNGKey(0), in_dim=80,
                                 conv_layers=5, conv_width=5, channels=32)
    # perturb BN running stats so eval mode actually uses them
    state = jax.tree_util.tree_map(
        lambda x: x + 0.1 * np.arange(x.size).reshape(x.shape), state)
    x = jnp.asarray(rng.random((2, 128, 80)), jnp.float32)

    ref, _ = postnet(params, state, x, is_training=False)
    sharded_fn = make_length_sharded_postnet(mesh)
    out = sharded_fn(params, state, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_sharded_encoder_convs_match_unsharded(mesh, rng):
    cfg = load_config("taco2")
    params, state, _meta = init_conv_and_lstm(
        jax.random.PRNGKey(1), in_dim=16, conv_layers=3, conv_width=5,
        conv_channels=16, lstm_units=8)
    x = jnp.asarray(rng.random((2, 96, 16)), jnp.float32)

    # unsharded reference: just the conv part of conv_and_lstm
    from nspeech_tpu.ops import layers as L

    y = x
    n = len(params["convs"])
    for i, (p, s) in enumerate(zip(params["convs"], state["convs"])):
        act = jax.nn.relu if i < n - 1 else None
        y, _ = L.conv_bn(p, s, y, act, is_training=False)

    sharded_fn = make_length_sharded_encoder_convs(mesh)
    out = sharded_fn(params, state, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y),
                               atol=1e-6, rtol=1e-6)


def test_sharded_postnet_rejects_bad_lengths(mesh, rng):
    params, state = init_postnet(jax.random.PRNGKey(0), in_dim=8,
                                 conv_layers=2, conv_width=5, channels=8)
    fn = make_length_sharded_postnet(mesh)
    with pytest.raises(ValueError, match="not divisible"):
        fn(params, state, jnp.zeros((1, 30, 8)))
