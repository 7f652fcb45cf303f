"""Tensor-parallel Tacotron-2 on a 4x2 (data x model) virtual mesh: the
TP-sharded training step must match the data-parallel-only step."""

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import load_config
from nspeech_tpu.data.feeder import Batch
from nspeech_tpu.models import create_model
from nspeech_tpu.parallel import make_mesh, shard_batch
from nspeech_tpu.parallel.tensor import (
    shard_params,
    shard_train_state,
    spec_for_path,
)
from nspeech_tpu.train import create_state, make_optimizer
from nspeech_tpu.train.loop import build_tacotron_train_step


def tiny_cfg():
    cfg = load_config("taco2")
    cfg.parse(
        "max_iters=3,encoder_conv_layers=1,postnet_conv_layers=1,"
        "expand_conv_layers=1,encoder_conv_channels=16,attention_dim=16,"
        "postnet_conv_channels=16,expand_conv_channels=16,"
        "decoder_lstm_units=32,encoder_lstm_units=8,expand_lstm_units=8,"
        "embedding_dim=16,batch_size=4")
    return cfg


def make_batch(rng, n=4):
    return Batch(
        inputs=jnp.array(rng.integers(2, 60, (n, 8)), jnp.int32),
        input_lengths=jnp.array([8] * n, jnp.int32),
        speaker_ids=jnp.zeros((n,), jnp.int32),
        mel_targets=jnp.array(rng.random((n, 10, 80)), jnp.float32),
        linear_targets=jnp.array(rng.random((n, 10, 1025)), jnp.float32),
        audio=jnp.zeros((n, 16), jnp.float32),
    )


def test_tp_rules():
    P = jax.sharding.PartitionSpec
    assert spec_for_path("['lstm1']['kernel']") == P(None, "model")
    assert spec_for_path("['attn_lstm']['kernel']") == P(None, "model")
    assert spec_for_path("['frame_proj']['kernel']") == P("model", None)
    # Megatron column->row prenet
    assert spec_for_path("['decoder_prenet']['layers'][0]['kernel']") == P(None, "model")
    assert spec_for_path("['decoder_prenet']['layers'][1]['kernel']") == P("model", None)
    # attention energy consistently sharded over attention dims
    assert spec_for_path("['attention']['memory_layer']['kernel']") == P(None, "model")
    assert spec_for_path("['attention']['v']") == P("model")
    # conv channels sharded; location conv (21 filters) stays replicated
    assert spec_for_path("['encoder']['convs'][0]['conv']['kernel']") == P(None, None, "model")
    assert spec_for_path("['attention']['location_conv']['kernel']") == P()
    # 1025 freq bins don't divide: row-parallel linear projection
    assert spec_for_path("['linear_proj']['kernel']") == P("model", None)
    assert spec_for_path("['embedding']['table']") == P()


def test_tp_step_matches_dp(rng):
    cfg = tiny_cfg()
    model = create_model("taco2", cfg)
    tx, _ = make_optimizer(cfg, "taco2")
    mesh = make_mesh(model_parallel=2)  # 4 data x 2 model
    batch = make_batch(rng)

    # Reference: plain single-device step.
    step_ref = build_tacotron_train_step(model, tx)
    s_ref = create_state(model, tx, jax.random.PRNGKey(0))
    s_ref, m_ref = step_ref(s_ref, batch, jax.random.PRNGKey(1))

    # TP: same initial state placed with model-axis shardings; the jitted
    # step picks the shardings up from the committed inputs.
    step_tp = build_tacotron_train_step(model, tx, mesh=None)
    s_tp = create_state(model, tx, jax.random.PRNGKey(0))
    s_tp = shard_train_state(s_tp, mesh)
    # verify placement took effect
    k = s_tp.params["lstm1"]["kernel"]
    assert not k.sharding.is_fully_replicated
    data = shard_batch(batch, mesh)
    s_tp, m_tp = step_tp(s_tp, data, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=2e-5)
    # Adam's normalized update amplifies reduction-order noise on ~zero
    # gradients to +-lr, so raw params can differ by up to the step size;
    # bound by that and check the training trajectory agrees via the
    # second-step loss.
    lr = 2 * cfg.initial_learning_rate
    for x, y in zip(jax.tree_util.tree_leaves(s_tp.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=lr)
    s_ref, m_ref2 = step_ref(s_ref, batch, jax.random.PRNGKey(2))
    s_tp, m_tp2 = step_tp(s_tp, data, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m_tp2["loss"]), float(m_ref2["loss"]),
                               rtol=5e-3)
    # sharding is preserved through the update
    assert not s_tp.params["lstm1"]["kernel"].sharding.is_fully_replicated
