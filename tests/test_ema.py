"""Polyak/EMA weight averaging (opt-in ``ema_decay`` hparam).

The Tacotron-2 and WaveNet papers both decode with an exponential moving
average of the weights; the reference repo never implemented it. Off by
default (parity); these tests pin the update math, the checkpoint
layout compatibility, and serving's preference for the averaged weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nspeech_tpu.config import load_config
from nspeech_tpu.data.feeder import Batch
from nspeech_tpu.models import create_model
from nspeech_tpu.train import (
    CheckpointManager,
    build_tacotron_train_step,
    create_state,
    make_optimizer,
)


def tiny_cfg():
    cfg = load_config("taco1")
    cfg.parse("encoder_cbhg_banks=2,post_cbhg_banks=2,max_iters=4,"
              "attention_dim=32,decoder_dim=32,embedding_dim=32,batch_size=4")
    cfg.encoder_prenet = [32, 16]
    cfg.encoder_cbhg_bank_sizes = [32, 16]
    cfg.post_cbhg_bank_sizes = [32]
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


def test_ema_update_math(rng):
    """ema_t = d * ema_{t-1} + (1-d) * params_t, seeded with the initial
    params — verified against a manual recurrence over two steps."""
    cfg = tiny_cfg()
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    decay = 0.5
    step = build_tacotron_train_step(model, tx, ema_decay=decay)
    state = create_state(model, tx, jax.random.PRNGKey(0), ema=True)
    # at init the average IS the params
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(e0))

    batch = make_batch(rng)
    # the jitted step donates the state, so track the recurrence on host
    # copies rather than holding on to donated device buffers
    expect = jax.tree_util.tree_map(np.asarray, state.params)
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        expect = jax.tree_util.tree_map(
            lambda e, p: e * decay + (1 - decay) * np.asarray(p),
            expect, state.params)
    for e, want in zip(jax.tree_util.tree_leaves(state.ema_params),
                       jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), want, atol=1e-6)
    # and the average genuinely lags the raw params after updates
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_ema_checkpoint_roundtrip_and_serving_preference(rng, tmp_path):
    """An EMA-enabled run checkpoints the averaged weights, and the
    Synthesizer restores THEM (not the raw params) when cfg.ema_decay>0."""
    from nspeech_tpu.serving import Synthesizer

    cfg = tiny_cfg()
    cfg.parse("ema_decay=0.9")
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    step = build_tacotron_train_step(model, tx, ema_decay=0.9)
    state = create_state(model, tx, jax.random.PRNGKey(0), ema=True)
    state, _ = step(state, make_batch(rng), jax.random.PRNGKey(1))

    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(int(state.step), state)
    mgr.wait()
    mgr.close()

    synth = Synthesizer(cfg, text_bucket=16).load(ckpt_dir, "taco1")
    got = jax.tree_util.tree_leaves(synth._params)[0]
    want = jax.tree_util.tree_leaves(state.ema_params)[0]
    raw = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)
    assert not np.allclose(np.asarray(got), np.asarray(raw))


def test_ema_toggle_between_save_and_restore(rng, tmp_path):
    """Restore must survive ema_decay being toggled after the save:
    enabling EMA on resume seeds the average at the restored params;
    disabling it drops the checkpoint's average (caller intent wins)."""
    cfg = tiny_cfg()
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")

    # saved WITHOUT ema, restored WITH: average seeded from params
    state = create_state(model, tx, jax.random.PRNGKey(0))
    ckpt_a = str(tmp_path / "a")
    mgr = CheckpointManager(ckpt_a)
    mgr.save(0, state)
    mgr.wait()
    tmpl_ema = jax.eval_shape(
        lambda: create_state(model, tx, jax.random.PRNGKey(0), ema=True))
    restored = mgr.restore(tmpl_ema)
    mgr.close()
    assert restored.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]))

    # saved WITH ema, restored WITHOUT: average dropped
    step = build_tacotron_train_step(model, tx, ema_decay=0.9)
    state = create_state(model, tx, jax.random.PRNGKey(0), ema=True)
    state, _ = step(state, make_batch(rng), jax.random.PRNGKey(1))
    ckpt_b = str(tmp_path / "b")
    mgr = CheckpointManager(ckpt_b)
    mgr.save(int(state.step), state)
    mgr.wait()
    tmpl_plain = jax.eval_shape(
        lambda: create_state(model, tx, jax.random.PRNGKey(0)))
    restored = mgr.restore(tmpl_plain)
    mgr.close()
    assert restored.ema_params is None
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]), atol=1e-7)


def test_checkpoint_without_ema_keeps_old_layout(rng, tmp_path):
    """ema off (the default) adds NO leaves to the checkpoint and
    restores with ema_params None — pre-EMA checkpoints stay loadable."""
    cfg = tiny_cfg()
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    state = create_state(model, tx, jax.random.PRNGKey(0))
    assert state.ema_params is None

    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, state)
    mgr.wait()
    template = jax.eval_shape(
        lambda: create_state(model, tx, jax.random.PRNGKey(0)))
    restored = mgr.restore(template)
    mgr.close()
    assert restored.ema_params is None
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
