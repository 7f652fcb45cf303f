"""Parallelism tests on 8 virtual CPU devices (SURVEY.md §4.4): mesh
construction, data-parallel train steps (grads psum'd by GSPMD), sharded
vs single-device numerical agreement, checkpoint save/restore."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.data.feeder import Batch
from nspeech_tpu.models import create_model
from nspeech_tpu.parallel import make_mesh, shard_batch
from nspeech_tpu.train import (
    CheckpointManager,
    build_tacotron_train_step,
    build_wavenet_train_step,
    create_state,
    make_optimizer,
)
from nspeech_tpu.train.optim import (
    exponential_halflife_schedule,
    noam_schedule,
)


def tiny_taco1_cfg():
    cfg = load_config("taco1")
    cfg.parse("encoder_cbhg_banks=2,post_cbhg_banks=2,max_iters=4,"
              "attention_dim=32,decoder_dim=32,embedding_dim=32,batch_size=8")
    cfg.encoder_prenet = [32, 16]
    cfg.encoder_cbhg_bank_sizes = [32, 16]
    cfg.post_cbhg_bank_sizes = [32]
    return cfg


def make_batch(rng, n=8, t_in=12, t_out=10):
    return Batch(
        inputs=jnp.array(rng.integers(2, 60, (n, t_in)), jnp.int32),
        input_lengths=jnp.array([t_in] * n, jnp.int32),
        speaker_ids=jnp.zeros((n,), jnp.int32),
        mel_targets=jnp.array(rng.random((n, t_out, 80)), jnp.float32),
        linear_targets=jnp.array(rng.random((n, t_out, 1025)), jnp.float32),
        audio=jnp.zeros((n, 100), jnp.float32),
    )


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.devices.shape == (4, 2)


def test_schedules():
    noam = noam_schedule(0.002)
    # warmup then decay
    assert float(noam(0)) < float(noam(3999))
    assert float(noam(3999)) > float(noam(100000))
    np.testing.assert_allclose(float(noam(3999)), 0.002, rtol=1e-3)
    halflife = exponential_halflife_schedule(0.002, 1000)
    np.testing.assert_allclose(float(halflife(1000)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(halflife(0)), 0.002, rtol=1e-6)


def test_data_parallel_tacotron_step(rng):
    cfg = tiny_taco1_cfg()
    model = create_model("taco1", cfg)
    tx, schedule = make_optimizer(cfg, "taco1")
    mesh = make_mesh()
    step = build_tacotron_train_step(model, tx, mesh=mesh, schedule=schedule)

    state = create_state(model, tx, jax.random.PRNGKey(0))
    batch = shard_batch(make_batch(rng), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # params remain replicated
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device(rng):
    """The 8-way data-parallel step must produce the same update as the
    unsharded step (same batch, same rng) — with multi-speaker
    conditioning on, so the speaker-embedding gather and its psum'd
    gradient are covered under GSPMD too."""
    cfg = tiny_taco1_cfg()
    cfg.parse("num_speakers=3")
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    mesh = make_mesh()
    batch = make_batch(rng)
    batch = batch._replace(
        speaker_ids=jnp.array(rng.integers(0, 3, (8,)), jnp.int32))

    step_sharded = build_tacotron_train_step(model, tx, mesh=mesh)
    step_single = build_tacotron_train_step(model, tx, mesh=None)

    s0 = create_state(model, tx, jax.random.PRNGKey(0))
    s1 = create_state(model, tx, jax.random.PRNGKey(0))
    out_sh, m_sh = step_sharded(s0, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    out_si, m_si = step_single(s1, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_si["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(out_sh.params)
    b = jax.tree_util.tree_leaves(out_si.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)


def test_data_parallel_wavenet_step(rng):
    cfg = load_config("wavenet")
    cfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
              "dilation_channels=8,skip_channels=16,quantization_channels=64,"
              "batch_size=8,gc_channels=4,gc_category_cardinality=4,lc_channels=80")
    from nspeech_tpu.data.wavenet_feeder import WaveNetBatch
    from nspeech_tpu.models.wavenet import WaveNet

    net = WaveNet(cfg)
    tx, schedule = make_optimizer(cfg, "wavenet")
    mesh = make_mesh()
    step = build_wavenet_train_step(net, tx, cfg, mesh=mesh, schedule=schedule,
                                    use_gc=True, use_lc=True)
    state = create_state(net, tx, jax.random.PRNGKey(0))
    W = net.receptive_field + 8
    batch = WaveNetBatch(
        audio=jnp.array(rng.uniform(-0.5, 0.5, (8, W)), jnp.float32),
        speaker_ids=jnp.array(rng.integers(0, 4, (8,)), jnp.int32),
        mel=jnp.array(rng.random((8, W, 80)), jnp.float32),
    )
    state, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_checkpoint_roundtrip(rng, tmp_path):
    cfg = tiny_taco1_cfg()
    model = create_model("taco1", cfg)
    tx, _ = make_optimizer(cfg, "taco1")
    step = build_tacotron_train_step(model, tx)
    state = create_state(model, tx, jax.random.PRNGKey(0))
    batch = make_batch(rng)
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, state)
    mgr.wait()
    assert mgr.latest_step() == 1

    template = create_state(model, tx, jax.random.PRNGKey(42))
    restored = mgr.restore(template)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
    mgr.close()
