"""Time-axis (sequence-parallel) WaveNet tests on 8 virtual devices:
halo-exchange sharded logits must equal the unsharded zero-padded
computation exactly, and the sharded training step must learn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nspeech_tpu.config import load_config
from nspeech_tpu.models.wavenet import WaveNet
from nspeech_tpu.parallel import make_mesh
from nspeech_tpu.parallel.timeshard import (
    build_time_sharded_wavenet_step,
    make_time_sharded_logits,
)


def tiny_net(extra=""):
    cfg = load_config("wavenet")
    cfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
              "dilation_channels=8,skip_channels=16,quantization_channels=64,"
              "batch_size=2" + ("," + extra if extra else ""))
    return WaveNet(cfg)


def test_sharded_logits_match_unsharded(rng):
    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    n = 8
    rf = net.receptive_field  # 9
    T = n * 16  # chunk 16 >= rf
    audio = jnp.array(rng.uniform(-0.8, 0.8, (2, T)), jnp.float32)

    fn = make_time_sharded_logits(net, mesh)
    logits_sh, targets_sh = fn(params, audio)

    # Unsharded equivalent: left-pad with the receptive field of zeros
    # (the reference feeder's convention) and run the plain network.
    padded = jnp.pad(audio, ((0, 0), (rf, 0)))
    logits_ref, targets_ref = net.forward_train(params, padded)

    assert logits_sh.shape == (2, T, 64)
    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(targets_sh),
                                  np.asarray(targets_ref))


def test_sharded_logits_with_conditioning(rng):
    net = tiny_net("gc_channels=4,gc_category_cardinality=3,lc_channels=5")
    params = net.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    T = 8 * 16
    audio = jnp.array(rng.uniform(-0.5, 0.5, (2, T)), jnp.float32)
    gc = jnp.array([0, 2], jnp.int32)
    lc = jnp.array(rng.random((2, T, 5)), jnp.float32)

    fn = make_time_sharded_logits(net, mesh, use_gc=True, use_lc=True)
    logits_sh, _ = fn(params, audio, gc_ids=gc, lc=lc)

    rf = net.receptive_field
    padded = jnp.pad(audio, ((0, 0), (rf, 0)))
    lc_padded = jnp.pad(lc, ((0, 0), (rf, 0), (0, 0)))
    logits_ref, _ = net.forward_train(params, padded, gc_ids=gc, lc=lc_padded)
    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_ref),
                               atol=2e-5, rtol=1e-5)


def test_sharded_step_learns(rng):
    from nspeech_tpu.data.wavenet_feeder import WaveNetBatch
    from nspeech_tpu.train import create_state, make_optimizer

    net = tiny_net()
    cfg = net.cfg
    tx, schedule = make_optimizer(cfg, "wavenet")
    mesh = make_mesh()
    step = build_time_sharded_wavenet_step(net, tx, mesh, schedule=schedule)
    state = create_state(net, tx, jax.random.PRNGKey(0))

    T = 8 * 16
    t = np.arange(T) / 32.0
    audio = jnp.array(np.tile(0.5 * np.sin(2 * np.pi * t), (2, 1)), jnp.float32)
    batch = WaveNetBatch(audio=audio,
                         speaker_ids=jnp.zeros((2,), jnp.int32),
                         mel=jnp.zeros((2, T, 1), jnp.float32))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, None)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_sharded_step_frame_lc_matches_per_sample(rng):
    """The time-sharded step must understand the feeder's default
    frame-rate lc layout (mel_phase set): same loss as the legacy
    per-sample layout carrying the host-upsampled equivalent."""
    from nspeech_tpu.config import stft_params
    from nspeech_tpu.data.wavenet_feeder import WaveNetBatch, upsample_frames
    from nspeech_tpu.train import create_state, make_optimizer

    net = tiny_net("lc_channels=3")
    cfg = net.cfg
    _, hop, _ = stft_params(cfg)
    tx, _ = make_optimizer(cfg, "wavenet")
    mesh = make_mesh()
    T = 8 * 16
    audio = jnp.array(rng.uniform(-0.5, 0.5, (2, T)), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    n_frames = T // hop + 2
    frames = np.asarray(rng.random((2, n_frames, 3)), np.float32)
    per_sample = np.stack([upsample_frames(f, hop, T) for f in frames])

    step = build_time_sharded_wavenet_step(net, tx, mesh, use_lc=True,
                                           cfg=cfg)
    state = create_state(net, tx, jax.random.PRNGKey(0))
    _, m_frame = step(state, WaveNetBatch(
        audio=audio, speaker_ids=ids, mel=jnp.asarray(frames),
        mel_phase=jnp.zeros((2,), jnp.int32)), None)
    state2 = create_state(net, tx, jax.random.PRNGKey(0))
    _, m_sample = step(state2, WaveNetBatch(
        audio=audio, speaker_ids=ids, mel=jnp.asarray(per_sample)), None)
    np.testing.assert_allclose(float(m_frame["loss"]),
                               float(m_sample["loss"]), rtol=1e-5)


def test_chunk_too_small_raises(rng):
    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    fn = make_time_sharded_logits(net, mesh)
    audio = jnp.zeros((1, 8 * 4), jnp.float32)  # chunk 4 < rf 9
    with pytest.raises(ValueError):
        fn(params, audio)
