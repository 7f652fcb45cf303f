#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: Tacotron-2 training throughput in mel frames/sec/chip on the
default backend (the real TPU when available). Baseline target: 10,000
frames/sec/chip on v5e (BASELINE.md); ``vs_baseline`` is value/10000.

Extra metrics (WaveNet sampling rate, etc.) can be printed with --all;
the driver consumes only the first/default line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_taco2_train(batch_size: int = 32, t_in: int = 160, t_out: int = 400,
                      steps: int = 10):
    # Training default: single-pass bf16 MXU matmuls (~2x over fp32 passes).
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    import nspeech_tpu.config as config
    from nspeech_tpu.data.feeder import Batch
    from nspeech_tpu.models import create_model
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_tacotron_train_step
    from nspeech_tpu.train.runner import pick_mesh

    cfg = config.load_config("taco2")
    cfg.batch_size = batch_size
    model = create_model("taco2", cfg)
    tx, schedule = make_optimizer(cfg, "taco2")
    mesh = pick_mesh(batch_size)
    step_fn = build_tacotron_train_step(model, tx, mesh=mesh, schedule=schedule)
    state = create_state(model, tx, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = Batch(
        inputs=jnp.asarray(rng.integers(2, 60, (batch_size, t_in)), jnp.int32),
        input_lengths=jnp.asarray([t_in] * batch_size, jnp.int32),
        speaker_ids=jnp.zeros((batch_size,), jnp.int32),
        mel_targets=jnp.asarray(rng.random((batch_size, t_out, cfg.num_mels)),
                                jnp.float32),
        linear_targets=jnp.asarray(rng.random((batch_size, t_out, cfg.num_freq)),
                                   jnp.float32),
        audio=jnp.zeros((batch_size, 16), jnp.float32),
    )
    if mesh is not None:
        from nspeech_tpu.parallel import shard_batch

        batch = shard_batch(batch, mesh)

    key = jax.random.PRNGKey(1)
    # Warmup: compile + pipeline spin-up. NOTE: the scalar readback
    # (float()) is the sync point — block_until_ready is not reliable on
    # relayed backends; and the first post-compile step is ~10x slower, so
    # take the median of per-step readback times after two warmup steps.
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, 100 + i))
        float(metrics["loss"])

    times = []
    for i in range(steps):
        start = time.perf_counter()
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        float(metrics["loss"])
        times.append(time.perf_counter() - start)
    sec_per_step = sorted(times)[len(times) // 2]

    n_chips = len(jax.devices())
    return batch_size * t_out / sec_per_step / n_chips, sec_per_step


def bench_wavenet_generate(n_samples: int = 4000, batch: int = 1):
    """Pallas VMEM-resident sampler (full 50-layer default config)."""
    import nspeech_tpu.config as config
    from nspeech_tpu.models.wavenet import WaveNet
    from nspeech_tpu.ops.pallas.wavenet_gen import PallasWaveNetGenerator

    cfg = config.load_config("wavenet")
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    gen = PallasWaveNetGenerator(net, params)
    np.asarray(gen(n_samples, seed=0, batch=batch))  # compile
    best = float("inf")
    for s in range(3):
        start = time.perf_counter()
        np.asarray(gen(n_samples, seed=1 + s, batch=batch))
        best = min(best, time.perf_counter() - start)
    rate = batch * n_samples / best
    return rate, rate / cfg.sample_rate


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true",
                        help="Also print secondary metrics")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=32)
    args = parser.parse_args()

    frames_per_sec, sec_per_step = bench_taco2_train(
        batch_size=args.batch_size, steps=args.steps)
    print(json.dumps({
        "metric": "taco2_train_mel_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / 10000.0, 3),
    }))

    if args.all:
        rate, rtf = bench_wavenet_generate(batch=1)
        print(json.dumps({
            "metric": "wavenet_pallas_single_stream_samples_per_sec",
            "value": round(rate, 1),
            "unit": "samples/sec",
            "vs_baseline": round(rtf / 5.0, 4),  # target: 5x real time
        }))
        rate8, rtf8 = bench_wavenet_generate(batch=8)
        print(json.dumps({
            "metric": "wavenet_pallas_batch8_samples_per_sec_per_chip",
            "value": round(rate8, 1),
            "unit": "samples/sec/chip",
            "vs_baseline": round(rtf8 / 5.0, 4),
        }))
        print(json.dumps({
            "metric": "taco2_sec_per_step",
            "value": round(sec_per_step, 4),
            "unit": "sec",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()
