"""Worker for the 2-process multi-host DCN test (run via subprocess).

Each process owns 2 virtual CPU devices; jax.distributed.initialize wires
them into one 4-device world over a 127.0.0.1 coordinator. The worker
feeds its per-host shard of a synthetic corpus through the WaveNet feeder,
assembles the global batch (parallel.shard_batch), and runs one
data-parallel train step — the same code path a TPU pod slice would take
(SURVEY.md §2.7 communication-backend row).

Prints ``RESULT <loss>`` on success; the parent asserts both processes
print the same finite loss (proof the gradient all-reduce spanned hosts).
"""

import sys


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    corpus_dir = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from nspeech_tpu.parallel import initialize_multihost

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 2 * num_processes  # global view
    assert len(jax.local_devices()) == 2

    import numpy as np

    import nspeech_tpu.config as config
    from nspeech_tpu.data.wavenet_feeder import WaveNetFeeder
    from nspeech_tpu.models import create_model
    from nspeech_tpu.parallel import make_mesh, shard_batch
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_wavenet_train_step

    cfg = config.load_config("wavenet")
    cfg.parse("dilations_length=3,dilations_depth=1,residual_channels=8,"
              "dilation_channels=8,skip_channels=16,"
              "quantization_channels=64,sample_size=256,batch_size=4")
    net = create_model("wavenet", cfg)

    # Per-host input shard: this process loads only its half of the corpus.
    feeder = WaveNetFeeder({"ljspeech": corpus_dir}, net.receptive_field,
                           cfg, shard_index=process_id,
                           shard_count=num_processes, seed=5)
    local = next(feeder.batches())
    # each host contributes batch_size/num_processes rows of the global batch
    per_host = cfg.batch_size // num_processes
    local = jax.tree_util.tree_map(lambda x: np.asarray(x)[:per_host], local)

    tx, _ = make_optimizer(cfg, "wavenet")
    mesh = make_mesh()  # all 4 global devices
    step_fn = build_wavenet_train_step(net, tx, cfg, mesh=mesh)
    state = create_state(net, tx, jax.random.PRNGKey(0))
    batch = shard_batch(local, mesh)  # global array from per-host shards
    state, metrics = step_fn(state, batch, None)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"RESULT {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
