"""Device-resident batch cache for corpora that fit in HBM.

The host feeder streams ~25 MB of padded targets per Tacotron batch. On a
directly-attached TPU host that transfer hides behind the step; through a
thin link (or when steps are fast — the deferred-dW step is 27 ms) it
dominates. For small corpora the TPU-idiomatic answer is to stop
streaming: featurize, bucket, and pad every batch ONCE, ``device_put``
them all into HBM, and iterate device-resident batches forever — per-step
host->device traffic drops to the PRNG key.

Batch COMPOSITION is fixed after warmup (``n_epoch_variants`` distinct
epoch groupings are materialized, default 4); batch ORDER is reshuffled
every epoch. This trades the reference feeder's fully-online shuffling
(neural_speech/datasets/datafeeder.py:141-152) for zero steady-state
input cost; use the streaming feeder when the corpus does not fit.

The ``audio`` field (unused by the train step) is truncated to a stub so
HBM holds features, not waveforms.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np

from nspeech_tpu.data.feeder import Batch, DataFeeder


class DeviceCachedBatches:
    def __init__(self, feeder: DataFeeder, n_epoch_variants: int = 4,
                 seed: int = 0, keep_audio: bool = False, mesh=None):
        import jax

        host_batches: List[Batch] = []
        frame_len = 0
        text_len = 0
        for epoch in range(n_epoch_variants):
            for b in feeder.epoch_batches(epoch):
                if not keep_audio:
                    b = b._replace(audio=b.audio[:, :8])
                host_batches.append(b)
                frame_len = max(frame_len, b.mel_targets.shape[1])
                text_len = max(text_len, b.inputs.shape[1])
        if not host_batches:
            raise RuntimeError("feeder produced no batches to cache")
        # Pad every batch to the SAME shapes so the jitted step compiles
        # exactly once (shape buckets already bound this; the residual
        # spread across buckets is a few percent of frames).
        uniform = []
        for b in host_batches:
            dt = text_len - b.inputs.shape[1]
            df = frame_len - b.mel_targets.shape[1]
            uniform.append(b._replace(
                inputs=np.pad(b.inputs, ((0, 0), (0, dt))),
                mel_targets=np.pad(b.mel_targets, ((0, 0), (0, df), (0, 0))),
                linear_targets=np.pad(b.linear_targets,
                                      ((0, 0), (0, df), (0, 0))),
            ))
        # Placement: with a data-parallel mesh the batches are pinned
        # ALREADY SHARDED over the mesh's data axis, so the runner's
        # per-step shard_batch device_put is a no-op (same sharding).
        # Multi-host assembly needs per-process host shards every step, so
        # there the cache stays host-side (it still saves featurization
        # and padding work, not the transfer).
        self.device_resident = jax.process_count() == 1
        if self.device_resident:
            sharding = None
            if mesh is not None:
                from nspeech_tpu.parallel.mesh import batch_sharding

                sharding = batch_sharding(mesh)
            self._batches = [
                jax.device_put(b, sharding) if sharding is not None
                else jax.device_put(b)
                for b in uniform]
        else:
            self._batches = uniform
        self._rng = np.random.default_rng(seed)
        mb = sum(
            sum(x.nbytes for x in b) for b in uniform) / 1e6
        self.cached_mb = mb
        self.n_batches = len(self._batches)

    def batches(self) -> Iterator[Batch]:
        """Endless device-resident batch stream, order reshuffled per
        epoch."""
        while True:
            for i in self._rng.permutation(self.n_batches):
                yield self._batches[int(i)]
