"""Dynamic request batching for serving.

TPU serving economics: one text per forward under-utilizes the chip, and
the synthesizer already compiles power-of-two batch buckets
(serving/synthesizer.py), so requests that arrive together should share
one padded device program. ``DynamicBatcher`` wraps anything with
``synthesize_batch(texts, speaker_ids) -> (wavs, mels, lins)`` (a
Synthesizer, TextToSpeech pipeline, or ExportedSynthesizer) and exposes
the single-request ``synthesize`` contract: concurrent callers enqueue,
one worker drains up to ``max_batch`` requests within ``window_ms`` of
the first, runs ONE batched forward, and fans results back out.

A single worker is deliberate: the device serializes programs anyway, so
extra in-flight batches would only add queueing without throughput. The
reference has no serving concurrency story at all (one tf.Session, one
request at a time — reference: demo_server.py:67-79).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional


class DynamicBatcher:
    def __init__(self, synthesizer, max_batch: int = 8,
                 window_ms: float = 10.0):
        if not hasattr(synthesizer, "synthesize_batch"):
            raise ValueError("synthesizer has no synthesize_batch")
        self._synth = synthesizer
        self.max_batch = max(1, int(max_batch))
        self.window = max(0.0, float(window_ms)) / 1000.0
        self._q: queue.Queue = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "max_batch_seen": 0}
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="dynamic-batcher")
        self._worker.start()

    # --- single-request surface (what make_app's routes call) -----------

    def synthesize(self, text: str, speaker_id: int = -1,
                   timeout: Optional[float] = 600.0):
        """Enqueue and wait; returns (wav, mel, lin) like Synthesizer.

        The default timeout keeps a dead worker from blocking callers
        forever (pass None only if you explicitly want to wait without
        bound)."""
        if not self._worker.is_alive():
            raise RuntimeError("DynamicBatcher worker thread is dead")
        fut: Future = Future()
        self._q.put((text, speaker_id, fut))
        return fut.result(timeout=timeout)

    def synthesize_batch(self, texts, speaker_ids=None):
        # A caller-assembled batch is already a batch: pass it through
        # (and keep it out of the dynamic window's accounting).
        return self._synth.synthesize_batch(texts, speaker_ids)

    @property
    def cfg(self):
        return getattr(self._synth, "cfg", None)

    def close(self) -> None:
        self._q.put(None)
        self._worker.join(timeout=5.0)

    # --- worker ----------------------------------------------------------

    def _run(self) -> None:
        import time

        while True:
            head = self._q.get()
            if head is None:
                return
            batch = [head]
            deadline = time.monotonic() + self.window
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    item = self._q.get(timeout=max(0.0, remaining))
                except queue.Empty:
                    break
                if item is None:
                    self._dispatch(batch)
                    return
                batch.append(item)
            self._dispatch(batch)

    def _dispatch(self, batch) -> None:
        # Default (-1) and explicit speaker conditioning cannot share a
        # batch (pipeline.synthesize_batch rejects the mix by design) —
        # independent requests may disagree, so partition first.
        default = [b for b in batch if b[1] is None or b[1] < 0]
        explicit = [b for b in batch if not (b[1] is None or b[1] < 0)]
        for group in (default, explicit):
            if group:
                self._dispatch_group(group)

    def _dispatch_group(self, batch, _retry: bool = False) -> None:
        texts = [t for t, _s, _f in batch]
        speakers = [s for _t, s, _f in batch]
        if not _retry:
            # Retries re-enter per item; counting them would double-book
            # every window-mate of a failed batch and skew the /stats
            # batching-efficiency numbers.
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["max_batch_seen"] = max(self.stats["max_batch_seen"],
                                               len(batch))
        try:
            wavs, mels, lins = self._synth.synthesize_batch(texts, speakers)
        except Exception as e:
            if len(batch) > 1:
                # Don't poison window-mates: one bad request (e.g. a
                # ClientError) re-runs each item alone so only it fails.
                for item in batch:
                    self._dispatch_group([item], _retry=True)
                return
            for _t, _s, fut in batch:
                if not fut.cancelled():
                    fut.set_exception(e)
            return
        for i, (_t, _s, fut) in enumerate(batch):
            if not fut.cancelled():
                fut.set_result((wavs[i], mels[i], lins[i]))


_STREAM_END = object()


class StreamBatcher:
    """Dynamic batching for STREAMING requests.

    Wraps a ``StreamingTTS``: concurrent callers iterate
    :meth:`stream`, one worker groups requests that arrive within
    ``window_ms`` of the first (up to ``max_batch``) and drives ONE
    ``stream_batch`` for the group — N concurrent streams cost barely
    more chip time than one (the batched Pallas launch; see
    serving/streaming.py). Chunks fan out to per-caller queues the
    moment the batched pipeline produces them, so time-to-first-audio
    for every caller in the group is one batched exactness window, not
    a queue of whole utterances.

    One worker, whole-utterance occupancy: while a streamed batch is in
    flight the chip is saturated with back-to-back launches, so new
    arrivals wait for the NEXT window rather than contending (the
    device would serialize them anyway and push the live batch below
    real time). Mid-stream failures abort the whole group — partial
    audio has already been sent, so per-item retry (DynamicBatcher's
    policy) cannot apply.
    """

    def __init__(self, streamer, max_batch: int = 8,
                 window_ms: float = 20.0):
        if not hasattr(streamer, "stream_batch"):
            raise ValueError("streamer has no stream_batch")
        self._tts = streamer
        self.max_batch = max(1, int(max_batch))
        self.window = max(0.0, float(window_ms)) / 1000.0
        self._q: queue.Queue = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "max_batch_seen": 0}
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="stream-batcher")
        self._worker.start()

    def stream(self, text: str, speaker_id: int = -1,
               timeout: Optional[float] = 600.0):
        """Enqueue and yield waveform chunks as the batched pipeline
        produces them. ``timeout`` bounds the wait for EACH chunk."""
        if not self._worker.is_alive():
            raise RuntimeError("StreamBatcher worker thread is dead")
        out: queue.Queue = queue.Queue()
        self._q.put((text, speaker_id, out))
        while True:
            try:
                item = out.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(
                    "StreamBatcher: no chunk within %.0f s — a COLD first "
                    "request compiles the batched chunk programs (can take "
                    "minutes on a fresh server); warm streams produce a "
                    "chunk every ~0.2 s" % (timeout or 0)) from None
            if item is _STREAM_END:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self) -> None:
        self._q.put(None)

    # --- worker ----------------------------------------------------------

    def _run(self) -> None:
        import time

        while True:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.window
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    item = self._q.get(timeout=max(0.0, remaining))
                except queue.Empty:
                    break
                if item is None:
                    self._dispatch(batch)
                    return
                batch.append(item)
            self._dispatch(batch)

    def _dispatch(self, batch) -> None:
        # default (-1) and explicit gc cannot share one vocoder batch
        # (stream_batch rejects the mix, mirroring synthesize_batch)
        default = [b for b in batch if b[1] is None or b[1] < 0]
        explicit = [b for b in batch if not (b[1] is None or b[1] < 0)]
        for group in (default, explicit):
            if group:
                self._dispatch_group(group)

    def _dispatch_group(self, batch) -> None:
        texts = [t for t, _s, _q in batch]
        speakers = [s for _t, s, _q in batch]
        queues = [q for _t, _s, q in batch]
        self.stats["requests"] += len(batch)
        self.stats["batches"] += 1
        self.stats["max_batch_seen"] = max(self.stats["max_batch_seen"],
                                           len(batch))
        try:
            for chunks in self._tts.stream_batch(texts, speakers):
                for q, c in zip(queues, chunks):
                    if c is not None and len(c):
                        q.put(c)
        except Exception as e:
            for q in queues:
                q.put(e)
            return
        for q in queues:
            q.put(_STREAM_END)
