"""Host input pipeline for the Tacotron models.

Deterministic, per-host-shardable rebuild of the reference's threaded
queue feeder (reference: neural_speech/datasets/datafeeder.py). Behavior
preserved (SURVEY.md §2.4): groups of ``batch_size * batch_group_size``
examples are sorted by output length (bucketing to reduce padding), batches
shuffled within the group, inputs padded with symbol id 0, targets padded to
a multiple of ``outputs_per_step``.

TPU-native changes:
- padded shapes are additionally rounded up to coarse shape buckets so a
  jitted train step compiles a small bounded set of programs instead of one
  per batch (SURVEY.md §7 hard part 6);
- the example stream is deterministic per (seed, epoch) and sharded by
  (shard_index, shard_count) for multi-host feeding — no shared mutable
  state across threads (the reference raced on its offset/memo cache,
  SURVEY.md §5 race notes);
- a single background prefetch thread keeps a bounded queue of ready
  batches (replacing the TF RandomShuffleQueue producer threads).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, NamedTuple, Optional

import numpy as np

from nspeech_tpu.config import Config, stft_params
from nspeech_tpu.data.corpus import Item, build_speaker_map, load_items
from nspeech_tpu.data.features import process_utterance
from nspeech_tpu.text import text_to_sequence
from nspeech_tpu.text.symbols import PAD_ID

_P_CMUDICT = 0.5  # probability of ARPAbet substitution per word


class Batch(NamedTuple):
    inputs: np.ndarray          # [B, T_in] int32 symbol ids
    input_lengths: np.ndarray   # [B] int32
    speaker_ids: np.ndarray     # [B] int32
    mel_targets: np.ndarray     # [B, T_out, M] float32
    linear_targets: np.ndarray  # [B, T_out, F] float32
    audio: np.ndarray           # [B, T_samples] float32 (padded waveforms)


# ---------------------------------------------------------------------------
# Padding / bucketing math (reference: datafeeder.py:189-220)
# ---------------------------------------------------------------------------

def round_up(x: int, multiple: int) -> int:
    remainder = x % multiple
    return x if remainder == 0 else x + multiple - remainder


def pad_inputs(seqs: List[np.ndarray], length: Optional[int] = None) -> np.ndarray:
    max_len = max(len(s) for s in seqs)
    length = max(length or 0, max_len)
    return np.stack([
        np.pad(s, (0, length - len(s)), constant_values=PAD_ID) for s in seqs
    ])


def pad_targets(targets: List[np.ndarray], r: int,
                length: Optional[int] = None) -> np.ndarray:
    # +1 guarantees at least one pure-padding frame (reference: datafeeder.py:206)
    max_len = round_up(max(len(t) for t in targets) + 1, r)
    length = round_up(max(length or 0, max_len), r)
    return np.stack([
        np.pad(t, [(0, length - len(t)), (0, 0)], constant_values=0.0)
        for t in targets
    ])


class DataFeeder:
    """Bucketed, shape-stable batch stream.

    Args:
      input_paths: dict corpus_name -> directory (reference: train.py:18-27).
      cfg: hyperparameters.
      cache_dir: on-disk feature cache directory (None disables).
      shard_index / shard_count: per-host sharding of the example list.
      bucket_text / bucket_frames: shape-bucket granularity; padded batch
        shapes are rounded up to these multiples to bound jit recompilation.
        bucket_frames must be a multiple of outputs_per_step.
      cmudict: optional CMUDict for random ARPAbet substitution
        (activates the reference's dormant path, datafeeder.py:178-186).
    """

    def __init__(
        self,
        input_paths: Dict[str, str] | List[Item],
        cfg: Config,
        cache_dir: Optional[str] = None,
        shard_index: int = 0,
        shard_count: int = 1,
        seed: int = 0,
        bucket_text: int = 32,
        bucket_frames: int = 100,
        cmudict=None,
        prefetch: int = 4,
        holdout: int = 0,
    ):
        self._cfg = cfg
        self._cache_dir = cache_dir
        self._cleaners = [x.strip() for x in cfg.cleaners.split(",")]
        self._seed = seed
        r = cfg.outputs_per_step
        if bucket_frames % r != 0:
            bucket_frames = round_up(bucket_frames, r)
        self._bucket_text = bucket_text
        self._bucket_frames = bucket_frames
        _, self._hop, _ = stft_params(cfg)
        self._cmudict = cmudict
        self._prefetch = prefetch

        items = load_items(input_paths) if isinstance(input_paths, dict) else list(input_paths)
        # Speaker map over the FULL corpus (holdout items keep their ids).
        self.speaker2id = build_speaker_map(items)
        self.num_speakers = len(self.speaker2id)
        # Held-out dev set: evenly spaced over the (deterministic) item
        # list, so it spreads across corpora/speakers, is identical on
        # every host and across resumes, and never enters training.
        self.holdout_items: List[Item] = []
        if holdout:
            if holdout >= len(items):
                raise ValueError(
                    "holdout=%d must be smaller than the corpus (%d items)"
                    % (holdout, len(items)))
            idx = set(np.linspace(0, len(items) - 1, holdout)
                      .astype(int).tolist())
            self.holdout_items = [items[i] for i in sorted(idx)]
            items = [it for i, it in enumerate(items) if i not in idx]
        # Per-host shard (deterministic round-robin).
        self._items = items[shard_index::shard_count]
        self._memo: dict = {}

    def holdout_batch(self) -> Batch:
        """One padded batch of the held-out items (teacher-forcing eval
        targets). Deterministic: CMUDict substitution is bypassed."""
        if not self.holdout_items:
            raise ValueError("feeder was built with holdout=0")
        saved, self._cmudict = self._cmudict, None
        try:
            rng = np.random.default_rng(0)
            examples = [self._example(it, rng) for it in self.holdout_items]
        finally:
            self._cmudict = saved
        return self._make_batch(examples)

    # -- example level ------------------------------------------------------

    def _example(self, item: Item, rng: np.random.Generator):
        wav_path, text, local_speaker, dataset_id = item
        speaker_id = self.speaker2id[(dataset_id, str(local_speaker))]
        key = (wav_path, dataset_id)
        utt = self._memo.get(key)
        if utt is None:
            utt = process_utterance(wav_path, self._cfg, self._cache_dir)
            if self._cache_dir is None:
                self._memo[key] = utt
        if self._cmudict is not None and rng.random() < _P_CMUDICT:
            text = " ".join(self._maybe_arpabet(w, rng) for w in text.split(" "))
        ids = np.asarray(text_to_sequence(text, self._cleaners), dtype=np.int32)
        return ids, utt.wav, speaker_id, utt.mel, utt.linear, utt.n_frames

    def _maybe_arpabet(self, word: str, rng: np.random.Generator) -> str:
        pron = self._cmudict.lookup(word)
        return "{%s}" % pron[0] if pron is not None and rng.random() < 0.5 else word

    # -- batch level --------------------------------------------------------

    def _make_batch(self, examples) -> Batch:
        r = self._cfg.outputs_per_step
        text_len = round_up(max(len(e[0]) for e in examples), self._bucket_text)
        frame_len = round_up(max(len(e[4]) for e in examples) + 1, self._bucket_frames)
        inputs = pad_inputs([e[0] for e in examples], text_len)
        input_lengths = np.asarray([len(e[0]) for e in examples], dtype=np.int32)
        # Audio must be shape-bucketed too: jit keys on every batch leaf's
        # shape (even unused ones), so an unbucketed waveform axis would
        # force a recompile per batch.
        audio_len = round_up(max(len(e[1]) for e in examples),
                             self._bucket_frames * self._hop)
        audio = pad_inputs([e[1] for e in examples], audio_len).astype(np.float32)
        speaker_ids = np.asarray([e[2] for e in examples], dtype=np.int32)
        mel = pad_targets([e[3] for e in examples], r, frame_len).astype(np.float32)
        linear = pad_targets([e[4] for e in examples], r, frame_len).astype(np.float32)
        return Batch(inputs, input_lengths, speaker_ids, mel, linear, audio)

    def epoch_batches(self, epoch: int) -> Iterator[Batch]:
        """Deterministic batch stream for one pass over the shard."""
        cfg = self._cfg
        rng = np.random.default_rng((self._seed, epoch))
        order = rng.permutation(len(self._items))
        n = cfg.batch_size
        if len(order) == 0:
            raise RuntimeError(
                "DataFeeder shard has no items (empty corpus path or more "
                "hosts than utterances) — nothing to batch")
        if len(order) < n:
            # Tiny corpus/shard: wrap around so a full batch still forms
            # (the reference's feeder cycles its cursor and never starves,
            # datafeeder.py:160-176). Without this an epoch yields zero
            # batches and the prefetch producer would spin forever.
            reps = -(-n // len(order))
            order = np.concatenate(
                [rng.permutation(len(self._items)) for _ in range(reps)])
        group_size = n * cfg.batch_group_size
        for g in range(0, len(order) - n + 1, group_size):
            group_idx = order[g: g + group_size]
            examples = [self._example(self._items[i], rng) for i in group_idx]
            # Bucket by output length to reduce padding (datafeeder.py:141-147).
            examples.sort(key=lambda e: e[-1])
            batches = [examples[i: i + n] for i in range(0, len(examples) - n + 1, n)]
            rng.shuffle(batches)
            for batch in batches:
                rng.shuffle(batch)
                yield self._make_batch(batch)

    @property
    def queue_fill(self) -> float:
        """Prefetch-queue fill ratio (the reference surfaced this as its
        backpressure signal, train.py:80-84)."""
        q = getattr(self, "_queue", None)
        if q is None:
            return 0.0
        return q.qsize() / max(1, self._prefetch)

    def batches(self) -> Iterator[Batch]:
        """Endless batch stream with background prefetch."""
        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        self._queue = q
        stop = threading.Event()
        error: list = []

        def producer():
            epoch = 0
            try:
                while not stop.is_set():
                    yielded = 0
                    for b in self.epoch_batches(epoch):
                        q.put(b)
                        yielded += 1
                        if stop.is_set():
                            return
                    if yielded == 0:  # defensive: never silently spin
                        raise RuntimeError(
                            f"epoch {epoch} produced no batches "
                            f"({len(self._items)} items, batch_size="
                            f"{self._cfg.batch_size})")
                    epoch += 1
            except BaseException as e:  # propagate to consumer
                error.append(e)
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    raise error[0]
                yield b
        finally:
            stop.set()
            # Drain so the producer can observe the stop flag.
            try:
                q.get_nowait()
            except queue.Empty:
                pass
