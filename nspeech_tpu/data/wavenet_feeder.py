"""Host input pipeline for WaveNet training.

Rebuild of the reference's WavenetDataFeeder
(reference: neural_speech/datasets/WavenetDataFeeder.py): each utterance is
silence-trimmed, left-padded by the receptive field, and cut into windows of
``receptive_field + sample_size`` samples with ``sample_size`` hop, so
consecutive windows overlap by the receptive field (chunked long audio —
SURVEY.md §5 long-context notes).

TPU-native change: local conditioning features are mel frames computed once
per utterance and upsampled to per-sample resolution by frame-aligned linear
interpolation — replacing the reference's per-window STFT + scipy.misc
``imresize`` of a dB image (WavenetDataFeeder.py:130-138), which is both
slow and misaligned. Windows are batched to fixed shapes (jit-stable).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, NamedTuple, Optional

import numpy as np

from nspeech_tpu.config import Config, stft_params
from nspeech_tpu import dsp
from nspeech_tpu.data.corpus import Item, build_speaker_map, load_items


class WaveNetBatch(NamedTuple):
    audio: np.ndarray        # [B, receptive_field + sample_size] float32
    speaker_ids: np.ndarray  # [B] int32
    mel: np.ndarray          # [B, receptive_field + sample_size, M] float32


def upsample_frames(frames: np.ndarray, hop_length: int, length: int) -> np.ndarray:
    """[T_frames, C] frame features -> [length, C] per-sample features.

    Each frame t is anchored at sample t * hop_length (librosa centered-frame
    convention); values between anchors are linearly interpolated.
    """
    t_frames = frames.shape[0]
    anchors = np.arange(t_frames) * hop_length
    positions = np.arange(length)
    out = np.empty((length, frames.shape[1]), dtype=np.float32)
    for c in range(frames.shape[1]):
        out[:, c] = np.interp(positions, anchors, frames[:, c])
    return out


class WaveNetFeeder:
    """Fixed-shape window stream for WaveNet training."""

    def __init__(
        self,
        input_paths: Dict[str, str] | List[Item],
        receptive_field: int,
        cfg: Config,
        cache_dir: Optional[str] = None,
        shard_index: int = 0,
        shard_count: int = 1,
        seed: int = 0,
    ):
        self._cfg = cfg
        self._cache_dir = cache_dir
        self._seed = seed
        self.receptive_field = receptive_field
        self.sample_size = cfg.sample_size
        self.window = receptive_field + cfg.sample_size
        self.silence_threshold = cfg.get("silence_threshold", 0.1)
        _, self._hop, _ = stft_params(cfg)

        items = load_items(input_paths) if isinstance(input_paths, dict) else list(input_paths)
        self.speaker2id = build_speaker_map(items)
        self.num_speakers = len(self.speaker2id)
        self._items = items[shard_index::shard_count]

    def _utterance_windows(self, item: Item):
        """Yield (audio_window, speaker_id, mel_window) for one utterance."""
        from nspeech_tpu import native

        import jax

        wav_path, _text, local_speaker, dataset_id = item
        speaker_id = self.speaker2id[(dataset_id, str(local_speaker))]
        wav = native.load_wav(wav_path, self._cfg.sample_rate)
        if self.silence_threshold is not None:
            wav = dsp.trim_silence(wav, self.silence_threshold)
            if wav.size == 0:
                return  # silence-only utterance: skip (the reference warned
                # and then processed it anyway, WavenetDataFeeder.py:116-119)
        wav = np.pad(wav, (self.receptive_field, 0))
        # Per-utterance mel at per-sample resolution (computed once) —
        # input-pipeline work, pinned to the host CPU backend (see
        # data/features.py note).
        from nspeech_tpu.data.features import _host_cpu_device

        with jax.default_device(_host_cpu_device()):
            _, mel = dsp.spectrograms(wav, self._cfg)
        mel_samples = upsample_frames(np.asarray(mel), self._hop, len(wav))
        offset = 0
        while len(wav) - offset > self.window:
            yield (
                wav[offset: offset + self.window],
                speaker_id,
                mel_samples[offset: offset + self.window],
            )
            offset += self.sample_size

    def batches(self) -> Iterator[WaveNetBatch]:
        """Endless fixed-shape batch stream."""
        cfg = self._cfg
        epoch = 0
        buf_audio: list = []
        buf_spk: list = []
        buf_mel: list = []
        while True:
            rng = np.random.default_rng((self._seed, epoch))
            order = rng.permutation(len(self._items))
            for i in order:
                for audio, spk, mel in self._utterance_windows(self._items[i]):
                    buf_audio.append(audio)
                    buf_spk.append(spk)
                    buf_mel.append(mel)
                    if len(buf_audio) == cfg.batch_size:
                        yield WaveNetBatch(
                            np.stack(buf_audio).astype(np.float32),
                            np.asarray(buf_spk, dtype=np.int32),
                            np.stack(buf_mel).astype(np.float32),
                        )
                        buf_audio, buf_spk, buf_mel = [], [], []
            epoch += 1
