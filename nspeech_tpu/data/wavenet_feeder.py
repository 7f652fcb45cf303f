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

import os
from typing import Dict, Iterator, List, NamedTuple, Optional

import numpy as np

from nspeech_tpu.config import Config, stft_params
from nspeech_tpu import dsp
from nspeech_tpu.data.corpus import Item, build_speaker_map, load_items


class WaveNetBatch(NamedTuple):
    audio: np.ndarray        # [B, receptive_field + sample_size] float32
    speaker_ids: np.ndarray  # [B] int32
    # mel_phase None: ``mel`` is per-sample [B, window, M] (legacy layout).
    # mel_phase [B] int32: ``mel`` is FRAME-rate rows [B, F, M] whose first
    # row is anchored mel_phase[b] samples before the window start; the
    # train step upsamples on device (ops/upsample.upsample_window) —
    # ~hop_length x less host->device traffic.
    mel: np.ndarray
    mel_phase: Optional[np.ndarray] = None


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
        frame_lc: bool = True,
        gta_dir: Optional[str] = None,
    ):
        self._cfg = cfg
        self._cache_dir = cache_dir
        self._seed = seed
        self.receptive_field = receptive_field
        self.sample_size = cfg.sample_size
        self.window = receptive_field + cfg.sample_size
        self.silence_threshold = cfg.get("silence_threshold", 0.1)
        _, self._hop, _ = stft_params(cfg)
        # frame_lc: ship frame-rate mel + phase, upsampled on device
        # (default); False reproduces the legacy per-sample host layout.
        self.frame_lc = frame_lc
        # rows needed so the last window sample (phase+window-1 samples
        # past row 0's anchor) still has an i1 row
        self.frames_per_window = (self.window + self._hop - 2) // self._hop + 2
        # GTA mode: condition on Tacotron-PREDICTED mels (data/gta.py) so
        # the vocoder trains on the features it sees in serving. Stored row
        # i anchors at sample i*hop of the TRIMMED wav, so the left pad is
        # rounded up to whole hops and covered with silence-mel rows — the
        # anchor grid then matches the normal computed-mel layout exactly.
        self.gta_dir = gta_dir
        self._silence_row: Optional[np.ndarray] = None
        if gta_dir is not None:
            from nspeech_tpu.data.gta import check_fingerprint

            check_fingerprint(gta_dir, cfg)
            self._gta_pad = -(-receptive_field // self._hop) * self._hop

        items = load_items(input_paths) if isinstance(input_paths, dict) else list(input_paths)
        self.speaker2id = build_speaker_map(items)
        self.num_speakers = len(self.speaker2id)
        self._items = items[shard_index::shard_count]

    def _gta_mel(self, wav_path: str, trimmed_len: int) -> np.ndarray:
        """Load the exported teacher-forced mel for one utterance and
        prepend silence rows covering the (hop-rounded) receptive-field
        pad, so row anchors match the padded waveform's sample grid."""
        import jax

        from nspeech_tpu.data.gta import gta_path

        path = gta_path(self.gta_dir, wav_path)
        if not os.path.exists(path):
            raise FileNotFoundError(
                "No GTA mel for %r in %r — re-run export_gta.py over this "
                "corpus" % (wav_path, self.gta_dir))
        mel = np.load(path)
        expected = 1 + trimmed_len // self._hop
        if mel.shape[0] != expected:
            raise ValueError(
                "GTA mel for %r has %d frames, expected %d — the wav or "
                "trim settings changed since export" %
                (wav_path, mel.shape[0], expected))
        if self._silence_row is None:
            from nspeech_tpu.data.features import _host_cpu_device

            # Exact mel row of digital silence (the normalized dB floor):
            # what the computed-mel path yields over the zero left-pad.
            n_fft = stft_params(self._cfg)[0]
            with jax.default_device(_host_cpu_device()):
                _, zmel = dsp.spectrograms(
                    np.zeros(max(4 * self._hop, 2 * n_fft), np.float32),
                    self._cfg)
            self._silence_row = np.asarray(zmel)[:1]
        pad_rows = self._gta_pad // self._hop
        return np.concatenate(
            [np.repeat(self._silence_row, pad_rows, axis=0), mel], axis=0)

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
        from nspeech_tpu.data.features import _host_cpu_device

        if self.gta_dir is not None:
            mel = self._gta_mel(item[0], len(wav))
            wav = np.pad(wav, (self._gta_pad, 0))
        else:
            wav = np.pad(wav, (self.receptive_field, 0))
            # Per-utterance mel at per-sample resolution (computed once) —
            # input-pipeline work, pinned to the host CPU backend (see
            # data/features.py note).
            with jax.default_device(_host_cpu_device()):
                _, mel = dsp.spectrograms(wav, self._cfg)
            mel = np.asarray(mel)
        if not self.frame_lc:
            mel_samples = upsample_frames(mel, self._hop, len(wav))
        offset = 0
        while len(wav) - offset > self.window:
            if self.frame_lc:
                i_start = offset // self._hop
                phase = offset - i_start * self._hop
                rows = mel[i_start: i_start + self.frames_per_window]
                if rows.shape[0] < self.frames_per_window:  # edge-hold pad
                    pad = self.frames_per_window - rows.shape[0]
                    rows = np.concatenate(
                        [rows, np.repeat(rows[-1:], pad, axis=0)], axis=0)
                lc = (rows, phase)
            else:
                lc = (mel_samples[offset: offset + self.window], None)
            yield (wav[offset: offset + self.window], speaker_id) + lc
            offset += self.sample_size

    def batches(self) -> Iterator[WaveNetBatch]:
        """Endless fixed-shape batch stream."""
        cfg = self._cfg
        epoch = 0
        buf_audio: list = []
        buf_spk: list = []
        buf_mel: list = []
        buf_phase: list = []
        while True:
            rng = np.random.default_rng((self._seed, epoch))
            order = rng.permutation(len(self._items))
            for i in order:
                for audio, spk, mel, phase in self._utterance_windows(
                        self._items[i]):
                    buf_audio.append(audio)
                    buf_spk.append(spk)
                    buf_mel.append(mel)
                    buf_phase.append(phase)
                    if len(buf_audio) == cfg.batch_size:
                        yield WaveNetBatch(
                            np.stack(buf_audio).astype(np.float32),
                            np.asarray(buf_spk, dtype=np.int32),
                            np.stack(buf_mel).astype(np.float32),
                            (np.asarray(buf_phase, dtype=np.int32)
                             if self.frame_lc else None),
                        )
                        buf_audio, buf_spk, buf_mel, buf_phase = [], [], [], []
            epoch += 1
