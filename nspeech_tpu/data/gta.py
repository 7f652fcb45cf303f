"""Ground-truth-aligned (GTA) mel export for vocoder fine-tuning.

The reference trains its vocoder on TRUE mels (reference:
train_wavenet.py:47 wires ``feeder.mel_targets`` as local conditioning) but
the end-to-end pipeline conditions it on Tacotron-PREDICTED mels — a
train/serve feature mismatch the reference never addresses. GTA export
closes it: run the acoustic model TEACHER-FORCED over the training corpus
(prediction frame t is conditioned on true frames < t, so predictions stay
frame-aligned with the audio) and save the predicted mels;
``WaveNetFeeder(gta_dir=...)`` then trains the vocoder on the same feature
distribution it sees in serving.

Alignment contract (shared with the feeder):
- the exporter trims each wav exactly as the vocoder feeder does
  (``dsp.trim_silence`` at ``cfg.silence_threshold``), so stored row ``i``
  is anchored at sample ``i * hop_length`` of the trimmed waveform;
- a ``manifest.json`` records the feature fingerprint (every hparam that
  changes mel values or the trim), and the feeder refuses a GTA directory
  whose fingerprint disagrees with its own config — a mismatch would
  otherwise train on silently mis-scaled features.

Export runs as a handful of jitted programs: utterances are length-sorted
and batched, text/frames padded to buckets, so the whole corpus compiles
O(buckets) programs instead of one per utterance.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional

import numpy as np

from nspeech_tpu.config import Config, stft_params
from nspeech_tpu import dsp

MANIFEST_FILE = "manifest.json"

# Every config key that changes either the mel values or the trim must be
# in the fingerprint; the vocoder feeder re-derives it from ITS config and
# compares.
_FINGERPRINT_KEYS = (
    "sample_rate", "num_freq", "num_mels", "frame_shift_ms",
    "frame_length_ms", "preemphasis", "ref_level_db", "min_level_db",
    "silence_threshold",
)


def fingerprint(cfg: Config) -> Dict[str, float]:
    return {k: cfg.get(k) for k in _FINGERPRINT_KEYS}


def gta_path(gta_dir: str, wav_path: str) -> str:
    """Stable per-wav file name (same hash on export and load)."""
    digest = hashlib.sha1(os.path.abspath(wav_path).encode()).hexdigest()[:20]
    return os.path.join(gta_dir, digest + ".npy")


def load_manifest(gta_dir: str) -> Dict:
    path = os.path.join(gta_dir, MANIFEST_FILE)
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def check_fingerprint(gta_dir: str, cfg: Config) -> Dict:
    """Raise unless the GTA directory was exported under feature hparams
    identical to ``cfg``'s. Returns the manifest."""
    manifest = load_manifest(gta_dir)
    theirs = manifest["fingerprint"]
    ours = fingerprint(cfg)
    diffs = {k: (theirs.get(k), ours[k]) for k in ours
             if theirs.get(k) != ours[k]}
    if diffs:
        raise ValueError(
            "GTA dir %r was exported under different feature hparams; "
            "mismatched keys (exported, current): %r" % (gta_dir, diffs))
    return manifest


def _round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def export_gta(
    checkpoint_dir: str,
    input_paths,
    out_dir: str,
    model_name: Optional[str] = None,
    overrides: str = "",
    step: Optional[int] = None,
    batch_size: int = 8,
    text_bucket: int = 32,
    frame_bucket: int = 128,
    log=print,
) -> Dict:
    """Teacher-forced mel export over a corpus. Returns the manifest."""
    import jax
    import jax.numpy as jnp

    from nspeech_tpu.data.corpus import Item, build_speaker_map, load_items
    from nspeech_tpu.data.features import _host_cpu_device
    from nspeech_tpu.models import create_model
    from nspeech_tpu.native import load_wav
    from nspeech_tpu.text import text_to_sequence
    from nspeech_tpu.text.symbols import PAD_ID
    from nspeech_tpu.train import (config_from_checkpoint, load_run_metadata,
                                   load_serving_params)

    cfg, name = config_from_checkpoint(checkpoint_dir, model_name, overrides)
    model = create_model(name, cfg)
    params, bn_state = load_serving_params(checkpoint_dir, model, cfg, name,
                                           step=step)
    r = cfg.outputs_per_step
    frame_bucket = _round_up(frame_bucket, r)
    _, hop, _ = stft_params(cfg)
    threshold = cfg.get("silence_threshold", 0.1)

    items: List[Item] = (load_items(input_paths)
                         if isinstance(input_paths, dict)
                         else list(input_paths))
    if not items:
        raise ValueError("No corpus items to export")
    # Speaker ids must match the ACOUSTIC model's training-time assignment;
    # prefer the map persisted next to its checkpoint.
    meta = load_run_metadata(checkpoint_dir) or {}
    if "speaker_map" in meta:
        speaker2id = {(ds, str(spk)): idx
                      for ds, spk, idx in meta["speaker_map"]}
    else:
        speaker2id = build_speaker_map(items)
    cleaners = [c.strip() for c in cfg.cleaners.split(",")]

    def forward(ids, lengths, spk, mels):
        outputs, _ = model.forward(
            params, bn_state, ids, lengths, speaker_ids=spk,
            mel_targets=mels, is_training=False)
        return outputs["mel_outputs"]

    fwd = jax.jit(forward)

    # Featurize on host CPU (input-pipeline work), length-sort so batches
    # share frame buckets, then run the jitted teacher-forced forward.
    prepared = []  # (item_index, ids, mel [F, M])
    for idx, (wav_path, text, local_spk, dataset_id) in enumerate(items):
        wav = load_wav(wav_path, cfg.sample_rate)
        if threshold is not None:
            wav = dsp.trim_silence(wav, threshold)
        if wav.size == 0:
            log("GTA: skipping silence-only %s" % wav_path)
            continue
        with jax.default_device(_host_cpu_device()):
            _, mel = dsp.spectrograms(wav, cfg)
        seq = np.asarray(text_to_sequence(text, cleaners), np.int32)
        prepared.append((idx, seq, np.asarray(mel)))
    prepared.sort(key=lambda p: p[2].shape[0])

    os.makedirs(out_dir, exist_ok=True)
    files: Dict[str, str] = {}
    for start in range(0, len(prepared), batch_size):
        chunk = prepared[start: start + batch_size]
        t_text = _round_up(max(p[1].shape[0] for p in chunk), text_bucket)
        t_mel = _round_up(
            _round_up(max(p[2].shape[0] for p in chunk), r), frame_bucket)
        n = batch_size  # fixed batch: one program per (t_text, t_mel)
        ids = np.full((n, t_text), PAD_ID, np.int32)
        lengths = np.zeros((n,), np.int32)
        spk = np.zeros((n,), np.int32)
        mels = np.zeros((n, t_mel, cfg.num_mels), np.float32)
        for b, (idx, seq, mel) in enumerate(chunk):
            ids[b, : seq.shape[0]] = seq
            lengths[b] = seq.shape[0]
            _, _, local_spk, dataset_id = items[idx]
            key = (dataset_id, str(local_spk))
            if cfg.get("num_speakers", 1) > 1:
                if key not in speaker2id:
                    raise ValueError(
                        "Speaker %r not in the checkpoint's speaker map" %
                        (key,))
                spk[b] = speaker2id[key]
            mels[b, : mel.shape[0]] = mel
        # One transient transport failure (e.g. a relayed-TPU compile RPC
        # dropping mid-read) must not discard the whole export: retry the
        # batch a few times before giving up. Programmatic errors (shape
        # mismatches etc.) reproduce identically and still fail fast.
        for attempt in range(3):
            try:
                out = np.asarray(fwd(jnp.asarray(ids), jnp.asarray(lengths),
                                     jnp.asarray(spk), jnp.asarray(mels)))
                break
            except Exception as e:  # jax runtime / RPC errors share no base
                if attempt == 2:
                    raise
                log("GTA: batch at %d failed (%s); retrying in %ds" %
                    (start, e, 5 * (attempt + 1)))
                import time as _time

                _time.sleep(5 * (attempt + 1))
        for b, (idx, _seq, mel) in enumerate(chunk):
            wav_path = items[idx][0]
            path = gta_path(out_dir, wav_path)
            # Crop the r-multiple/bucket padding back to the true frame
            # count so stored rows align 1:1 with the trimmed waveform.
            np.save(path, out[b, : mel.shape[0]].astype(np.float32))
            files[os.path.abspath(wav_path)] = os.path.basename(path)
        log("GTA: %d/%d utterances exported" %
            (min(start + batch_size, len(prepared)), len(prepared)))

    manifest = {
        "fingerprint": fingerprint(cfg),
        "model": name,
        "checkpoint": os.path.abspath(checkpoint_dir),
        "step": step,
        "count": len(files),
        "files": files,
    }
    tmp = os.path.join(out_dir, MANIFEST_FILE + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_FILE))
    return manifest
