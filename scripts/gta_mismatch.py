#!/usr/bin/env python
"""Measure teacher-forced (GTA) vs ground-truth mel mismatch.

The round-4 GTA A/B produced an honest negative (fine-tuning the vocoder
on GTA mels did not beat the same steps on true mels —
docs/vocoder/README.md). This script supplies the missing explanation:
the size of the distribution shift GTA exists to bridge. If the
teacher-forced model's mels sit within ~the vocoder's own copy-synthesis
error of the true mels, there is no shift for GTA fine-tuning to learn
and it CANNOT pay on that corpus; GTA earns its keep when this mismatch
is large (weak acoustic model, hard corpus).

  python scripts/gta_mismatch.py --gta-dir /tmp/fmt_run/fmt/gta \
      --ljspeech /tmp/fmt --cache-dir /tmp/fmt_cache

Prints one JSON object: per-utterance mean-|Δ| distribution over the
export (mean / p50 / p90 / max), in the same normalized-mel units as the
copy-synthesis mel L1 reported by scripts/vocoder_report.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--gta-dir", required=True)
    p.add_argument("--ljspeech")
    p.add_argument("--vctk")
    p.add_argument("--librispeech")
    p.add_argument("--arctic")
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--max-utts", type=int, default=0,
                   help="cap the measured utterances (0 = all)")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args(argv)

    from nspeech_tpu.utils.platform import set_platform
    set_platform(args.platform)

    from nspeech_tpu.data.features import process_utterance
    from nspeech_tpu.data.gta import load_manifest
    from nspeech_tpu.train import config_from_checkpoint

    manifest = load_manifest(args.gta_dir)
    cfg, _model = config_from_checkpoint(manifest["checkpoint"])

    per_utt = []
    items = sorted(manifest["files"].items())
    if args.max_utts:
        items = items[: args.max_utts]
    for wav_path, npy_name in items:
        gta = np.load(os.path.join(args.gta_dir, npy_name))
        gt = process_utterance(wav_path, cfg, args.cache_dir).mel
        n = min(len(gta), len(gt))
        if n == 0:
            continue
        per_utt.append(float(np.mean(np.abs(gta[:n] - gt[:n]))))
    if not per_utt:
        print(json.dumps({"error": "no utterances measured"}))
        return 1
    arr = np.asarray(per_utt)
    out = {
        "n_utterances": len(arr),
        "mel_l1_mean": float(arr.mean()),
        "mel_l1_p50": float(np.percentile(arr, 50)),
        "mel_l1_p90": float(np.percentile(arr, 90)),
        "mel_l1_max": float(arr.max()),
        "checkpoint": manifest["checkpoint"],
        "step": manifest.get("step"),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
