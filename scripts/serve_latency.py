#!/usr/bin/env python
"""Serving-latency A/B for the calibrated early stop.

Times the one-program text->wav serving path (Synthesizer) on a trained
checkpoint at two stop thresholds — 0.0 (the decode runs its full
``max_iters`` budget: the cap latency bench.py reports for random-init
models) and the calibrated value — and reports the per-text latency and
decoder-step deltas:

  python scripts/serve_latency.py --checkpoint /tmp/fmt_run/fmt/ckpt \
      --threshold 0.18 --text "..." [--text ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(synth, texts, reps=3):
    rows = []
    for text in texts:
        synth.synthesize(text, want_features=False)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            wav, _, _ = synth.synthesize(text, want_features=False)
            best = min(best, time.perf_counter() - t0)
        rows.append({"text": text, "sec": round(best, 4),
                     "decoder_steps": int(synth.last_decoder_steps),
                     "audio_sec": round(len(wav) / synth.cfg.sample_rate, 2)})
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--threshold", type=float, required=True,
                   help="calibrated stop_threshold (see calibrate_stop.py)")
    p.add_argument("--text", action="append", default=[])
    p.add_argument("--hparams", default="")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    from nspeech_tpu.utils.platform import set_platform
    set_platform(args.platform)
    from nspeech_tpu.serving import Synthesizer

    texts = args.text or ["the quick onyx goblin jumps over the lazy dwarf."]
    extra = ("," + args.hparams) if args.hparams else ""

    out = {}
    for label, thr in (("cap", 0.0), ("calibrated", args.threshold)):
        synth = Synthesizer.from_checkpoint(
            args.checkpoint, overrides=f"stop_threshold={thr}{extra}")
        out[label] = {"stop_threshold": thr, "rows": _bench(synth, texts)}
    cap = np.mean([r["sec"] for r in out["cap"]["rows"]])
    cal = np.mean([r["sec"] for r in out["calibrated"]["rows"]])
    out["mean_sec_cap"] = round(float(cap), 4)
    out["mean_sec_calibrated"] = round(float(cal), 4)
    out["speedup"] = round(float(cap / cal), 2) if cal > 0 else None
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
