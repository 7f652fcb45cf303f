#!/usr/bin/env python
"""Calibrate the decoder early-stop threshold from a training corpus.

Computes the silence-floor / speech-danger statistics over the corpus
mels (nspeech_tpu/train/stopcal.py), prints the recommendation as JSON,
and with ``--apply`` writes it into a trained run's ``config.json`` so
every serving consumer picks it up with no flags:

  python scripts/calibrate_stop.py --ljspeech /tmp/fmt \
      --cache-dir /tmp/fmt_cache --hparams "outputs_per_step=2" \
      --apply /tmp/fmt_run/fmt/ckpt

Uses the run's own effective hparams (``--from-run``) when given, so the
feature extraction and ``r`` match training exactly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ljspeech")
    p.add_argument("--vctk")
    p.add_argument("--librispeech")
    p.add_argument("--arctic")
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--hparams", default="")
    p.add_argument("--from-run", default=None,
                   help="ckpt dir whose run metadata supplies the hparams")
    p.add_argument("--max-utts", type=int, default=400)
    p.add_argument("--tail", type=int, default=5)
    p.add_argument("--apply", default=None,
                   help="ckpt dir whose config.json gets the threshold")
    p.add_argument("--run-dir", default=None,
                   help="calibrate from the TRAINED model's own decodes "
                        "(ckpt dir or log_dir/<run>): synthesizes --text "
                        "sentences at full budget and measures post-speech "
                        "vs in-speech emission levels — the right source "
                        "on trimmed corpora (see stopcal.py)")
    p.add_argument("--text", action="append", default=[],
                   help="sentences for --run-dir calibration decodes")
    p.add_argument("--speakers", default="",
                   help="comma-separated speaker ids for --run-dir decodes")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args(argv)

    from nspeech_tpu.utils.platform import set_platform
    set_platform(args.platform)

    import nspeech_tpu.config as config
    from nspeech_tpu.data.corpus import load_items
    from nspeech_tpu.data.features import process_utterance
    from nspeech_tpu.train.stopcal import (stop_statistics,
                                           stop_statistics_from_decodes)

    if args.run_dir:
        from nspeech_tpu import dsp
        from nspeech_tpu.serving import Synthesizer

        ckpt = args.run_dir
        if not os.path.exists(os.path.join(ckpt, "config.json")):
            ckpt = os.path.join(ckpt, "ckpt")
        overrides = "stop_threshold=0"  # full-budget decodes while measuring
        if args.hparams:
            overrides += "," + args.hparams
        synth = Synthesizer.from_checkpoint(ckpt, overrides=overrides)
        _, hop, _ = config.stft_params(synth.cfg)
        speakers = ([int(s) for s in args.speakers.split(",")]
                    if args.speakers else [-1])
        texts = args.text or [
            "the quick onyx goblin jumps over the lazy dwarf.",
            "a b c d e f g h i j k l m.",
            "this sentence exists to measure where speech ends.",
        ]
        mels, bounds = [], []
        for text in texts:
            for spk in speakers:
                wav, mel, _ = synth.synthesize(text, speaker_id=spk,
                                               want_features="mel")
                mels.append(mel)          # full decode, never trimmed
                bounds.append(len(wav) // hop)  # wav IS endpoint-trimmed
        stats = stop_statistics_from_decodes(
            mels, bounds, r=int(synth.cfg.outputs_per_step))
        stats["r"] = int(synth.cfg.outputs_per_step)
        stats["source"] = "decodes"
        print(json.dumps(stats, indent=1))
        if stats["threshold"] <= 0.0:
            print("no safe threshold (separation %.2f <= 1.5) — early stop "
                  "stays disabled" % stats["separation"], file=sys.stderr)
        if args.apply:
            from nspeech_tpu.train.stopcal import apply_threshold_to_run
            path = apply_threshold_to_run(args.apply, stats["threshold"])
            print("applied stop_threshold=%.4g -> %s"
                  % (stats["threshold"], path), file=sys.stderr)
        return 0

    if args.from_run:
        from nspeech_tpu.train import config_from_checkpoint
        cfg, _model = config_from_checkpoint(args.from_run)
    else:
        cfg = config.load_config("taco2")
    if args.hparams:
        cfg = cfg.parse(args.hparams)

    inputs = {k: getattr(args, k) for k in
              ("ljspeech", "vctk", "librispeech", "arctic")
              if getattr(args, k)}
    if not inputs:
        p.error("need a corpus (--ljspeech/--vctk/--librispeech/--arctic)")
    items = load_items(inputs)[: args.max_utts]
    mels = (process_utterance(wav_path, cfg, args.cache_dir).mel
            for wav_path, _text, _spk, _ds in items)
    stats = stop_statistics(mels, r=int(cfg.outputs_per_step),
                            tail=args.tail)
    stats["r"] = int(cfg.outputs_per_step)
    print(json.dumps(stats, indent=1))
    if stats["threshold"] <= 0.0:
        print("no safe threshold (separation %.2f <= 1.5) — early stop "
              "stays disabled" % stats["separation"], file=sys.stderr)
    if args.apply:
        from nspeech_tpu.train.stopcal import apply_threshold_to_run
        path = apply_threshold_to_run(args.apply, stats["threshold"])
        print("applied stop_threshold=%.4g -> %s"
              % (stats["threshold"], path), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
