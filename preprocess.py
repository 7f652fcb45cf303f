#!/usr/bin/env python
"""Offline feature preprocessor CLI.

The reference shipped this entry point fully commented out
(reference: preprocess.py:1-82); here it is a working tool: walks the
configured corpora, extracts features through the fused jnp featurizer, and
fills the on-disk cache that the training feeders read.
"""

from __future__ import annotations

import argparse
import time

import nspeech_tpu.config as config
from nspeech_tpu.data.corpus import load_items
from nspeech_tpu.data.features import build_from_paths


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ljspeech", default="")
    parser.add_argument("--vctk", default="")
    parser.add_argument("--librispeech", default="")
    parser.add_argument("--model", default="taco1",
                        help="Model whose audio hparams to use")
    parser.add_argument("--hparams", default="")
    parser.add_argument("--cache-dir", required=True)
    parser.add_argument("--num-workers", type=int, default=1)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--platform", default=None,
                        help="jax platform override (featurization is "
                        "host work — 'cpu' runs with no accelerator)")
    args = parser.parse_args()
    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)

    cfg = config.load_config(args.model)
    cfg.parse(args.hparams)

    input_paths = {}
    if args.ljspeech:
        input_paths["ljspeech"] = args.ljspeech
    if args.vctk:
        input_paths["vctk"] = args.vctk
    if args.librispeech:
        input_paths["librispeech"] = args.librispeech
    items = load_items(input_paths)
    if args.limit:
        items = items[: args.limit]
    print("Processing %d utterances -> %s" % (len(items), args.cache_dir))

    start = time.time()
    wav_paths = [wav_path for wav_path, _text, _spk, _ds in items]
    utts = build_from_paths(wav_paths, cfg, args.cache_dir,
                            num_workers=args.num_workers)
    total_frames = sum(u.n_frames for u in utts)
    total_samples = sum(len(u.wav) for u in utts)
    elapsed = time.time() - start
    print("Done: %d utterances, %d frames, %.1f audio-hours in %.1fs"
          % (len(items), total_frames,
             total_samples / cfg.sample_rate / 3600, elapsed))


if __name__ == "__main__":
    main()
