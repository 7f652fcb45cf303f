#!/usr/bin/env python
"""Export ground-truth-aligned (GTA) mels for vocoder fine-tuning.

Runs a trained acoustic model (taco1/taco2) TEACHER-FORCED over a corpus
and saves the predicted mels (nspeech_tpu/data/gta.py); then train the
vocoder on them with ``train_wavenet.py --gta-dir <out>`` so it learns the
feature distribution it actually sees in serving. The reference has no
equivalent — its vocoder trains on true mels (reference:
train_wavenet.py:47) and serves on predicted ones.

Example:
    python export_gta.py --checkpoint logs/taco2/ckpt --ljspeech /data/LJ \\
        --out-dir logs/taco2/gta
    python train_wavenet.py --ljspeech /data/LJ --gta-dir logs/taco2/gta \\
        --hparams lc_channels=80
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="Acoustic-model checkpoint dir (log_dir/<run>/ckpt)")
    parser.add_argument("--checkpoint-step", type=int, default=None)
    parser.add_argument("--model", default=None,
                        help="Model name (default: checkpoint run metadata)")
    parser.add_argument("--hparams", default="")
    parser.add_argument("--vctk", default="")
    parser.add_argument("--ljspeech", default="")
    parser.add_argument("--librispeech", default="")
    parser.add_argument("--arctic", default="")
    parser.add_argument("--out-dir", default=None,
                        help="GTA output dir (default: <checkpoint>/../gta)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--text-bucket", type=int, default=32)
    parser.add_argument("--frame-bucket", type=int, default=128,
                        help="Mel-frame padding granularity; bigger = fewer "
                        "compiled programs across utterance lengths")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()
    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)

    from nspeech_tpu.data.gta import export_gta
    from train import prepare_input_paths

    out_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.abspath(args.checkpoint)), "gta")
    manifest = export_gta(
        args.checkpoint, prepare_input_paths(args), out_dir,
        model_name=args.model, overrides=args.hparams,
        step=args.checkpoint_step, batch_size=args.batch_size,
        text_bucket=args.text_bucket, frame_bucket=args.frame_bucket)
    print("Wrote %d GTA mels + manifest to %s" % (manifest["count"], out_dir))


if __name__ == "__main__":
    main()
