#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained AOT serving artifact.

Serializes the whole compiled text -> waveform program (autoregressive
decode + Griffin-Lim, weights baked in as constants) via ``jax.export``.
The artifact directory then serves WITHOUT model code, checkpoint, or
training config — see nspeech_tpu/serving/export.py. Lower for several
platforms at once with --platforms cpu,tpu to ship one artifact that
runs on both a dev box and a TPU host.

    python export_serving.py --checkpoint logs/taco2/ckpt \
        --out artifacts/taco2_serving --text-len 64 --platforms cpu,tpu
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="Orbax checkpoint dir (run metadata beside it "
                             "supplies the model + hparams)")
    parser.add_argument("--model", default=None,
                        help="Model name (default: from run metadata)")
    parser.add_argument("--hparams", default="",
                        help="k=v,... overrides applied last")
    parser.add_argument("--out", required=True, help="Artifact directory")
    parser.add_argument("--text-len", type=int, default=64,
                        help="Static text length the program is compiled "
                             "for (requests pad to it)")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--platforms", default=None,
                        help="Comma-separated lowering targets, e.g. "
                             "cpu,tpu (default: current backend)")
    parser.add_argument("--step", type=int, default=None,
                        help="Checkpoint step (default latest)")
    parser.add_argument("--platform", default=None,
                        help="Force the LOCAL jax backend (e.g. cpu)")
    parser.add_argument("--vocoder-checkpoint", default=None,
                        help="Also export a mel->wav WaveNet vocoder "
                             "program into the same artifact dir")
    parser.add_argument("--vocoder-hparams", default="")
    parser.add_argument("--vocoder-frames", type=int, default=None,
                        help="Static mel length for the vocoder program "
                             "(default: the acoustic model's max output, "
                             "max_iters * outputs_per_step)")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="Vocoder sampling temperature (baked in)")
    args = parser.parse_args()

    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)

    from nspeech_tpu.serving import Synthesizer
    from nspeech_tpu.serving.export import export_synthesizer

    synth = Synthesizer.from_checkpoint(
        args.checkpoint, args.model, overrides=args.hparams, step=args.step,
        text_bucket=args.text_len)
    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    out = export_synthesizer(synth, args.out, text_len=args.text_len,
                             batch=args.batch, platforms=platforms)
    import os

    size = os.path.getsize(os.path.join(out, "module.stablehlo")) / 1e6
    print("Exported %s -> %s (%.1f MB, platforms=%s, batch=%d, text_len=%d)"
          % (args.checkpoint, out, size,
             platforms or "current", args.batch, args.text_len))

    if args.vocoder_checkpoint:
        from nspeech_tpu.serving import WaveNetVocoder
        from nspeech_tpu.serving.export import export_vocoder

        vocoder = WaveNetVocoder.from_checkpoint(
            args.vocoder_checkpoint, overrides=args.vocoder_hparams)
        frames = args.vocoder_frames or (
            synth.cfg.max_iters * synth.cfg.outputs_per_step)
        export_vocoder(vocoder, out, frames=frames, batch=args.batch,
                       temperature=args.temperature, platforms=platforms)
        vsize = os.path.getsize(os.path.join(out, "vocoder.stablehlo")) / 1e6
        print("Exported vocoder %s -> %s (%.1f MB, frames=%d, "
              "temperature=%g)" % (args.vocoder_checkpoint, out, vsize,
                                   frames, args.temperature))


if __name__ == "__main__":
    main()
