#!/usr/bin/env python
"""End-to-end text -> waveform CLI: Tacotron acoustic model + a choice of
Griffin-Lim or mel-conditioned WaveNet vocoder (BASELINE config #4 — a
pipeline the reference could not run, since its WaveNet generator ignored
local conditioning)."""

from __future__ import annotations

import argparse

import nspeech_tpu.config as config
from nspeech_tpu import dsp
from nspeech_tpu.serving import Synthesizer, TextToSpeech, WaveNetVocoder


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="Acoustic-model checkpoint dir")
    parser.add_argument("--model", default=None,
                        help="Model name (default: checkpoint run metadata)")
    parser.add_argument("--hparams", default="")
    parser.add_argument("--vocoder-checkpoint", default=None,
                        help="WaveNet vocoder checkpoint dir (else Griffin-Lim)")
    parser.add_argument("--vocoder-model", default=None)
    parser.add_argument("--vocoder-hparams", default="")
    parser.add_argument("--text", required=True)
    parser.add_argument("--speaker", type=int, default=-1)
    parser.add_argument("--num-speakers", type=int, default=None)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--out", default="synth.wav")
    parser.add_argument("--long", action="store_true",
                        help="Long-form mode: split the text at sentence/"
                        "clause boundaries, synthesize the pieces as one "
                        "batch, and join with pauses — no decoder frame "
                        "cap on the total length")
    parser.add_argument("--pause-ms", type=float, default=150.0,
                        help="Silence between long-form pieces")
    parser.add_argument("--max-chars", type=int, default=200,
                        help="Max characters per long-form piece")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard batched synthesis (e.g. --long pieces) "
                        "over all local devices via a jax.sharding data mesh")
    args = parser.parse_args()
    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)

    # Run metadata persisted next to the checkpoint supplies the exact
    # training-time hparams (incl. the mutated num_speakers) — no manual
    # flag hand-off needed; --hparams/--num-speakers still override.
    overrides = args.hparams
    if args.num_speakers is not None:
        overrides = (overrides + "," if overrides else "") \
            + "num_speakers=%d" % args.num_speakers
    mesh = None
    if args.data_parallel:
        import jax

        from nspeech_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices())
    synth = Synthesizer.from_checkpoint(args.checkpoint, args.model,
                                        overrides, mesh=mesh)
    cfg = synth.cfg

    vocoder = None
    if args.vocoder_checkpoint:
        vocoder = WaveNetVocoder.from_checkpoint(
            args.vocoder_checkpoint, args.vocoder_model,
            args.vocoder_hparams)

    tts = TextToSpeech(synth, vocoder)
    if args.long:
        from nspeech_tpu.serving.longform import synthesize_long

        wav = synthesize_long(tts, args.text, args.speaker,
                              sample_rate=cfg.sample_rate,
                              pause_ms=args.pause_ms,
                              max_chars=args.max_chars)
    else:
        wav, _mel, _lin = tts.synthesize(args.text, args.speaker,
                                         temperature=args.temperature)
    dsp.save_wav(wav, args.out, cfg.sample_rate)
    print("Wrote %s (%.2fs of audio, vocoder=%s)" % (
        args.out, len(wav) / cfg.sample_rate,
        "wavenet" if vocoder else "griffin-lim"))


if __name__ == "__main__":
    main()
