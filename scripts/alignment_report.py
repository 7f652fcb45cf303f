#!/usr/bin/env python
"""Produce the alignment-evidence package for a training run.

Reads a run's ``metrics.jsonl`` and checkpoint and writes, into --out:

- ``sharpness_curve.png`` — attention_sharpness over training steps (the
  metric that collapses toward 1/T_in when alignment fails, the failure
  mode the reference documents at README.md:75-89);
- per-text ``eval-N-align.png`` + ``eval-N.wav`` — AUTOREGRESSIVE
  (no teacher forcing) synthesis through the serving path;
- ``report.json`` — final smoothed sharpness plus, per text, the decoder
  steps used and a monotonicity score of the attention path (fraction of
  decoder steps whose argmax input position does not move backwards by
  more than one position).

Usage:
  python scripts/alignment_report.py --run-dir /tmp/aln_run/aln \
      --out docs/alignment --text "deep wave tone." [--text ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# runnable from any cwd without PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sharpness_curve(run_dir: str, out_png: str) -> float:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, sharp = [], []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if "attention_sharpness" in row:
                steps.append(row["step"])
                sharp.append(row["attention_sharpness"])
    k = max(1, len(sharp) // 40)
    smooth = np.convolve(sharp, np.ones(k) / k, mode="valid")
    fig, ax = plt.subplots(figsize=(7, 3.2))
    ax.plot(steps, sharp, alpha=0.25, lw=0.8, label="per summary")
    ax.plot(steps[k - 1:], smooth, lw=1.8, label="smoothed")
    ax.set_xlabel("training step")
    ax.set_ylabel("attention sharpness\n(mean max alignment weight)")
    ax.legend(loc="lower right", frameon=False)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return float(smooth[-1]) if len(smooth) else float("nan")


def monotonicity(align: np.ndarray, steps_used: int) -> float:
    """align [T_in, S]; fraction of voiced decoder steps whose argmax
    input position moves forward or stays (tolerating 1-position
    backtrack, which r-frame quantization produces)."""
    path = np.argmax(align[:, :steps_used], axis=0)
    if len(path) < 2:
        return 1.0
    return float(np.mean(np.diff(path) >= -1))


def median_f0(wav: np.ndarray, sample_rate: int, n_fft: int = 2048,
              hop: int = 512, f_min: float = 80.0,
              f_max: float = 3500.0) -> float:
    """Median over voiced frames of a harmonic-product-spectrum F0.

    A plain FFT-argmax lands on whichever partial is loudest, which for
    speakers with harmonic tilt > 1 (speaker_voice() spreads tilts over
    [0.5, 1.6]) is the 2nd/3rd harmonic, not the fundamental — observed
    as per-speaker "F0" ratios of 1.01 and 4.3 for the same voice pair.
    The HPS multiplies the spectrum with itself decimated by 2 and 3, so
    only the true fundamental keeps support at every harmonic; it is
    tilt-invariant for the corpora's 3-partial recipe."""
    overall = float(np.sqrt(np.mean(np.square(wav)))) or 1.0
    peaks = []
    lo = max(1, int(f_min * n_fft / sample_rate))
    # cap so every candidate bin has all three harmonic terms available
    hi = min(int(f_max * n_fft / sample_rate), (n_fft // 2 + 1 + 2) // 3)
    for start in range(0, max(len(wav) - n_fft + 1, 1), hop):
        frame = wav[start: start + n_fft]
        # voiced = louder than half the utterance's own RMS (absolute
        # thresholds would misjudge quiet Griffin-Lim reconstructions)
        if len(frame) < n_fft or float(
                np.sqrt(np.mean(frame ** 2))) < 0.5 * overall:
            continue
        mag = np.abs(np.fft.rfft(frame * np.hanning(len(frame))))
        hps = np.log(mag[:hi] + 1e-9).copy()
        for h in (2, 3):
            dec = mag[::h][:hi]
            hps[:len(dec)] += np.log(dec + 1e-9)
        peaks.append((lo + int(np.argmax(hps[lo:]))) * sample_rate / n_fft)
    return float(np.median(peaks)) if peaks else 0.0


def spectral_centroid(wav: np.ndarray, sample_rate: int,
                      f_lo: float = 80.0, f_hi: float = 4000.0) -> float:
    """Amplitude-weighted mean frequency of the in-band spectrum.

    The simplest of the three voice estimators (one FFT, no peak
    picking, no cross-correlation): for two speaker_voice() voices that
    differ by a pure f_scale, centroids scale by the same factor. Kept
    deliberately independent of median_f0/spectral_shift_ratio so the
    voice-ratio claim never rests on one instrument's failure modes
    (median-F0 subharmonic locks; shift estimators need both wavs)."""
    n = min(len(wav), sample_rate * 4)
    if n < 2048:
        return 0.0
    mag = np.abs(np.fft.rfft(wav[:n] * np.hanning(n)))
    f = np.fft.rfftfreq(n, 1.0 / sample_rate)
    band = (f >= f_lo) & (f <= f_hi)
    w = mag[band] ** 2
    return float((f[band] * w).sum() / (w.sum() + 1e-12))


def spectral_shift_ratio(wav_ref: np.ndarray, wav: np.ndarray,
                         sample_rate: int, f_lo: float = 80.0,
                         f_hi: float = 4000.0) -> float:
    """Frequency-scale of ``wav`` relative to ``wav_ref`` — the shift
    that best aligns their log-frequency log-spectra.

    For the SAME utterance spoken by two speaker_voice() voices the
    whole spectrum scales by the f_scale ratio, which appears as a rigid
    shift on a log-frequency axis; correlating uses every partial at
    once, so it is robust where a per-utterance median F0 occasionally
    locks onto a subharmonic (observed: median-F0 ratio 0.9 on audio
    whose spectral shift measured 1.53 against a designed 1.54)."""
    n = min(len(wav_ref), len(wav), sample_rate * 4)
    if n < 2048:
        return 0.0
    f = np.fft.rfftfreq(n, 1.0 / sample_rate)
    grid = np.geomspace(f_lo, f_hi, 2048)
    win = np.hanning(n)
    logs = []
    for w in (wav_ref, wav):
        mag = np.abs(np.fft.rfft(w[:n] * win))
        ls = np.log(np.interp(grid, f, mag) + 1e-6)
        logs.append(ls - ls.mean())
    xc = np.correlate(logs[1], logs[0], "full")
    shift = int(np.argmax(xc)) - (len(grid) - 1)
    return float((grid[1] / grid[0]) ** shift)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run-dir", required=True,
                        help="log_dir/<run> containing metrics.jsonl + ckpt/")
    parser.add_argument("--out", required=True)
    parser.add_argument("--text", action="append", default=[])
    parser.add_argument("--speakers", default="",
                        help="comma-separated speaker ids: synthesize every "
                             "--text for EVERY listed speaker and report "
                             "per-speaker median F0 (speaker-conditioning "
                             "evidence for multi-speaker checkpoints)")
    parser.add_argument("--stop-threshold", type=float, default=0.02)
    parser.add_argument("--hparams", default="",
                        help="extra k=v overrides for the synthesizer "
                             "(e.g. attention_win_fwd=4)")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)
    os.makedirs(args.out, exist_ok=True)

    report = {"final_sharpness_smoothed": sharpness_curve(
        args.run_dir, os.path.join(args.out, "sharpness_curve.png"))}

    if args.text:
        from nspeech_tpu import dsp
        from nspeech_tpu.serving import Synthesizer
        from nspeech_tpu.utils import plot

        ckpt = os.path.join(args.run_dir, "ckpt")
        overrides = "stop_threshold=%g" % args.stop_threshold
        if args.hparams:
            overrides += "," + args.hparams
        synth = Synthesizer.from_checkpoint(ckpt, overrides=overrides)
        speakers = ([int(s) for s in args.speakers.split(",")]
                    if args.speakers else [-1])
        report["texts"] = []
        for i, text in enumerate(args.text):
            per_speaker = {}
            for spk in speakers:
                wav, mel, _ = synth.synthesize(text, speaker_id=spk)
                align = synth.last_alignment  # [T_in, S]
                steps = int(getattr(synth, "last_decoder_steps",
                                    align.shape[1]))
                tag = "eval-%d" % i if spk < 0 else "eval-%d-spk%d" % (i, spk)
                base = os.path.join(args.out, tag)
                dsp.save_wav(wav, base + ".wav", synth.cfg.sample_rate)
                n_text = len(text) + 1  # + EOS
                plot.plot_alignment(align[:n_text, :steps + 2],
                                    base + "-align.png",
                                    info="autoregressive: %r" % text)
                plot.plot_specgram(mel, base + "-mel.png", "mel")
                per_speaker[spk] = {
                    "decoder_steps": steps,
                    "seconds": round(len(wav) / synth.cfg.sample_rate, 2),
                    # near-zero RMS means the decoder free-ran to silence:
                    # alignment/monotonicity numbers alone can look fine
                    # on an undertrained checkpoint that emits no audio
                    "rms": round(float(np.sqrt(np.mean(wav ** 2))), 4),
                    "monotonicity": round(
                        monotonicity(align[:n_text], steps), 4),
                    "sharpness": round(float(np.mean(np.max(
                        align[:, :steps], axis=0))), 4),
                }
                if speakers != [-1]:
                    # Reported only for --speakers runs: per-speaker F0
                    # ratios are the speaker-conditioning evidence, and
                    # that flow targets the synthetic corpora where
                    # FFT-argmax tracks the fundamental (on real speech
                    # it can land on a harmonic/formant — caveat lector).
                    per_speaker[spk]["median_f0_hz"] = round(
                        median_f0(wav, synth.cfg.sample_rate), 1)
                    per_speaker[spk]["spectral_centroid_hz"] = round(
                        spectral_centroid(wav, synth.cfg.sample_rate), 1)
                    per_speaker[spk]["_wav"] = wav
            entry = {"text": text}
            if speakers == [-1]:
                entry.update(per_speaker[-1])
            else:
                wavs = [per_speaker[s].pop("_wav") for s in speakers]
                entry["per_speaker"] = {str(k): v
                                        for k, v in per_speaker.items()}
                # Voice-ratio estimators are spectral measurements; on a
                # degenerate (near-silent) decode they measure residual
                # noise, not a voice — observed as "ratios" of 18-23x for
                # a designed 1.54x pair. Gate every ratio on both decodes
                # carrying real energy and say so, instead of printing a
                # number a reader must know to distrust.
                MIN_VOICED_RMS = 0.05
                voiced = [per_speaker[s]["rms"] >= MIN_VOICED_RMS
                          for s in speakers]

                def _gate(vals):
                    return [v if voiced[0] and voiced[i] else None
                            for i, v in enumerate(vals)]

                f0s = [per_speaker[s]["median_f0_hz"] for s in speakers]
                if f0s[0] > 0:
                    entry["f0_ratio_vs_first_speaker"] = _gate(
                        [round(f / f0s[0], 3) for f in f0s])
                # whole-spectrum ratio: robust companion to median F0
                entry["spectral_ratio_vs_first_speaker"] = _gate(
                    [round(spectral_shift_ratio(
                        wavs[0], w, synth.cfg.sample_rate), 3)
                     for w in wavs])
                cents = [per_speaker[s]["spectral_centroid_hz"]
                         for s in speakers]
                if cents[0] > 0:
                    entry["centroid_ratio_vs_first_speaker"] = _gate(
                        [round(c / cents[0], 3) for c in cents])
                if not all(voiced):
                    entry["ratio_note"] = (
                        "null ratios: decode(s) below rms %.2f — spectral "
                        "estimators would measure noise" % MIN_VOICED_RMS)
            report["texts"].append(entry)

    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
