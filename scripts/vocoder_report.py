"""Evidence report for a TRAINED WaveNet vocoder: ground-truth-mel copy
synthesis plus the full text -> Tacotron -> WaveNet pipeline.

The alignment evidence (docs/alignment/) shows the acoustic model learns
attention; this report closes the loop on the second trained model. Two
measurements:

1. **Copy synthesis** (vocoder quality in isolation): take corpus
   utterances, compute their mels on device (dsp.spectrograms), vocode
   with the trained WaveNet, and compare the mel of the GENERATED wav
   against the conditioning mel (L1 in the normalized mel domain, plus
   dominant-frequency tracking agreement). This is independent of the
   acoustic model.
2. **End-to-end pipeline** (text -> wav through BOTH trained models):
   serving.TextToSpeech with the trained Tacotron-2 + trained WaveNet;
   reports the same mel-consistency metric of the WaveNet wav against
   the Tacotron-predicted mel, side by side with the Griffin-Lim route.

Also renders the vocoder training-loss curve from the run's
metrics.jsonl and mel comparison figures.

Usage (runs on the real chip; the Pallas sampler drives generation):
    python scripts/vocoder_report.py \
        --taco-run /tmp/aln_v3g/aln --wavenet-run /tmp/wn_aln/wn_aln \
        --corpus /tmp/aln_v3 --out docs/vocoder
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dominant_freq_track(wav: np.ndarray, sr: int, frame: int = 1024,
                        hop: int = 256) -> np.ndarray:
    """Per-frame dominant frequency (Hz) via FFT peak — the corpus is
    built from tones, so the dominant bin is the signal identity."""
    n = (len(wav) - frame) // hop
    freqs = np.fft.rfftfreq(frame, 1.0 / sr)
    out = np.zeros(max(n, 0), np.float32)
    for i in range(max(n, 0)):
        seg = wav[i * hop: i * hop + frame] * np.hanning(frame)
        mag = np.abs(np.fft.rfft(seg))
        out[i] = freqs[int(np.argmax(mag))]
    return out


def track_agreement(a: np.ndarray, b: np.ndarray, tol_hz: float = 50.0):
    """Fraction of frames whose dominant frequencies agree within tol."""
    n = min(len(a), len(b))
    if n == 0:
        return 0.0
    return float(np.mean(np.abs(a[:n] - b[:n]) <= tol_hz))


def spectral_cosine(a: np.ndarray, b: np.ndarray, sr: int,
                    frame: int = 1024, hop: int = 256) -> float:
    """Mean per-frame cosine similarity of log-magnitude spectra — a
    robust alternative to dominant-bin tracking when harmonics/tremolo
    make the argmax bin flicker."""
    n = min((len(a) - frame) // hop, (len(b) - frame) // hop)
    sims = []
    for i in range(max(n, 0)):
        w = np.hanning(frame)
        fa = np.log1p(np.abs(np.fft.rfft(a[i * hop: i * hop + frame] * w)))
        fb = np.log1p(np.abs(np.fft.rfft(b[i * hop: i * hop + frame] * w)))
        denom = np.linalg.norm(fa) * np.linalg.norm(fb)
        if denom > 0:
            sims.append(float(fa @ fb / denom))
    return float(np.mean(sims)) if sims else 0.0


def log_spectral_centroid(wav: np.ndarray, sr: int, f_lo: float = 80.0,
                          f_hi: float = 4000.0) -> float:
    """Geometric-mean spectral centroid (Hz) over the 80–4000 Hz band —
    the voice-identity summary used for the multispeaker corpora (it
    tracks each speaker_voice() f_scale robustly where dominant-bin and
    HPS-F0 estimators octave-hop on chirped/sampled audio)."""
    x = np.asarray(wav, np.float64)
    f = np.fft.rfftfreq(len(x), 1.0 / sr)
    m = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    band = (f > f_lo) & (f < f_hi)
    if not band.any() or m[band].sum() <= 0:
        return 0.0
    return float(np.exp((np.log(f[band]) * m[band]).sum() / m[band].sum()))


def mel_l1(wav: np.ndarray, ref_mel: np.ndarray, cfg) -> float:
    """L1 between the mel of ``wav`` and ``ref_mel`` (both [T, M] in the
    framework's normalized [0, 1] mel domain), over the overlap."""
    from nspeech_tpu import dsp

    _, mel = dsp.spectrograms(np.asarray(wav, np.float32), cfg)
    mel = np.asarray(mel)
    t = min(len(mel), len(ref_mel))
    return float(np.mean(np.abs(mel[:t] - np.asarray(ref_mel)[:t])))


def plot_mel_panel(path: str, panels, sr_frames: float):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(len(panels), 1,
                             figsize=(10, 2.2 * len(panels)), sharex=True)
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, mel) in zip(axes, panels):
        ax.imshow(np.asarray(mel).T, origin="lower", aspect="auto",
                  interpolation="nearest")
        ax.set_title(title, fontsize=9)
        ax.set_ylabel("mel bin")
    axes[-1].set_xlabel("frame")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_loss_curve(metrics_path: str, out_path: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, losses = [], []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                steps.append(rec["step"])
                losses.append(rec["loss"])
    fig, ax = plt.subplots(figsize=(7, 3))
    ax.plot(steps, losses, lw=0.8)
    ax.axhline(np.log(256.0), color="gray", ls="--", lw=0.8,
               label="uniform (ln 256)")
    ax.set_xlabel("step")
    ax.set_ylabel("NLL (nats/sample)")
    ax.set_title("WaveNet vocoder training loss")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return steps[-1] if steps else None, losses[-1] if losses else None


def _copy_items(corpus: str, n: int):
    """[(wav_path, speaker_id_or_None)] for copy synthesis: LJSpeech
    layout (metadata.csv + wavs/) or VCTK layout (wav48/p*/ — one
    utterance per speaker round-robin; the speaker index follows the
    feeder's deterministic sorted speaker map)."""
    meta = os.path.join(corpus, "metadata.csv")
    if os.path.exists(meta):
        with open(meta, encoding="utf-8") as f:
            rows = [line.strip().split("|")[0] for line in f][:n]
        return [(os.path.join(corpus, "wavs", r + ".wav"), None)
                for r in rows]
    import glob as _glob
    spk_dirs = sorted(_glob.glob(os.path.join(corpus, "wav48", "p*")))
    if not spk_dirs:
        raise SystemExit(f"{corpus}: neither metadata.csv nor wav48/")
    items = []
    i = 0
    while len(items) < n:
        spk = i % len(spk_dirs)
        wavs = sorted(_glob.glob(os.path.join(spk_dirs[spk], "*.wav")))
        idx = i // len(spk_dirs)
        if idx >= len(wavs):
            break
        items.append((wavs[idx], spk))
        i += 1
    return items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--taco-run", required=True,
                    help="Tacotron run dir (contains ckpt/)")
    ap.add_argument("--wavenet-run", required=True,
                    help="WaveNet run dir (contains ckpt/ and metrics.jsonl)")
    ap.add_argument("--corpus", required=True,
                    help="LJSpeech-layout corpus dir for copy synthesis")
    ap.add_argument("--out", default="docs/vocoder")
    ap.add_argument("--n-copy", type=int, default=2,
                    help="corpus utterances for copy synthesis")
    ap.add_argument("--copy-seconds", type=float, default=3.0,
                    help="seconds of audio per copy-synthesis utterance")
    ap.add_argument("--texts", nargs="*", default=[
        "pqoc fjel azrv kmds wuh.",
        "tbi znogu chwad lyrfe qvk sjmp.",
    ])
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="sampling temperature for the shipped wavs "
                         "(argmax=0 collapses: see docs/vocoder/README.md)")
    ap.add_argument("--sweep", nargs="*", type=float, default=[],
                    help="extra temperatures to score (metrics only)")
    ap.add_argument("--tf-window", type=int, default=4096,
                    help="teacher-forced scoring window (samples)")
    ap.add_argument("--speakers", default="",
                    help="comma-separated speaker ids: run the end-to-end "
                         "section once per (text, speaker) through the "
                         "speaker-conditioned pipeline (taco2 speaker "
                         "embedding + WaveNet gc) and report the "
                         "spectral-shift ratio of each speaker vs the "
                         "first — the designed-voice-ratio evidence of "
                         "docs/multispeaker/ carried through the NEURAL "
                         "vocoder instead of Griffin-Lim")
    ap.add_argument("--no-pallas", action="store_true",
                    help="sample through the lax.scan generator instead of "
                         "the Pallas kernel: the same learned conditional "
                         "(equivalence-tested on the argmax path; sampling "
                         "draws its own RNG stream), slower samples/sec, "
                         "but compile time independent of utterance length "
                         "(the Pallas kernel compiles per exact sample "
                         "count — minutes per novel length through a "
                         "remote-compile relay)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # Persistent XLA compile cache: the A/B flow runs this report once per
    # vocoder arm with identical shapes — arms after the first must not
    # re-pay the multi-minute sampling-kernel compiles.
    from nspeech_tpu.utils.platform import set_platform

    set_platform(None)

    from nspeech_tpu import dsp
    from nspeech_tpu.serving.pipeline import TextToSpeech, WaveNetVocoder
    from nspeech_tpu.serving.synthesizer import Synthesizer

    voc = WaveNetVocoder.from_checkpoint(os.path.join(args.wavenet_run, "ckpt"),
                                         use_pallas=not args.no_pallas)
    cfg = voc.cfg
    report = {"temperature": args.temperature}

    # -- training curve ----------------------------------------------------
    metrics_path = os.path.join(args.wavenet_run, "metrics.jsonl")
    if os.path.exists(metrics_path):
        step, loss = plot_loss_curve(
            metrics_path, os.path.join(args.out, "wavenet_loss.png"))
        report["train_final_step"] = step
        report["train_final_nll"] = loss

    # -- teacher-forced scoring (does the model KNOW the conditional?) -----
    # One-step predictions on real audio + its mel: near-1 waveform
    # correlation proves the learned conditional mapping independently of
    # autoregressive drift.
    import jax.numpy as jnp

    from nspeech_tpu.dsp.mulaw import mu_law_decode
    from nspeech_tpu.ops.upsample import upsample_on_device

    rows = _copy_items(args.corpus, args.n_copy)

    tf_path, tf_spk = rows[0]
    tf_wav = dsp.load_wav(tf_path, cfg.sample_rate)
    rf = voc.net.receptive_field
    off = min(20000, max(len(tf_wav) - rf - args.tf_window, 0))
    seg = np.asarray(tf_wav[off: off + rf + args.tf_window], np.float32)[None]
    _, tf_mel = dsp.spectrograms(np.asarray(tf_wav, np.float32), cfg)
    lc_full = np.asarray(upsample_on_device(
        jnp.asarray(np.asarray(tf_mel))[None], voc._hop, len(tf_wav)))
    lc_seg = lc_full[:, off: off + seg.shape[1]]
    tf_gc = (jnp.asarray([tf_spk], jnp.int32)
             if tf_spk is not None and voc.net.gc_channels else None)
    logits, targets = voc.net.forward_train(
        voc._params, jnp.asarray(seg), gc_ids=tf_gc, lc=jnp.asarray(lc_seg))
    logits = np.asarray(logits)[0]
    targets = np.asarray(targets)[0]
    mx = logits.max(-1, keepdims=True)
    logp = logits - mx - np.log(np.sum(np.exp(logits - mx), -1, keepdims=True))
    pred = np.argmax(logits, -1)
    err = np.abs(pred.astype(int) - targets.astype(int))
    w_pred = np.asarray(mu_law_decode(jnp.asarray(pred),
                                      voc.net.quantization_channels))
    w_true = np.asarray(mu_law_decode(jnp.asarray(targets),
                                      voc.net.quantization_channels))
    report["teacher_forced"] = {
        "window_samples": int(args.tf_window),
        "nll": round(float(-np.mean(
            logp[np.arange(len(targets)), targets])), 4),
        "argmax_within_2_codes": round(float(np.mean(err <= 2)), 4),
        "median_abs_code_err": int(np.median(err)),
        "waveform_corr": round(float(np.corrcoef(w_pred, w_true)[0, 1]), 5),
    }

    # -- copy synthesis (ground-truth mel -> wav) --------------------------
    copies = []
    for i, (wav_path, spk) in enumerate(rows):
        ref = dsp.load_wav(wav_path, cfg.sample_rate)
        ref = ref[: int(args.copy_seconds * cfg.sample_rate)]
        _, mel = dsp.spectrograms(ref, cfg)
        mel = np.asarray(mel)
        sweep = {}
        gen = None
        for t in args.sweep:
            g = np.asarray(voc.vocode(mel, speaker_id=spk,
                                      temperature=t))
            sweep[str(t)] = {
                "mel_l1": round(mel_l1(g, mel, cfg), 4),
                "freq_track_agreement": round(track_agreement(
                    dominant_freq_track(ref, cfg.sample_rate),
                    dominant_freq_track(g, cfg.sample_rate)), 4)}
            if t == args.temperature:
                gen = g  # reuse: the shipped wav is this sweep point
        if gen is None:
            gen = np.asarray(voc.vocode(
                mel, speaker_id=spk, temperature=args.temperature))
        dsp.save_wav(gen, os.path.join(args.out, f"copy{i}_wavenet.wav"),
                     cfg.sample_rate)
        dsp.save_wav(ref, os.path.join(args.out, f"copy{i}_reference.wav"),
                     cfg.sample_rate)
        l1 = mel_l1(gen, mel, cfg)
        agree = track_agreement(
            dominant_freq_track(ref, cfg.sample_rate),
            dominant_freq_track(gen, cfg.sample_rate))
        _, gen_mel = dsp.spectrograms(gen, cfg)
        plot_mel_panel(
            os.path.join(args.out, f"copy{i}_mels.png"),
            [("conditioning mel (ground truth)", mel),
             ("mel of WaveNet output", np.asarray(gen_mel))],
            cfg.sample_rate)
        entry = {"utterance": os.path.splitext(
                     os.path.basename(wav_path))[0],
                 "speaker": spk, "mel_l1": round(l1, 4),
                 "centroid_ref_hz": round(log_spectral_centroid(
                     ref, cfg.sample_rate), 1),
                 "centroid_gen_hz": round(log_spectral_centroid(
                     gen, cfg.sample_rate), 1),
                 "freq_track_agreement": round(agree, 4),
                 "spectral_cosine": round(spectral_cosine(
                     ref, gen, cfg.sample_rate), 4)}
        if sweep:
            entry["sweep"] = sweep
        copies.append(entry)
    report["copy_synthesis"] = copies

    # -- end-to-end text -> taco2 -> wavenet -------------------------------
    synth = Synthesizer.from_checkpoint(os.path.join(args.taco_run, "ckpt"))
    tts = TextToSpeech(synth, voc)
    if args.speakers:
        # speaker-conditioned route: every text for every speaker, with
        # the per-speaker voice-ratio table measured ON THE WAVENET WAVS
        from alignment_report import median_f0, spectral_shift_ratio

        speakers = [int(s) for s in args.speakers.split(",")]
        per_text = []
        for i, text in enumerate(args.texts):
            wavs, gls = {}, {}
            entry = {"text": text, "speakers": {}}
            for spk in speakers:
                wav, mel, _, wav_gl = tts.synthesize(
                    text, speaker_id=spk, temperature=args.temperature,
                    return_gl=True)
                wav = np.asarray(wav)
                wavs[spk] = wav
                gls[spk] = np.asarray(wav_gl)
                dsp.save_wav(
                    wav, os.path.join(args.out, f"e2e{i}_spk{spk}_wn.wav"),
                    cfg.sample_rate)
                n_frames = max(int(np.ceil(len(wav_gl) / voc._hop)), 1)
                entry["speakers"][str(spk)] = {
                    "seconds": round(len(wav) / cfg.sample_rate, 2),
                    "rms": round(float(np.sqrt(np.mean(wav ** 2))), 4),
                    "wavenet_mel_l1_vs_predicted": round(
                        mel_l1(wav, np.asarray(mel)[:n_frames], cfg), 4),
                    # voice preservation: the vocoded wav against the
                    # deterministic Griffin-Lim wav of the SAME decode —
                    # a rigid log-frequency shift of ~1.0 means the
                    # neural vocoder kept the voice (the estimator's
                    # robust regime: identical content and voice)
                    "spectral_ratio_wn_vs_gl": round(spectral_shift_ratio(
                        gls[spk], wav, cfg.sample_rate), 4),
                    # HPS median F0 of both routes: equal F0 = the
                    # vocoder preserved the pitch identity (robust where
                    # the rigid-shift correlator locks onto the wrong
                    # comb offset on sampled audio)
                    "median_f0_wn": round(median_f0(
                        wav, cfg.sample_rate), 1),
                    "median_f0_gl": round(median_f0(
                        gls[spk], cfg.sample_rate), 1),
                    "centroid_wn_hz": round(log_spectral_centroid(
                        wav, cfg.sample_rate), 1),
                    "centroid_gl_hz": round(log_spectral_centroid(
                        gls[spk], cfg.sample_rate), 1),
                }
            ref_wav = wavs[speakers[0]]
            entry["spectral_ratio_vs_first_speaker"] = {
                str(s): round(spectral_shift_ratio(
                    ref_wav, wavs[s], cfg.sample_rate), 4)
                for s in speakers[1:]}
            # the conditioning evidence on deterministic audio (the r4
            # docs/multispeaker protocol): cross-speaker ratios of the
            # Griffin-Lim route, free of sampling noise
            entry["griffinlim_spectral_ratio_vs_first_speaker"] = {
                str(s): round(spectral_shift_ratio(
                    gls[speakers[0]], gls[s], cfg.sample_rate), 4)
                for s in speakers[1:]}
            per_text.append(entry)
        report["end_to_end_speakers"] = per_text
        # the unconditioned e2e section below has no meaning for a
        # gc-conditioned vocoder: every decode names its speaker
        out_json = os.path.join(args.out, "report.json")
        with open(out_json, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        print("wrote", out_json)
        return

    e2e = []
    for i, text in enumerate(args.texts):
        wav, mel, _, wav_gl = tts.synthesize(
            text, temperature=args.temperature, return_gl=True)
        wav = np.asarray(wav)
        dsp.save_wav(wav, os.path.join(args.out, f"e2e{i}_wavenet.wav"),
                     cfg.sample_rate)
        dsp.save_wav(np.asarray(wav_gl),
                     os.path.join(args.out, f"e2e{i}_griffinlim.wav"),
                     cfg.sample_rate)
        n_frames = max(int(np.ceil(len(wav_gl) / voc._hop)), 1)
        pred_mel = np.asarray(mel)[:n_frames]
        _, wn_mel = dsp.spectrograms(wav, cfg)
        plot_mel_panel(
            os.path.join(args.out, f"e2e{i}_mels.png"),
            [("Tacotron-2 predicted mel", pred_mel),
             ("mel of WaveNet output", np.asarray(wn_mel)),
             ],
            cfg.sample_rate)
        e2e.append({
            "text": text,
            "wavenet_mel_l1_vs_predicted": round(mel_l1(wav, pred_mel, cfg), 4),
            "griffinlim_mel_l1_vs_predicted": round(
                mel_l1(np.asarray(wav_gl), pred_mel, cfg), 4),
            "freq_track_agreement_wn_vs_gl": round(track_agreement(
                dominant_freq_track(wav, cfg.sample_rate),
                dominant_freq_track(np.asarray(wav_gl), cfg.sample_rate)), 4),
            "seconds": round(len(wav) / cfg.sample_rate, 2),
        })
    report["end_to_end"] = e2e

    out_json = os.path.join(args.out, "report.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("wrote", out_json)


if __name__ == "__main__":
    main()
