#!/usr/bin/env python
"""Tacotron trainer CLI.

Same surface as the reference trainer (reference: train.py:133-164 —
--ljspeech/--vctk/--librispeech inputs, --model, --hparams k=v overrides,
--restore-step, intervals, --slack-url) driving the TPU-native stack: a
jitted data-parallel train step over a device mesh, Orbax checkpoints with
auto-resume, JSONL/TensorBoard metrics, and periodic audio/plot artifacts.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

import nspeech_tpu.config as config
from nspeech_tpu import dsp
from nspeech_tpu.data.feeder import DataFeeder
from nspeech_tpu.models import create_model
from nspeech_tpu.text import sequence_to_text
from nspeech_tpu.text.cmudict import CMUDict
from nspeech_tpu.train import create_state, make_optimizer
from nspeech_tpu.train.loop import build_tacotron_train_step
from nspeech_tpu.train.runner import pick_mesh, run_training
from nspeech_tpu.utils import infolog, plot, time_string
from nspeech_tpu.utils.infolog import log


def prepare_input_paths(args) -> dict:
    input_paths = {}
    if args.vctk:
        input_paths["vctk"] = args.vctk
    if args.ljspeech:
        input_paths["ljspeech"] = args.ljspeech
    if args.librispeech:
        input_paths["librispeech"] = args.librispeech
    if getattr(args, "arctic", ""):
        input_paths["arctic"] = args.arctic
    return input_paths


def train(log_dir: str, args, cfg) -> None:
    log("Checkpoint dir: %s" % os.path.join(log_dir, "ckpt"))
    log("Using model: %s" % args.model)
    log(config.debug_string(cfg))

    cmudict = None
    if cfg.use_cmudict and args.cmudict_path:
        cmudict = CMUDict(args.cmudict_path, keep_ambiguous=False)
        log("Loaded CMUDict with %d unambiguous entries" % len(cmudict))

    feeder = DataFeeder(
        prepare_input_paths(args), cfg, cache_dir=args.cache_dir,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        seed=args.seed, cmudict=cmudict, holdout=args.holdout)
    cfg.num_speakers = feeder.num_speakers  # startup mutation contract
    log("Loaded %d examples / %d speakers%s" % (
        len(feeder._items), feeder.num_speakers,
        " (+%d held out)" % args.holdout if args.holdout else ""))

    # Snapshot the EFFECTIVE config (post-mutation) + speaker map next to
    # the checkpoint so serving needs no manual flag hand-off.
    from nspeech_tpu.train import save_run_metadata

    save_run_metadata(os.path.join(log_dir, "ckpt"), args.model, cfg,
                      speaker_map=feeder.speaker2id)

    model = create_model(args.model, cfg)
    tx, schedule = make_optimizer(cfg, args.model)
    mesh = pick_mesh(cfg.batch_size)
    if mesh is not None:
        log("Data-parallel over %d devices" % mesh.devices.size)
    ema = float(getattr(cfg, "ema_decay", 0.0))
    step_fn = build_tacotron_train_step(model, tx, mesh=mesh,
                                        schedule=schedule, ema_decay=ema)
    state = create_state(model, tx, jax.random.PRNGKey(args.seed),
                         ema=bool(ema))

    if args.device_cache:
        from nspeech_tpu.data.device_cache import DeviceCachedBatches

        cache = DeviceCachedBatches(feeder, n_epoch_variants=args.device_cache,
                                    seed=args.seed, mesh=mesh)
        if cache.device_resident:
            log("Device-cached %d batches (%.0f MB in HBM%s); per-step host "
                "transfer eliminated" % (
                    cache.n_batches, cache.cached_mb,
                    ", sharded over the mesh" if mesh is not None else ""))
        else:
            log("Host-cached %d prepared batches (%.0f MB; multi-host "
                "assembly still transfers per step)" % (
                    cache.n_batches, cache.cached_mb))
        batches = cache.batches()
    else:
        batches = feeder.batches()
    preview = [None]  # first batch, captured for artifact dumps

    def wrapped_batches():
        for b in batches:
            if preview[0] is None:
                preview[0] = b
            yield b

    @jax.jit
    def preview_fn(params, bn_state, inputs, lengths, speakers, mels):
        outputs, _ = model.forward(
            params, bn_state, inputs, lengths, speaker_ids=speakers,
            mel_targets=mels, is_training=False)
        wav = dsp.inv_spectrogram(outputs["linear_outputs"][0], cfg)
        return (outputs["linear_outputs"][0], outputs["mel_outputs"][0],
                outputs["alignments"][0], wav)

    @jax.jit
    def freerun_fn(params, bn_state, inputs, lengths, speakers):
        # AUTOREGRESSIVE decode (mel_targets=None): the honest serving-path
        # preview. A checkpoint with perfect teacher-forced previews can
        # still free-run to silence (exposure bias) — this surfaces that
        # during training instead of at first deployment.
        outputs, _ = model.forward(
            params, bn_state, inputs, lengths, speaker_ids=speakers,
            mel_targets=None, is_training=False)
        wav = dsp.inv_spectrogram(outputs["linear_outputs"][0], cfg)
        return (outputs["alignments"][0], outputs["decoder_steps"][0], wav)

    def artifact_fn(state, step, writer=None):
        b = preview[0]
        if b is None:
            return
        # The LONGEST utterance of the preview batch shows the most
        # alignment structure (row 0 is arbitrary post-shuffle).
        i = int(np.argmax(np.asarray(b.input_lengths)))
        lin, mel, align, wav = preview_fn(
            state.params, state.bn_state, b.inputs[i:i + 1],
            b.input_lengths[i:i + 1], b.speaker_ids[i:i + 1],
            b.mel_targets[i:i + 1])
        wav = np.asarray(dsp.inv_preemphasis(wav, cfg.preemphasis))
        wav = wav[: dsp.find_endpoint(wav, cfg)]
        base = os.path.join(log_dir, "step-%06d" % step)
        dsp.save_wav(wav, base + "-audio.wav", cfg.sample_rate)
        text = sequence_to_text(np.asarray(b.inputs[i]))
        # Crop padding off the alignment plot: text axis to the real
        # input length, decoder axis to the frames actually voiced.
        t_in = int(b.input_lengths[i])
        voiced = np.flatnonzero(np.abs(np.asarray(b.mel_targets[i])).sum(-1))
        last_frame = int(voiced[-1]) + 1 if len(voiced) else 0
        s_used = -(-last_frame // cfg.outputs_per_step)
        # NOTE: teacher-forced (mel_targets drives the decoder inputs, like
        # the reference's training-graph dumps) — an undertrained model can
        # sound fine here while free-running to silence; judge serving
        # quality with scripts/alignment_report.py, which decodes
        # autoregressively.
        plot.plot_alignment(np.asarray(align)[:t_in, :s_used + 2],
                            base + "-align.png",
                            info="%s, %s, step=%d (teacher-forced)"
                                 % (args.model, time_string(), step))
        plot.plot_wave(wav, cfg.sample_rate, base + "-wav.png", text)
        plot.plot_specgram(np.asarray(lin), base + "-lin.png", "linear")
        plot.plot_specgram(np.asarray(mel), base + "-mel.png", "mel")
        if writer is not None:  # TB parity: output histograms + eval audio
            writer.histograms(step, {"linear_outputs": np.asarray(lin),
                                     "mel_outputs": np.asarray(mel)})
            writer.audio(step, "eval_audio", wav, cfg.sample_rate)
        log("Dumped artifacts for step %d (input: %s)" % (step, text))

        if args.freerun_preview:
            if args.freerun_text:
                # NOVEL-text canary: a training utterance can free-run
                # fine while the model still fails to generalize; pad to
                # the batch's text bucket so the jitted program is shared
                from nspeech_tpu.text import text_to_sequence
                from nspeech_tpu.text.symbols import PAD_ID

                seq = text_to_sequence(
                    args.freerun_text,
                    [c.strip() for c in cfg.cleaners.split(",")])
                fr_ids = np.full((1, b.inputs.shape[1]), PAD_ID, np.int32)
                fr_ids[0, : len(seq)] = seq[: b.inputs.shape[1]]
                fr_len = np.asarray([min(len(seq), b.inputs.shape[1])],
                                    np.int32)
                fr_in, fr_l = fr_ids, fr_len
                t_in = int(fr_len[0])
            else:
                fr_in = b.inputs[i:i + 1]
                fr_l = b.input_lengths[i:i + 1]
            fr_align, fr_steps, fr_wav = freerun_fn(
                state.params, state.bn_state, fr_in, fr_l,
                b.speaker_ids[i:i + 1])
            fr_wav = np.asarray(dsp.inv_preemphasis(fr_wav, cfg.preemphasis))
            fr_steps = int(fr_steps)
            # UNTRIMMED audio + full-frame RMS: silence must stay audible
            # in the artifact and visible in the metric.
            hop = config.stft_params(cfg)[1]
            fr_rms = float(np.sqrt(np.mean(np.square(
                fr_wav[: fr_steps * cfg.outputs_per_step * hop]))))
            dsp.save_wav(fr_wav, base + "-freerun.wav", cfg.sample_rate)
            plot.plot_alignment(
                np.asarray(fr_align)[:t_in, :fr_steps],
                base + "-freerun-align.png",
                info="%s, %s, step=%d (free-running)"
                     % (args.model, time_string(), step))
            if writer is not None:
                writer.scalars(step, {"freerun_rms": fr_rms,
                                      "freerun_decoder_steps": fr_steps})
                writer.audio(step, "freerun_audio", fr_wav, cfg.sample_rate)
            log("Free-run preview at step %d: rms=%.04f decoder_steps=%d"
                % (step, fr_rms, fr_steps))

    eval_fn = None
    if args.holdout:
        # Teacher-forced loss on utterances training never sees: the
        # overfitting signal the reference lacked entirely. One batch,
        # one compiled program, evaluated every summary interval.
        eval_batch = feeder.holdout_batch()

        @jax.jit
        def holdout_loss_fn(params, bn_state, b):
            outputs, _ = model.forward(
                params, bn_state, b.inputs, b.input_lengths,
                speaker_ids=b.speaker_ids, mel_targets=b.mel_targets,
                is_training=False)
            return model.loss(outputs, b.mel_targets, b.linear_targets)

        def eval_fn(state, step, writer):
            loss, metrics = holdout_loss_fn(
                state.params, state.bn_state, eval_batch)
            scalars = {"holdout_" + k: float(v) for k, v in metrics.items()
                       if getattr(v, "ndim", 0) == 0}
            scalars["holdout_loss"] = float(loss)
            writer.scalars(step, scalars)
            log("Holdout eval at step %d: loss=%.05f (%d utterances)"
                % (step, float(loss), len(feeder.holdout_items)))

    run_training(
        log_dir, state, step_fn, wrapped_batches(), mesh,
        jax.random.PRNGKey(args.seed + 1),
        checkpoint_interval=args.checkpoint_interval,
        summary_interval=args.summary_interval,
        log_interval=args.log_every,
        max_steps=args.max_steps,
        artifact_fn=artifact_fn,
        eval_fn=eval_fn,
        restore_step=args.restore_step,
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--log-dir", default=os.path.expanduser("logs"))
    parser.add_argument("--vctk", default="")
    parser.add_argument("--ljspeech", default="", help="LJSpeech-layout corpus dir")
    parser.add_argument("--librispeech", default="", help="corpus.csv-layout dir")
    parser.add_argument("--arctic", default="", help="CMU Arctic corpus dir")
    parser.add_argument("--model", default=None,
                        help="Model name (default: taco1, or the "
                             "--hparams-from checkpoint's model)")
    parser.add_argument("--name", help="Run name (defaults to model name)")
    parser.add_argument("--hparams", default="",
                        help="Comma-separated name=value overrides")
    parser.add_argument("--hparams-from", default="", metavar="CKPT_DIR",
                        help="Fine-tuning base: load the EFFECTIVE hparams "
                             "(and model name) from a checkpoint dir's run "
                             "metadata (config.json) instead of the YAML "
                             "defaults; --hparams overrides apply on top. "
                             "Restoring a checkpoint into a mismatched "
                             "architecture otherwise fails with an Orbax "
                             "tree error")
    parser.add_argument("--restore-step", type=int,
                        help="Checkpoint step to restore (default: latest)")
    parser.add_argument("--summary-interval", type=int, default=1000)
    parser.add_argument("--log-every", type=int, default=1,
                        help="Read the loss (a device sync) only every N-th step; dispatches chain in between (bench-style). 1 = reference per-step logging")
    parser.add_argument("--checkpoint-interval", type=int, default=1000)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--slack-url", help="Slack webhook for run reports")
    parser.add_argument("--cache-dir", default=None,
                        help="On-disk feature cache directory")
    parser.add_argument("--device-cache", type=int, default=0, metavar="N",
                        help="Small-corpus mode: pin N epoch-variants of "
                             "batches in device HBM and stream them with "
                             "no per-step host transfer (0 = stream from "
                             "host)")
    parser.add_argument("--holdout", type=int, default=0, metavar="N",
                        help="Hold N evenly-spaced utterances out of "
                             "training and report their teacher-forced "
                             "loss every summary interval (overfitting "
                             "signal)")
    parser.add_argument("--freerun-preview", action="store_true",
                        help="At each checkpoint, ALSO decode the preview "
                             "utterance autoregressively (the serving path) "
                             "and dump step-*-freerun.wav/-align.png plus "
                             "freerun_rms / freerun_decoder_steps metrics — "
                             "catches exposure bias (free-running to "
                             "silence) that teacher-forced previews hide")
    parser.add_argument("--freerun-text", default="",
                        help="With --freerun-preview: free-run THIS novel "
                             "text instead of a training utterance (a "
                             "generalization canary — memorized text can "
                             "free-run fine while novel text stalls)")
    parser.add_argument("--cmudict-path", default=None,
                        help="cmudict-0.7b file for ARPAbet substitution")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None,
                        help="Force JAX backend (e.g. cpu) for smoke runs")
    parser.add_argument("--matmul-precision", default="bfloat16",
                        choices=["bfloat16", "tensorfloat32", "highest"],
                        help="MXU pass precision (bf16 single-pass is ~2x "
                             "faster than fp32 'highest' on TPU)")
    parser.add_argument("--git", action="store_true",
                        help="Verify the working tree is clean")
    return parser


def main() -> None:
    args = build_parser().parse_args()
    from nspeech_tpu.utils.platform import set_platform

    set_platform(args.platform)
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    if args.hparams_from:
        from nspeech_tpu.train.metadata import config_from_checkpoint

        cfg, args.model = config_from_checkpoint(
            args.hparams_from, model_name=args.model,
            overrides=args.hparams)
    else:
        args.model = args.model or "taco1"
        cfg = config.load_config(args.model)
        cfg.parse(args.hparams)
    run_name = args.name or args.model
    log_dir = os.path.join(args.log_dir, run_name)
    os.makedirs(log_dir, exist_ok=True)
    infolog.init(os.path.join(log_dir, "train.log"), run_name, args.slack_url)
    infolog.log(
        "matmul precision: %s (bf16 is the TPU default; pass "
        "--matmul-precision highest for full-fp32 matmuls)"
        % args.matmul_precision)
    if args.hparams_from:
        infolog.log("hparams base: run metadata from %s" % args.hparams_from)
    if args.git:
        from nspeech_tpu.utils import get_git_commit

        get_git_commit()
    train(log_dir, args, cfg)


if __name__ == "__main__":
    main()
