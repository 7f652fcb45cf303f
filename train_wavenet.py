#!/usr/bin/env python
"""WaveNet trainer CLI.

Same surface as the reference (reference: train_wavenet.py), including the
startup config mutations (num_speakers / gc_category_cardinality from the
feeder, zero l2 strength nulled — train_wavenet.py:40-44), on the jitted
data-parallel WaveNet step with receptive-field-overlapped windows.
"""

from __future__ import annotations

import argparse
import os

import jax

import nspeech_tpu.config as config
from nspeech_tpu.data.wavenet_feeder import WaveNetFeeder
from nspeech_tpu.models import create_model
from nspeech_tpu.train import create_state, make_optimizer
from nspeech_tpu.train.loop import build_wavenet_train_step
from nspeech_tpu.train.runner import pick_mesh, run_training
from nspeech_tpu.utils import infolog
from nspeech_tpu.utils.infolog import log

from train import prepare_input_paths


def train_wavenet(log_dir: str, args, cfg) -> None:
    log("Checkpoint dir: %s" % os.path.join(log_dir, "ckpt"))
    log("Using model: %s" % args.model)
    log(config.debug_string(cfg))

    # Model first: the feeder needs the receptive field
    # (reference: train_wavenet.py:36-39).
    net = create_model(args.model, cfg)
    log("Receptive field: %d samples" % net.receptive_field)

    if args.gta_dir:
        if cfg.lc_channels <= 0:
            raise SystemExit(
                "--gta-dir is local conditioning data; it requires "
                "lc_channels > 0 (e.g. --hparams lc_channels=%d)"
                % cfg.num_mels)
        log("GTA mode: local conditioning from predicted mels in %s"
            % args.gta_dir)
    feeder = WaveNetFeeder(
        prepare_input_paths(args), net.receptive_field, cfg,
        cache_dir=args.cache_dir,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        seed=args.seed, gta_dir=args.gta_dir or None)
    cfg.num_speakers = feeder.num_speakers
    cfg.gc_category_cardinality = feeder.num_speakers
    l2 = cfg.l2_regularization_strength or None

    # Snapshot the EFFECTIVE config (post-mutation) + speaker map next to
    # the checkpoint so generation/vocoding needs no manual flag hand-off.
    from nspeech_tpu.train import save_run_metadata

    save_run_metadata(os.path.join(log_dir, "ckpt"), args.model, cfg,
                      speaker_map=feeder.speaker2id)

    use_gc = cfg.gc_channels > 0
    use_lc = cfg.lc_channels > 0
    if use_gc:
        # rebuild with the updated cardinality
        net = create_model(args.model, cfg)

    tx, schedule = make_optimizer(cfg, args.model)
    mesh = pick_mesh(cfg.batch_size)
    if mesh is not None:
        log("Data-parallel over %d devices" % mesh.devices.size)
    ema = float(getattr(cfg, "ema_decay", 0.0))
    step_fn = build_wavenet_train_step(
        net, tx, cfg, mesh=mesh, schedule=schedule,
        use_gc=use_gc, use_lc=use_lc, l2_strength=l2, ema_decay=ema)
    state = create_state(net, tx, jax.random.PRNGKey(args.seed),
                         ema=bool(ema))

    run_training(
        log_dir, state, step_fn, feeder.batches(), mesh,
        jax.random.PRNGKey(args.seed + 1),
        checkpoint_interval=args.checkpoint_interval,
        summary_interval=args.summary_interval,
        log_interval=args.log_every,
        max_steps=args.max_steps,
        restore_step=args.restore_step,
    )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--log-dir", default=os.path.expanduser("logs"))
    parser.add_argument("--vctk", default="")
    parser.add_argument("--ljspeech", default="")
    parser.add_argument("--librispeech", default="")
    parser.add_argument("--arctic", default="")
    parser.add_argument("--model", default=None,
                        help="Model name (default: wavenet, or the "
                             "--hparams-from checkpoint's model)")
    parser.add_argument("--name")
    parser.add_argument("--hparams", default="")
    parser.add_argument("--hparams-from", default="", metavar="CKPT_DIR",
                        help="Fine-tuning base: load the EFFECTIVE hparams "
                             "(and model name) from a checkpoint dir's run "
                             "metadata instead of the YAML defaults; "
                             "--hparams overrides apply on top (e.g. resume "
                             "a trained vocoder on --gta-dir features)")
    parser.add_argument("--restore-step", type=int)
    parser.add_argument("--summary-interval", type=int, default=1000)
    parser.add_argument("--log-every", type=int, default=1,
                        help="Read the loss (a device sync) only every N-th step; dispatches chain in between (bench-style). 1 = reference per-step logging")
    parser.add_argument("--checkpoint-interval", type=int, default=1000)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--slack-url")
    parser.add_argument("--cache-dir", default=None)
    parser.add_argument("--gta-dir", default="",
                        help="Train on ground-truth-aligned (teacher-forced) "
                        "mels exported by export_gta.py instead of computed "
                        "mels — closes the vocoder's train/serve feature "
                        "mismatch")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--matmul-precision", default="bfloat16",
                        choices=["bfloat16", "tensorfloat32", "highest"])
    args = parser.parse_args()
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
        args.model = args.model or "wavenet"
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
    train_wavenet(log_dir, args, cfg)


if __name__ == "__main__":
    main()
