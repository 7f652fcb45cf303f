"""Convert a reference (TensorFlow) checkpoint into a servable run dir.

The reference saves ``tf.train.Saver`` bundles and serves them via
``saver.restore`` — Tacotron checkpoints through its Synthesizer
(reference: neural_speech/synthesizer.py:34-38), WaveNet checkpoints
through its sampler (generate_wavenet.py restore flow). This CLI reads
such a bundle with the from-spec reader in
``nspeech_tpu/migrate/tfbundle.py`` (no TensorFlow required), detects
which reference model it holds, maps the variables onto our param tree
(migrate/reference.py for WaveNet, migrate/tacotron.py for taco1/taco2),
and writes a normal nspeech_tpu run directory — Orbax checkpoint +
``config.json`` run metadata — so every downstream consumer
(``synthesize.py``, ``demo_server.py``, ``generate_wavenet.py``,
``eval.py``, streaming) serves the imported weights with no extra flags:

    python import_reference_ckpt.py \
        --ckpt /data/ref_logs/model.ckpt-250000 --out /data/imported/run

Most hparams are derived from the weight shapes. For WaveNet the
dilation-stack factorization is not derivable (only the layer count is),
so pass --dilations-length/--dilations-depth if the run deviated from the
stock 10x5 (reference: neural_speech/hparams/wavenet.yaml:3-4). For the
Tacotrons, audio-analysis hparams (sample_rate etc.) are not in the graph
— pass them via --hparams when they deviate from the YAML defaults.
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def _parse_step(args, prefix: str) -> int:
    if args.step is not None:
        return args.step
    m = re.search(r"-(\d+)$", os.path.basename(prefix))
    return int(m.group(1)) if m else 0


def _write_run(out: str, model_name: str, cfg, state, step: int) -> str:
    from nspeech_tpu.train.checkpoint import CheckpointManager
    from nspeech_tpu.train.metadata import save_run_metadata

    out = os.path.abspath(out)
    os.makedirs(out, exist_ok=True)
    ckpt_dir = os.path.join(out, "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(step, state)
    mgr.wait()
    mgr.close()
    save_run_metadata(ckpt_dir, model_name, cfg)
    return ckpt_dir


def _check_tree(init_params, imported, what: str) -> None:
    from jax import tree_util

    init_td = tree_util.tree_structure(init_params)
    imp_td = tree_util.tree_structure(imported)
    if init_td != imp_td:
        raise SystemExit(
            f"imported {what} tree does not match init for the derived "
            f"config:\n  init:     {init_td}\n  imported: {imp_td}")
    for (pa, a), (_, b) in zip(
            tree_util.tree_flatten_with_path(init_params)[0],
            tree_util.tree_flatten_with_path(imported)[0]):
        if a.shape != b.shape:
            raise SystemExit(f"shape mismatch at {tree_util.keystr(pa)}: "
                             f"init {a.shape} vs checkpoint {b.shape}")


def _import_wavenet_run(args, prefix: str) -> int:
    from nspeech_tpu.migrate import check_dilations, import_wavenet
    params_np, derived = import_wavenet(prefix)
    n_layers = derived.pop("n_layers")

    from nspeech_tpu.config import load_config
    cfg = load_config("wavenet")
    length = args.dilations_length or int(cfg.dilations_length)
    depth = args.dilations_depth or int(cfg.dilations_depth)
    check_dilations(n_layers, length, depth)
    derived["dilations_length"] = length
    derived["dilations_depth"] = depth
    # Multi-speaker serving reads num_speakers from metadata; the gc table
    # cardinality IS that speaker count (reference: train_wavenet.py
    # startup mutation of gc_category_cardinality).
    if derived.get("gc_category_cardinality"):
        derived["num_speakers"] = derived["gc_category_cardinality"]
    cfg = cfg.replace(**derived)
    if args.hparams:
        cfg = cfg.parse(args.hparams)

    import jax
    import jax.numpy as jnp
    from jax import tree_util
    from nspeech_tpu.models.wavenet import WaveNet
    from nspeech_tpu.train.loop import create_state
    from nspeech_tpu.train.optim import make_optimizer

    net = WaveNet(cfg)
    tx, _ = make_optimizer(cfg, "wavenet")
    state = create_state(net, tx, jax.random.PRNGKey(0))
    imported = tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                  params_np)
    _check_tree(state.params, imported, "param")
    state = state._replace(params=imported, opt_state=tx.init(imported))
    step = _parse_step(args, prefix)
    state = state._replace(step=jnp.asarray(step, jnp.int32))
    ckpt_dir = _write_run(args.out, "wavenet", cfg, state, step)

    n_params = sum(x.size for x in tree_util.tree_leaves(imported))
    print(f"Imported {n_params:,} parameters "
          f"({n_layers} dilated layers, "
          f"{'biases, ' if derived['use_biases'] else ''}"
          f"gc={derived['gc_channels']}, lc={derived['lc_channels']}) "
          f"-> {ckpt_dir} at step {step}")
    print(f"Serve with e.g.: python generate_wavenet.py "
          f"--checkpoint {ckpt_dir} --num-samples 16000")
    return 0


def _import_tacotron_run(args, prefix: str, model_name: str) -> int:
    from nspeech_tpu.migrate.tacotron import import_tacotron
    params_np, bn_np, derived = import_tacotron(prefix, model_name)

    from nspeech_tpu.config import load_config
    cfg = load_config(model_name).replace(**derived)
    if args.hparams:
        cfg = cfg.parse(args.hparams)

    import jax
    import jax.numpy as jnp
    from jax import tree_util
    from nspeech_tpu.models import create_model
    from nspeech_tpu.train.loop import create_state
    from nspeech_tpu.train.optim import make_optimizer

    model = create_model(model_name, cfg)
    tx, _ = make_optimizer(cfg, model_name)
    state = create_state(model, tx, jax.random.PRNGKey(0))
    as_jnp = lambda t: tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    imported, imported_bn = as_jnp(params_np), as_jnp(bn_np)
    _check_tree(state.params, imported, "param")
    _check_tree(state.bn_state, imported_bn, "batch-norm state")
    step = _parse_step(args, prefix)
    state = state._replace(params=imported, bn_state=imported_bn,
                           opt_state=tx.init(imported),
                           step=jnp.asarray(step, jnp.int32))
    ckpt_dir = _write_run(args.out, model_name, cfg, state, step)

    n_params = sum(x.size for x in tree_util.tree_leaves(imported))
    print(f"Imported {model_name}: {n_params:,} parameters "
          f"(attention={derived['attention_type']}, "
          f"r={derived['outputs_per_step']}, "
          f"speakers={derived['num_speakers']}) "
          f"-> {ckpt_dir} at step {step}")
    print(f"Serve with e.g.: python synthesize.py --checkpoint {ckpt_dir} "
          f"--text \"hello world.\"")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Import a reference tf.train.Saver checkpoint "
                    "(WaveNet, Tacotron-1 or Tacotron-2)")
    parser.add_argument("--ckpt", required=True,
                        help="checkpoint prefix (path of the .index file "
                             "minus '.index')")
    parser.add_argument("--out", required=True,
                        help="output run directory (created)")
    parser.add_argument("--model", default=None,
                        choices=["taco1", "taco2", "wavenet"],
                        help="reference model in the checkpoint "
                             "(default: detected from variable names)")
    parser.add_argument("--dilations-length", type=int, default=None,
                        help="WaveNet: training-time dilations_length "
                             "(default: wavenet.yaml value if consistent)")
    parser.add_argument("--dilations-depth", type=int, default=None,
                        help="WaveNet: training-time dilations_depth")
    parser.add_argument("--hparams", default="",
                        help="extra k=v,... overrides stored in the run "
                             "metadata (e.g. sample_rate=22050)")
    parser.add_argument("--step", type=int, default=None,
                        help="step number for the written checkpoint "
                             "(default: parsed from the prefix, else 0)")
    parser.add_argument("--platform", default="cpu",
                        help="jax platform for the conversion (cpu is fine; "
                             "weights are platform-neutral)")
    args = parser.parse_args(argv)

    from nspeech_tpu.utils.platform import set_platform
    set_platform(args.platform)

    prefix = args.ckpt
    if prefix.endswith(".index"):
        prefix = prefix[:-len(".index")]

    model_name = args.model
    if model_name is None:
        from nspeech_tpu.migrate.tacotron import detect_model
        model_name = detect_model(prefix)
        print(f"Detected reference model: {model_name}")
    if model_name == "wavenet":
        return _import_wavenet_run(args, prefix)
    return _import_tacotron_run(args, prefix, model_name)


if __name__ == "__main__":
    sys.exit(main())
