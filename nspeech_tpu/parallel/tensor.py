"""Tensor parallelism: shard the Tacotron-2 weights over the mesh's
``model`` axis.

The reference has no TP (SURVEY.md §2.7 marks it an optional axis for the
1024-unit decoder). Here it is expressed purely through shardings: a rules
table maps parameter key-paths to PartitionSpecs, the train state is placed
accordingly, and GSPMD partitions the matmuls and inserts the collectives —
no model-code changes. Coverage: all LSTM gate kernels (decoder, attention,
encoder/expand BiLSTMs) column-sharded; frame and linear projections
row-sharded (they contract sharded activations); the prenet as a Megatron
column->row pair; the attention energy with its three projections and ``v``
sharded consistently over the attention dims (the energy becomes a psum of
partial dots); conv stacks over output channels with BN params following.

At nspeech model sizes TP is a capability demonstration more than a win
(the matmuls are small); it matters when decoder width is scaled up.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nspeech_tpu.parallel.mesh import MODEL_AXIS

# (key-path regex, spec). First match wins; default replicated.
TACO2_TP_RULES: List[Tuple[str, P]] = [
    # decoder + attention LSTMs: column-parallel gates
    (r"\['(lstm[12]|attn_lstm)'\]\['kernel'\]", P(None, MODEL_AXIS)),
    (r"\['(lstm[12]|attn_lstm)'\]\['bias'\]", P(MODEL_AXIS)),
    # frame projection: row-parallel (contracts the sharded LSTM output)
    (r"\['frame_proj'\]\['kernel'\]", P(MODEL_AXIS, None)),
    # prenet: Megatron-style column then row (relu is elementwise on the
    # column-sharded hidden)
    (r"\['decoder_prenet'\]\['layers'\]\[0\]\['kernel'\]",
     P(None, MODEL_AXIS)),
    (r"\['decoder_prenet'\]\['layers'\]\[0\]\['bias'\]", P(MODEL_AXIS)),
    (r"\['decoder_prenet'\]\['layers'\]\[1\]\['kernel'\]",
     P(MODEL_AXIS, None)),
    # attention energy: all three projections column-sharded consistently
    # (each shard holds a slice of the attention dims inside the tanh) and
    # v sharded the same way, so the energy is a psum of partial dots
    (r"\['attention'\]\['(memory|query|location)_layer'\]\['kernel'\]",
     P(None, MODEL_AXIS)),
    (r"\['attention'\]\['v'\]", P(MODEL_AXIS)),
    # encoder/expand BiLSTMs: column-parallel gates
    (r"\['(encoder|expand)'\]\['lstm_[fb]w'\]\['kernel'\]",
     P(None, MODEL_AXIS)),
    (r"\['(encoder|expand)'\]\['lstm_[fb]w'\]\['bias'\]", P(MODEL_AXIS)),
    # conv stacks: output channels sharded (BN params follow channels)
    (r"\['(encoder|expand|postnet)'\]\['convs'\]\[\d+\]\['conv'\]"
     r"\['kernel'\]", P(None, None, MODEL_AXIS)),
    (r"\['(encoder|expand|postnet)'\]\['convs'\]\[\d+\]\['conv'\]"
     r"\['bias'\]", P(MODEL_AXIS)),
    (r"\['(encoder|expand|postnet)'\]\['convs'\]\[\d+\]\['bn'\]"
     r"\['(scale|offset)'\]", P(MODEL_AXIS)),
    # linear projection: row-parallel — 1025 freq bins don't divide evenly,
    # so contract the (sharded) 512-dim input instead
    (r"\['linear_proj'\]\['kernel'\]", P(MODEL_AXIS, None)),
]


def spec_for_path(path_str: str, rules=TACO2_TP_RULES) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            return spec
    return P()


def shard_params(params, mesh: Mesh, rules=TACO2_TP_RULES):
    """Place a parameter pytree with TP rules applied (default replicated)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = [
        jax.device_put(v, NamedSharding(mesh, spec_for_path(
            jax.tree_util.keystr(path), rules)))
        for path, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def shard_train_state(state, mesh: Mesh, rules=TACO2_TP_RULES):
    """Place a TrainState: params (and the optimizer moments, which mirror
    the param tree) by TP rules; everything else replicated. The jitted
    step then runs model-parallel with no in_shardings plumbing — committed
    input shardings propagate through GSPMD."""
    from nspeech_tpu.train.loop import TrainState

    params = shard_params(state.params, mesh, rules)
    repl = NamedSharding(mesh, P())

    def place_opt(node):
        # optax moment trees (mu/nu) have the params treedef; anything with
        # a different structure is replicated leaf-wise. Log when a node
        # carrying real arrays takes the fallback: a new optimizer (or an
        # optax change) silently losing moment sharding is exactly the kind
        # of regression that should be visible in the run log.
        try:
            if (jax.tree_util.tree_structure(node)
                    == jax.tree_util.tree_structure(state.params)):
                return shard_params(node, mesh, rules)
        except Exception:
            pass
        if any(getattr(leaf, "ndim", 0) > 0
               for leaf in jax.tree_util.tree_leaves(node)):
            import logging

            logging.getLogger(__name__).warning(
                "shard_train_state: optimizer-state node %s does not mirror "
                "the param tree; replicating it leaf-wise (no TP sharding)",
                type(node).__name__)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), node)

    if isinstance(state.opt_state, tuple):
        opt_state = tuple(
            type(o)(*[place_opt(field) for field in o])
            if hasattr(o, "_fields") else place_opt(o)
            for o in state.opt_state
        )
    else:
        opt_state = place_opt(state.opt_state)

    bn_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state.bn_state)
    step = jax.device_put(state.step, repl)
    ema = (None if state.ema_params is None else jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state.ema_params))
    return TrainState(step, params, bn_state, opt_state, ema)
