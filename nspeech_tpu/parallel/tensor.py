"""Tensor parallelism: shard the big decoder weights over the mesh's
``model`` axis.

The reference has no TP (SURVEY.md §2.7 marks it an optional axis for the
1024-unit decoder). Here it is expressed purely through shardings: a rules
table maps parameter key-paths to PartitionSpecs, the train state is placed
accordingly, and GSPMD partitions the matmuls and inserts the collectives —
no model-code changes. The LSTM gate kernels are column-sharded (each shard
computes a slice of the 4*units gate vector) and the frame projection is
row-sharded, so the decoder's per-step matmuls run model-parallel inside
the scan.

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
    # decoder LSTMs: column-parallel gates
    (r"\['lstm[12]'\]\['kernel'\]", P(None, MODEL_AXIS)),
    (r"\['lstm[12]'\]\['bias'\]", P(MODEL_AXIS)),
    # frame projection: row-parallel (contracts the sharded LSTM output)
    (r"\['frame_proj'\]\['kernel'\]", P(MODEL_AXIS, None)),
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
        # a different structure is replicated leaf-wise.
        try:
            if (jax.tree_util.tree_structure(node)
                    == jax.tree_util.tree_structure(state.params)):
                return shard_params(node, mesh, rules)
        except Exception:
            pass
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
    return TrainState(step, params, bn_state, opt_state)
