"""Length (sequence) sharding for Tacotron's convolutional stacks.

SURVEY.md §2.7 SP row: "Tacotron encoder/postnet convolutions are
length-shardable the same way" as the WaveNet time sharding
(parallel/timeshard.py). SAME-padded convs are non-causal, so unlike
WaveNet's left-only halo each shard exchanges a halo on BOTH sides via
``lax.ppermute``; the non-circular permutation leaves zeros at the
sequence edges, which is exactly SAME padding's zero convention, so the
sharded stack equals the unsharded one bit-for-bit
(tests/test_lengthshard.py).

Halos are exchanged PER LAYER (depth kernel_width//2): a single up-front
exchange of the stack's total halo is NOT exact at the sequence edges,
because each conv+BN layer re-inserts true zeros at the boundary in the
unsharded computation while biases/BN offsets would pollute a pre-padded
zero region. Per-layer exchange also only requires chunks at least one
kernel half-width long.

Scope: inference-mode stacks (BatchNorm running statistics, which are
pointwise). Training-mode BN needs cross-shard batch statistics; under
plain ``jit`` + GSPMD data parallelism XLA already computes those
globally, and the sequential decoder — not the conv stacks — bounds
training sequence length, so a shard_map training path would add
complexity for no reachable win. The long-sequence case this solves is
SYNTHESIS: postnet + expand stacks over arbitrarily many decoder frames.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nspeech_tpu.ops import layers as L
from nspeech_tpu.parallel.mesh import DATA_AXIS


def _both_halos(x: jnp.ndarray, h: int, axis_name: str, n: int) -> jnp.ndarray:
    """[chunk] -> [left_halo | chunk | right_halo] along axis 1; edge
    shards receive zeros (SAME padding's convention)."""
    left = jax.lax.ppermute(
        x[:, -h:], axis_name, [(k, k + 1) for k in range(n - 1)])
    right = jax.lax.ppermute(
        x[:, :h], axis_name, [(k + 1, k) for k in range(n - 1)])
    return jnp.concatenate([left, x, right], axis=1)


def make_length_sharded_conv_stack(
    mesh: Mesh,
    activation_for: Callable[[int, int], Optional[Callable]],
    axis: str = DATA_AXIS,
    out_dense: bool = False,
):
    """Builds fn(params, state, x [N, T, C]) -> y with T sharded over
    ``axis``. ``params`` holds "convs" (list of conv_bn layer params, and
    "out" when ``out_dense``); ``activation_for(i, n)`` picks each layer's
    activation. Inference mode (BN running stats)."""
    n = mesh.shape[axis]

    def local_fn(params, state, x_loc):
        t_loc = x_loc.shape[1]
        n_layers = len(params["convs"])
        y = x_loc
        for i, (p, s) in enumerate(zip(params["convs"], state["convs"])):
            h = p["conv"]["kernel"].shape[0] // 2
            if t_loc < h:
                raise ValueError(
                    f"chunk {t_loc} < kernel halo {h}: shard longer chunks")
            w = _both_halos(y, h, axis, n) if h else y
            yw, _ = L.conv_bn(p, s, w, activation_for(i, n_layers),
                              is_training=False)
            y = yw[:, h: h + t_loc] if h else yw
        if out_dense:
            y = L.dense(params["out"], y)
        return y

    def fn(params, state, x):
        T = x.shape[1]
        if T % n != 0:
            raise ValueError(f"length {T} not divisible by {n} shards")
        sharded = jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis, None)),
            out_specs=P(None, axis, None),
        )
        return sharded(params, state, x)

    return fn


def make_length_sharded_postnet(mesh: Mesh, axis: str = DATA_AXIS):
    """Length-sharded Tacotron-2 postnet (tanh convs + output dense;
    models/modules.py postnet semantics, inference mode)."""
    return make_length_sharded_conv_stack(
        mesh,
        activation_for=lambda i, n: jnp.tanh if i < n - 1 else None,
        axis=axis,
        out_dense=True,
    )


def make_length_sharded_encoder_convs(mesh: Mesh, axis: str = DATA_AXIS):
    """Length-sharded Tacotron-2 encoder conv stack (relu convs; the
    BiLSTM that follows is sequential over time and stays unsharded)."""
    return make_length_sharded_conv_stack(
        mesh,
        activation_for=lambda i, n: jax.nn.relu if i < n - 1 else None,
        axis=axis,
        out_dense=False,
    )
