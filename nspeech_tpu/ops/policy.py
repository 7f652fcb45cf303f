"""Mixed-precision compute policy (``compute_dtype`` hparam).

TPU MXU throughput and HBM bandwidth both favor bfloat16: a bf16 matmul
runs on the MXU's native datapath (f32 matmuls are emulated at ~3x the
cost on v5e) and bf16 activations halve every byte the step moves. The
policy implemented here is the standard "parameter cast" scheme:

* master parameters, optimizer state, and batch-norm statistics stay
  float32 — nothing about checkpoints or the optimizer changes;
* each forward pass casts the parameter tree (and the floating inputs)
  to ``compute_dtype`` at entry, so matmuls see bf16 operands;
* matmul ACCUMULATION stays f32 — matmuls inside recurrent scans use
  ``preferred_element_type=float32`` and round the result back to the
  compute dtype (``ops.layers.acc_dot``), which is exactly the MXU's
  native bf16-multiply/f32-accumulate path;
* reductions that define training statistics (batch-norm moments,
  softmax normalizers, losses) compute in f32 (see
  ``layers.batch_norm``, ``models.attention._masked_softmax``, the
  model ``loss`` methods);
* gradients w.r.t. the f32 masters come out f32 automatically: the
  cast's autodiff transpose is a cast back.

bf16 needs no loss scaling (its exponent range equals f32's) — one
hparam, no new training knobs. Default ``float32`` is bit-identical to
the pre-policy behavior: every cast below is a no-op then.

The reference has no reduced-precision story (fp32 CUDA graphs
throughout); this is TPU-native beyond-parity surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_dtype(cfg) -> jnp.dtype:
    """The forward-pass dtype from the ``compute_dtype`` hparam."""
    name = str(cfg.get("compute_dtype", "float32") or "float32")
    dtype = jnp.dtype(name)
    if not jnp.issubdtype(dtype, jnp.floating):
        raise ValueError(f"compute_dtype must be a float dtype, got {name}")
    return dtype


def cast_floats(tree, dtype):
    """Cast every inexact-dtype leaf of ``tree`` to ``dtype``.

    Integer/bool leaves (ids, masks) and ``None`` pass through. A no-op
    when ``dtype`` is float32 and the tree already is (jnp.astype with
    the same dtype does not copy under jit).
    """
    if tree is None:
        return None
    dtype = jnp.dtype(dtype)

    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
