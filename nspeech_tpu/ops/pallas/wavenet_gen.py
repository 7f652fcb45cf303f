"""Pallas TPU kernel: WaveNet autoregressive sampling, fully VMEM-resident.

The entire generation loop runs inside ONE kernel launch: all weights
(~5 MB at the default 50-layer config), the per-layer dilation ring
buffers, and the sampling state live in VMEM for the whole utterance, so
each of the ~10^5 sequential samples costs only the serial compute chain —
no HBM traffic, no per-step dispatch. This is the TPU replacement for the
reference's one-session-call-per-sample queue generator
(reference: generate_wavenet.py:109-122, wavenet.py:487-557).

Kernel design rules (learned the hard way — dynamic sublane indexing and
vector->scalar extraction lower to very slow code on TPU):
- NO dynamic indexing anywhere: weight "gathers" for the one-hot input are
  [B, Q] x [Q, R] matmuls against one-hots kept as vectors; ring-buffer
  reads/writes are iota-mask selects over statically-sliced segments, with
  ring rows packing LANE//R slots per 128-lane row (slot extraction is a
  lax.switch over static lane slices);
- sampled codes never leave vector registers: the next input one-hot and
  the emitted integer code come from per-row max/min reductions;
- the four gate matmuls per layer (filter/gate x current/state taps) fuse
  into one [B, 2R] @ [2R, 2DC] matmul; the 50 skip matmuls are DEFERRED:
  gated activations accumulate into a [B, L*DC] scratch and one
  [B, L*DC] @ [L*DC, S] matmul at the end replaces 50 serial ones (only
  the dense path is in the sequential dependence chain);
- global conditioning is constant over the utterance, so gc @ W_gc folds
  into per-layer (per-stream) biases computed outside the kernel.

Batch lives on the sublane dimension: generating B streams costs barely
more per step than one (the chain is latency-bound), so aggregate
throughput scales ~linearly with batch up to the sublane tile.

Local conditioning is not yet supported here (models/wavenet.py's lax.scan
generator handles lc).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_params(net, params, gc_ids: Optional[jnp.ndarray] = None):
    """Restructure WaveNet params into the kernel's fused layout. When
    ``gc_ids`` has B entries the gate biases become per-stream."""
    R, DC, S = net.residual_channels, net.dilation_channels, net.skip_channels
    gc_vecs = None
    if gc_ids is not None and net.gc_channels:
        gc_vecs = jnp.take(params["gc_embedding"], gc_ids, axis=0)  # [B, C]

    wfg, bfg, wdense, bdense, wskip, bskip = [], [], [], [], [], []
    for lp in params["layers"]:
        f, g = lp["filter"], lp["gate"]  # [2, R, DC]; tap 0 = past/state
        w = jnp.concatenate([
            jnp.concatenate([f[1], g[1]], axis=1),   # current-tap rows
            jnp.concatenate([f[0], g[0]], axis=1),   # state-tap rows
        ], axis=0)                                    # [2R, 2DC]
        wfg.append(w)
        if gc_vecs is not None:
            b = jnp.concatenate([
                gc_vecs @ lp["gc_filter"][0], gc_vecs @ lp["gc_gate"][0]],
                axis=1)                               # [B, 2DC]
        else:
            b = jnp.zeros((1, 2 * DC))
        if net.use_biases:
            b = b + jnp.concatenate([lp["filter_bias"], lp["gate_bias"]])
        bfg.append(b)
        wdense.append(lp["dense"][0])                 # [DC, R]
        bdense.append(lp.get("dense_bias", jnp.zeros((R,))))
        wskip.append(lp["skip"][0])                   # [DC, S]
        bskip.append(lp.get("skip_bias", jnp.zeros((S,))))

    packed = {
        "wc": jnp.concatenate([params["causal"][1], params["causal"][0]],
                              axis=0),               # [2Q, R]: [cur; past]
        "wfg": jnp.stack(wfg),                       # [L, 2R, 2DC]
        "bfg": jnp.stack(bfg),                       # [L, 1|B, 2DC]
        "wdense": jnp.stack(wdense),                 # [L, DC, R]
        "bdense": jnp.stack(bdense)[:, None, :],     # [L, 1, R]
        # stacked skip: one [L*DC, S] matmul applies all layers at once
        "wskip": jnp.concatenate(wskip, axis=0),     # [L*DC, S]
        "bskip": sum(bskip)[None, :],                # [1, S]
        "post1": params["post1"][0],                 # [S, S]
        "post2": params["post2"][0],                 # [S, Q]
        "b1": (params.get("post1_bias", jnp.zeros((S,))))[None, :],
        "b2": (params.get("post2_bias",
                          jnp.zeros((net.quantization_channels,))))[None, :],
    }
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), packed)


def _make_kernel(net, batch: int, total_steps: int, prime_len: int,
                 temperature: float, deterministic: bool):
    L = len(net.dilations)
    dilations = list(net.dilations)
    R, DC, S, Q = (net.residual_channels, net.dilation_channels,
                   net.skip_channels, net.quantization_channels)
    if LANE % R != 0:
        raise NotImplementedError(f"residual_channels={R} must divide {LANE}")
    # B=1 keeps one slot per ring row (fastest serial path); batched runs
    # pack LANE//R slots per 128-lane row so the rings fit VMEM.
    pack = 1 if batch == 1 else LANE // R
    rows_per_layer = [max(1, -(-d // pack)) for d in dilations]
    row_offsets = np.concatenate([[0], np.cumsum(rows_per_layer)[:-1]]).astype(int)
    total_rows_ring = int(sum(rows_per_layer))
    ring_lanes = R if pack == 1 else LANE
    n_rows = _round_up(total_steps, LANE) // LANE
    inv_temp = 1.0 / max(temperature, 1e-6)
    B = batch

    def kernel(seed_ref, forced_ref,
               wc_ref, wfg_ref, bfg_ref, wdense_ref, bdense_ref,
               wskip_ref, bskip_ref, post1_ref, post2_ref, b1_ref, b2_ref,
               out_ref, ring_ref, oh_cur_ref, oh_prev_ref, gated_ref):
        if not deterministic:
            pltpu.prng_seed(seed_ref[0])
        ring_ref[:] = jnp.zeros_like(ring_ref)
        out_ref[:] = jnp.zeros_like(out_ref)

        q_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        lane_group_iota = jax.lax.broadcasted_iota(
            jnp.int32, (B, LANE), 1) // R                     # [B, LANE]
        out_row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, B, LANE), 0)
        out_lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, B, LANE), 2)

        # First free-running input: mid-scale silence (generate_wavenet.py:88);
        # previous input at t=0: zeros (queues start zeroed, wavenet.py:499-531).
        oh_cur_ref[:] = (q_iota == Q // 2).astype(jnp.float32)
        oh_prev_ref[:] = jnp.zeros((B, Q), jnp.float32)

        def step(t, carry):
            # --- input one-hot ------------------------------------------
            if prime_len > 0:
                sel = (out_row_iota == t // LANE) & (out_lane_iota == t % LANE)
                forced_code = jnp.sum(
                    jnp.where(sel, forced_ref[:], 0), axis=0)       # [B, LANE]
                forced_code = jnp.sum(forced_code, axis=1, keepdims=True)  # [B,1]
                use_forced = (t < prime_len).astype(jnp.float32)
                forced_onehot = (q_iota == forced_code).astype(jnp.float32)
                cur_onehot = (use_forced * forced_onehot
                              + (1.0 - use_forced) * oh_cur_ref[:])
            else:
                cur_onehot = oh_cur_ref[:]

            prev_onehot = oh_prev_ref[:]
            oh_prev_ref[:] = cur_onehot

            # --- causal layer: [B, 2Q] @ [2Q, R] ------------------------
            x2 = jnp.concatenate([cur_onehot, prev_onehot], axis=1)
            cur = jnp.dot(x2, wc_ref[:], preferred_element_type=jnp.float32)

            # --- dilated stack (serial chain: gates + dense only) -------
            for i in range(L):
                d = dilations[i]
                nrow = rows_per_layer[i]
                off = int(row_offsets[i])
                seg = ring_ref[off: off + nrow, :, :]    # [nrow, B, ring_lanes]
                slot = jax.lax.bitwise_and(t, d - 1)     # d is 2^k
                row = slot // pack
                group = slot % pack

                if nrow == 1:
                    padded = seg[0]                      # [B, ring_lanes]
                else:
                    seg_rows = jax.lax.broadcasted_iota(
                        jnp.int32, (nrow, B, ring_lanes), 0)
                    padded = jnp.sum(
                        jnp.where(seg_rows == row, seg, 0.0), axis=0)

                if pack == 1:
                    state = padded
                    new_padded = cur
                elif d == 1:
                    # only lane-group 0 is ever used when d == 1
                    state = padded[:, :R]
                    new_padded = jnp.pad(cur, ((0, 0), (0, LANE - R)))
                else:
                    state = jax.lax.switch(
                        group,
                        [lambda p, k=k: p[:, k * R:(k + 1) * R]
                         for k in range(pack)],
                        padded)
                    cur_tiled = jnp.concatenate([cur] * pack, axis=1)
                    group_mask = lane_group_iota == group
                    new_padded = jnp.where(group_mask, cur_tiled, padded)

                if nrow == 1:
                    ring_ref[off: off + 1, :, :] = new_padded[None]
                else:
                    ring_ref[off: off + nrow, :, :] = jnp.where(
                        seg_rows == row, new_padded[None], seg)

                xin = jnp.concatenate([cur, state], axis=1)     # [B, 2R]
                fg = jnp.dot(xin, wfg_ref[i],
                             preferred_element_type=jnp.float32) + bfg_ref[i]
                gated = jnp.tanh(fg[:, :DC]) * jax.nn.sigmoid(fg[:, DC:])
                gated_ref[:, i * DC:(i + 1) * DC] = gated
                cur = cur + jnp.dot(gated, wdense_ref[i],
                                    preferred_element_type=jnp.float32) \
                    + bdense_ref[i]

            # --- all skip contributions in one matmul --------------------
            skips = jnp.dot(gated_ref[:], wskip_ref[:],
                            preferred_element_type=jnp.float32) + bskip_ref[:]

            h = jnp.maximum(skips, 0.0)
            h = jnp.maximum(
                jnp.dot(h, post1_ref[:], preferred_element_type=jnp.float32)
                + b1_ref[:], 0.0)
            logits = jnp.dot(h, post2_ref[:],
                             preferred_element_type=jnp.float32) + b2_ref[:]

            if deterministic:
                scores = logits
            else:
                bits = pltpu.prng_random_bits((B, Q))
                # uint32->f32 unsupported in Mosaic; >>8 fits in int32/24 bits
                u = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                ).astype(jnp.float32)
                u = u * (1.0 / (1 << 24)) + 1e-10
                gumbel = -jnp.log(-jnp.log(u))
                scores = logits * inv_temp + gumbel

            # --- sample per row without leaving vector registers ---------
            best = jnp.max(scores, axis=1, keepdims=True)
            code = jnp.min(jnp.where(scores == best, q_iota, Q), axis=1,
                           keepdims=True)                        # [B, 1]
            oh_cur_ref[:] = (q_iota == code).astype(jnp.float32)

            out_ref[:] = jnp.where(
                (out_row_iota == t // LANE) & (out_lane_iota == t % LANE),
                code[None], out_ref[:])
            return carry

        jax.lax.fori_loop(0, total_steps, step, jnp.int32(0), unroll=False)

    out_shape = jax.ShapeDtypeStruct((n_rows, B, LANE), jnp.int32)
    scratch = [
        pltpu.VMEM((total_rows_ring, B, ring_lanes), jnp.float32),  # rings
        pltpu.VMEM((B, Q), jnp.float32),                      # current one-hot
        pltpu.VMEM((B, Q), jnp.float32),                      # previous one-hot
        pltpu.VMEM((B, L * DC), jnp.float32),                 # gated (lanes)
    ]
    return kernel, out_shape, scratch, n_rows


class PallasWaveNetGenerator:
    """Reusable generator: params are packed once and the kernel compiled
    once per (batch, n_samples, prime_len, temperature) signature, so
    repeated calls pay only the kernel launch."""

    def __init__(self, net, params, gc_ids: Optional[jnp.ndarray] = None,
                 interpret: bool = False):
        if net.scalar_input or net.filter_width != 2:
            raise NotImplementedError(
                "Pallas generator: one-hot filter_width=2 only")
        if net.lc_channels:
            raise NotImplementedError(
                "Pallas generator does not support local conditioning yet; "
                "use WaveNet.generate (lax.scan path)")
        self.net = net
        self.interpret = interpret
        self.packed = pack_params(net, params, gc_ids)
        self.packed = jax.tree_util.tree_map(jnp.asarray, self.packed)
        self._fns: dict = {}

    def _get_fn(self, batch: int, total: int, prime_len: int,
                temperature: float, deterministic: bool):
        key = (batch, total, prime_len, temperature, deterministic)
        if key not in self._fns:
            kernel, out_shape, scratch, n_rows = _make_kernel(
                self.net, batch, total, prime_len, temperature, deterministic)
            fn = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
                interpret=self.interpret,
            )
            self._fns[key] = (jax.jit(fn), n_rows)
        return self._fns[key]

    def __call__(self, n_samples: int, seed: int = 0, batch: int = 1,
                 seed_codes: Optional[jnp.ndarray] = None,
                 temperature: float = 1.0,
                 deterministic: bool = False) -> jnp.ndarray:
        prime_len = 0 if seed_codes is None else int(seed_codes.shape[1])
        total = prime_len + n_samples
        fn, n_rows = self._get_fn(batch, total, prime_len, temperature,
                                  deterministic)

        forced = np.zeros((batch, n_rows * LANE), np.int32)
        if seed_codes is not None:
            forced[:, :prime_len] = np.asarray(seed_codes)
        # [B, T] -> [n_rows, B, LANE]
        forced = jnp.asarray(
            forced.reshape(batch, n_rows, LANE).transpose(1, 0, 2))

        p = self.packed
        out = fn(jnp.asarray([seed], jnp.int32), forced,
                 p["wc"], p["wfg"], p["bfg"], p["wdense"], p["bdense"],
                 p["wskip"], p["bskip"], p["post1"], p["post2"],
                 p["b1"], p["b2"])
        codes = jnp.transpose(out, (1, 0, 2)).reshape(batch, n_rows * LANE)
        return codes[:, prime_len: prime_len + n_samples]


def generate_pallas(
    net,
    params,
    n_samples: int,
    seed: int = 0,
    batch: int = 1,
    gc_ids: Optional[jnp.ndarray] = None,
    seed_codes: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    deterministic: bool = False,
    interpret: bool = False,
):
    """One-shot convenience wrapper around PallasWaveNetGenerator.

    ``deterministic=True`` replaces Gumbel sampling with argmax (used for
    equivalence tests against the lax.scan generator).
    """
    gen = PallasWaveNetGenerator(net, params, gc_ids, interpret=interpret)
    return gen(n_samples, seed=seed, batch=batch, seed_codes=seed_codes,
               temperature=temperature, deterministic=deterministic)
