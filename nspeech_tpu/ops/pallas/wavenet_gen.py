"""Pallas TPU kernel: WaveNet autoregressive sampling, fully VMEM-resident.

The generation loop runs inside ONE kernel launch as a grid over 128-sample
chunks: weights and the dilation ring buffers stay resident in VMEM across
the whole utterance (scratch persists over the sequential TPU grid), while
the per-chunk inputs/outputs (forced priming codes, local-conditioning
projections, emitted codes) are double-buffered through the Pallas pipeline.
This replaces the reference's one-session-call-per-sample queue generator
(reference: generate_wavenet.py:109-122, wavenet.py:487-557).

Kernel design rules (learned the hard way — dynamic sublane indexing and
vector->scalar extraction lower pathologically on TPU):
- NO dynamic indexing anywhere: weight "gathers" for the one-hot input are
  [B, Q] x [Q, R] matmuls against one-hots kept as vectors; ring-buffer
  reads/writes are iota-mask selects over statically-sliced segments, with
  ring rows packing LANE//R slots per 128-lane row when batched (slot
  extraction is a lax.switch over static lane slices);
- sampled codes never leave vector registers: the next input one-hot and
  the emitted integer code come from per-row max/min reductions;
- the four gate matmuls per layer (filter/gate x current/state taps) fuse
  into one [B, 2R] @ [2R, 2DC] matmul; the 50 skip matmuls are DEFERRED:
  gated activations accumulate into a [B, L*DC] scratch and one
  [B, L*DC] @ [L*DC, S] matmul at the end replaces 50 serial ones (only
  the dense path is in the sequential dependence chain);
- global conditioning is constant over the utterance, so gc @ W_gc folds
  into per-layer (per-stream) biases computed outside the kernel;
- local conditioning is precomputed OUTSIDE the kernel as per-sample
  per-layer bias rows (lc @ W_lc for all layers at once, one XLA matmul)
  and streamed chunk-by-chunk through the grid pipeline.

Batch lives on the sublane dimension: generating B streams costs barely
more per step than one (the chain is latency-bound), so aggregate
throughput scales ~linearly with batch up to the sublane tile. Local
conditioning currently supports batch=1 (the vocoder serving path).
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
    ``gc_ids`` has B entries the gate biases become per-stream. Includes
    ``wlc`` ([lc_channels, L*2DC]) when the net is locally conditioned."""
    R, DC, S = net.residual_channels, net.dilation_channels, net.skip_channels
    gc_vecs = None
    if gc_ids is not None and net.gc_channels:
        gc_vecs = jnp.take(params["gc_embedding"], gc_ids, axis=0)  # [B, C]

    wfg, bfg, wdense, bdense, wskip, bskip, wlc = [], [], [], [], [], [], []
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
        if net.lc_channels:
            wlc.append(jnp.concatenate(
                [lp["lc_filter"][0], lp["lc_gate"][0]], axis=1))  # [M, 2DC]

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
    if net.lc_channels:
        packed["wlc"] = jnp.concatenate(wlc, axis=1)  # [M, L*2DC]
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), packed)


def _make_kernel(net, batch: int, n_chunks: int, prime_len: int,
                 temperature: float, deterministic: bool, use_lc: bool,
                 dtype=jnp.float32):
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
    inv_temp = 1.0 / max(temperature, 1e-6)
    B = batch
    LCW = L * 2 * DC if use_lc else 1

    def kernel(seed_ref, forced_ref, lc_ref,
               wc_ref, wfg_ref, bfg_ref, wdense_ref, bdense_ref,
               wskip_ref, bskip_ref, post1_ref, post2_ref, b1_ref, b2_ref,
               out_ref, ring_ref, oh_cur_ref, oh_prev_ref, gated_ref):
        chunk = pl.program_id(0)

        q_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
        lane_group_iota = lane_iota // R
        lc_rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, 2 * DC), 0)

        @pl.when(chunk == 0)
        def _init():
            if not deterministic:
                pltpu.prng_seed(seed_ref[0])
            ring_ref[:] = jnp.zeros_like(ring_ref)
            # First free-running input: mid-scale silence
            # (generate_wavenet.py:88); previous input at t=0: zeros (the
            # reference queues start zeroed, wavenet.py:499-531).
            oh_cur_ref[:] = (q_iota == Q // 2).astype(dtype)
            oh_prev_ref[:] = jnp.zeros((B, Q), dtype)

        def step(i, carry):
            t = chunk * LANE + i

            # --- input one-hot ------------------------------------------
            if prime_len > 0:
                forced_code = jnp.sum(
                    jnp.where(lane_iota == i, forced_ref[0], 0),
                    axis=1, keepdims=True)                         # [B, 1]
                use_forced = (t < prime_len).astype(dtype)
                forced_onehot = (q_iota == forced_code).astype(dtype)
                cur_onehot = (use_forced * forced_onehot
                              + (1.0 - use_forced) * oh_cur_ref[:])
            else:
                cur_onehot = oh_cur_ref[:]

            prev_onehot = oh_prev_ref[:]
            oh_prev_ref[:] = cur_onehot

            # --- causal layer: [B, 2Q] @ [2Q, R] ------------------------
            x2 = jnp.concatenate([cur_onehot, prev_onehot], axis=1)
            cur = jnp.dot(x2, wc_ref[:],
                          preferred_element_type=jnp.float32).astype(dtype)

            # --- dilated stack (serial chain: gates + dense only) -------
            for li in range(L):
                d = dilations[li]
                nrow = rows_per_layer[li]
                off = int(row_offsets[li])
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
                fg = jnp.dot(xin, wfg_ref[li],
                             preferred_element_type=jnp.float32) + bfg_ref[li]
                if use_lc:
                    lseg = lc_ref[0][:, li * 2 * DC:(li + 1) * 2 * DC]
                    fg = fg + jnp.sum(
                        jnp.where(lc_rows == i, lseg, 0.0), axis=0,
                        keepdims=True)
                gated = (jnp.tanh(fg[:, :DC])
                         * jax.nn.sigmoid(fg[:, DC:])).astype(dtype)
                gated_ref[:, li * DC:(li + 1) * DC] = gated
                cur = (cur.astype(jnp.float32)
                       + jnp.dot(gated, wdense_ref[li],
                                 preferred_element_type=jnp.float32)
                       + bdense_ref[li]).astype(dtype)

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
            oh_cur_ref[:] = (q_iota == code).astype(dtype)

            out_ref[0] = jnp.where(lane_iota == i, code, out_ref[0])
            return carry

        jax.lax.fori_loop(0, LANE, step, jnp.int32(0), unroll=False)

    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # seed
            pl.BlockSpec((1, B, LANE), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),                  # forced
            pl.BlockSpec((1, LANE, LCW), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),                  # lc proj
        ] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)                   # weights
            for _ in range(11)
        ],
        out_specs=pl.BlockSpec((1, B, LANE), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((total_rows_ring, B, ring_lanes), dtype),  # rings
            pltpu.VMEM((B, Q), dtype),                    # current one-hot
            pltpu.VMEM((B, Q), dtype),                    # previous one-hot
            pltpu.VMEM((B, L * DC), dtype),               # gated (lanes)
        ],
    )
    out_shape = jax.ShapeDtypeStruct((n_chunks, B, LANE), jnp.int32)
    return kernel, grid_spec, out_shape


class PallasWaveNetGenerator:
    """Reusable generator: params are packed once and the kernel compiled
    once per (batch, n_samples, prime_len, temperature) signature, so
    repeated calls pay only the kernel launch."""

    def __init__(self, net, params, gc_ids: Optional[jnp.ndarray] = None,
                 interpret: bool = False, dtype=jnp.float32):
        if net.scalar_input or net.filter_width != 2:
            raise NotImplementedError(
                "Pallas generator: one-hot filter_width=2 only")
        self.net = net
        self.interpret = interpret
        self.dtype = dtype
        packed = pack_params(net, params, gc_ids)
        # Weight matrices in compute dtype; biases stay f32 (accumulators).
        bias_keys = {"bfg", "bdense", "bskip", "b1", "b2"}
        self.packed = {
            k: jnp.asarray(v if k in bias_keys else v.astype(dtype))
            for k, v in packed.items()
        }
        self._fns: dict = {}

    def _get_fn(self, batch: int, n_chunks: int, prime_len: int,
                temperature: float, deterministic: bool, use_lc: bool):
        key = (batch, n_chunks, prime_len, temperature, deterministic, use_lc)
        if key not in self._fns:
            kernel, grid_spec, out_shape = _make_kernel(
                self.net, batch, n_chunks, prime_len, temperature,
                deterministic, use_lc, dtype=self.dtype)
            fn = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=self.interpret,
            )
            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def __call__(self, n_samples: int, seed: int = 0, batch: int = 1,
                 seed_codes: Optional[jnp.ndarray] = None,
                 lc: Optional[jnp.ndarray] = None,
                 temperature: float = 1.0,
                 deterministic: bool = False) -> jnp.ndarray:
        """Generate mu-law codes [batch, n_samples].

        ``lc``: per-sample local conditioning [1, prime_len + n_samples, M]
        (batch=1 only). ``deterministic=True`` replaces Gumbel sampling with
        argmax (used for equivalence tests against the scan generator).
        """
        use_lc = lc is not None
        if use_lc and not self.net.lc_channels:
            raise ValueError("model has lc_channels=0; cannot condition")
        if self.net.lc_channels and not use_lc:
            raise ValueError("locally-conditioned model needs lc=")
        if use_lc and batch != 1:
            raise NotImplementedError("Pallas lc generation is batch=1")

        prime_len = 0 if seed_codes is None else int(seed_codes.shape[1])
        total = prime_len + n_samples
        n_chunks = _round_up(total, LANE) // LANE
        fn = self._get_fn(batch, n_chunks, prime_len, temperature,
                          deterministic, use_lc)

        forced = np.zeros((batch, n_chunks * LANE), np.int32)
        if seed_codes is not None:
            forced[:, :prime_len] = np.asarray(seed_codes)
        forced = jnp.asarray(
            forced.reshape(batch, n_chunks, LANE).transpose(1, 0, 2))

        L, DC = len(self.net.dilations), self.net.dilation_channels
        if use_lc:
            # One XLA matmul projects mel features into per-layer gate
            # biases for every sample; the kernel streams it per chunk.
            lc = jnp.asarray(lc, jnp.float32)[0]            # [T, M]
            if lc.shape[0] < n_chunks * LANE:
                lc = jnp.pad(lc, ((0, n_chunks * LANE - lc.shape[0]), (0, 0)))
            lc_proj = (lc[: n_chunks * LANE] @ self.packed["wlc"]).astype(
                jnp.float32)
            lc_proj = lc_proj.reshape(n_chunks, LANE, L * 2 * DC)
        else:
            lc_proj = jnp.zeros((n_chunks, LANE, 1), jnp.float32)

        p = self.packed
        out = fn(jnp.asarray([seed], jnp.int32), forced, lc_proj,
                 p["wc"], p["wfg"], p["bfg"], p["wdense"], p["bdense"],
                 p["wskip"], p["bskip"], p["post1"], p["post2"],
                 p["b1"], p["b2"])
        codes = jnp.transpose(out, (1, 0, 2)).reshape(batch, n_chunks * LANE)
        # codes[:, t] is the prediction for time t+1 (same convention as the
        # scan generator): the first free sample sits at prime_len-1.
        start = max(prime_len - 1, 0)
        return codes[:, start: start + n_samples]


def generate_pallas(
    net,
    params,
    n_samples: int,
    seed: int = 0,
    batch: int = 1,
    gc_ids: Optional[jnp.ndarray] = None,
    seed_codes: Optional[jnp.ndarray] = None,
    lc: Optional[jnp.ndarray] = None,
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
               lc=lc, temperature=temperature, deterministic=deterministic)
