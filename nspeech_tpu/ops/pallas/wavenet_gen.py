"""Pallas TPU kernel: WaveNet autoregressive sampling, fully VMEM-resident.

The generation loop runs inside ONE kernel launch as a grid over 128-sample
chunks: weights and the dilation ring buffers stay resident in VMEM across
the whole utterance (scratch persists over the sequential TPU grid), while
the per-chunk inputs/outputs (forced priming codes, local-conditioning
projections, emitted codes) are double-buffered through the Pallas pipeline.
This replaces the reference's one-session-call-per-sample queue generator
(reference: generate_wavenet.py:109-122, wavenet.py:487-557).

Kernel design rules (measured on v5e — every rule below is worth 2x or
more and was validated by microbenchmark):
- The serial budget is DEPENDENT-OP LATENCY: a dependent small matmul
  costs ~85ns and any VPU op between two dependent matmuls adds ~80ns of
  handoff, while INDEPENDENT matmuls pipeline underneath for free. The
  whole kernel is therefore reassociated so each layer puts exactly ONE
  matmul + one tanh on the chain: fg_{i+1} = g_i @ (Wdense_i @ Wfcur_{i+1})
  + [x_i ; s_{i+1}] @ [Wfcur; Wfstate] + bias, with the residual updates,
  state taps, and skip contributions all off-chain. The causal layer is
  folded into layer 0's gate (wcc), split so the past-tap half is computed
  one step early and carried.
- Dynamic indexing on the LEADING (untiled) dim of a VMEM ref is plain
  address arithmetic (~10ns) — rings are read/written with pl.ds row
  slices. Dynamic SUBLANE/LANE indexing and iota-mask selects over whole
  segments lower pathologically (~870ns per d=512 layer — round 1's
  hidden cost).
- One transcendental per layer: sigmoid(b) == (1 + tanh(b/2))/2 with the
  1/2 pre-scaled into every gate-half weight column, so the gate is a
  single tanh over [filter|gate] plus one fma + one multiply.
- Cross-step state (one-hots, the carried causal half, the output row)
  rides in fori_loop carries (vector registers), stored to scratch once
  per 128-sample chunk, not per step.
- Gumbel noise for a whole chunk is drawn in one vectorized pass with the
  temperature folded in (argmax(l/T + g) == argmax(l + gT)); per step the
  sampling path is one row read + add + max/min reduction. Sampled codes
  never leave vector registers.
- Per-layer dense biases are NOT added in the loop: the residual is
  tracked bias-free and the cumulative bias's gate contribution
  (cbd_i @ (Wfcur_i + Wfstate_i)) folds into the per-layer constant.
- Global conditioning is constant over the utterance, so gc @ W_gc folds
  into per-layer (per-stream) biases computed outside the kernel; local
  conditioning streams as RAW mel rows ([LANE, B, M] per chunk) and rides
  INSIDE each layer's off-chain pre-dot ([x; s; mel] @ [Wfcur; Wfstate;
  Wlc]) — no wide projection, no per-layer lane slicing.

Batch lives on the sublane dimension: generating B streams costs barely
more per step than one (the chain is latency-bound), so aggregate
throughput scales ~linearly with batch up to the sublane tile. At B=1 the
skip contribution accumulates from the per-layer fused matmul; at B>1
gated activations collect in scratch for one [B, L*DC] @ [L*DC, S] matmul.
Local conditioning is batched: vocoding N mel-conditioned streams shares
one serial chain.
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
    ``wlc`` ([lc_channels, L*2DC]) when the net is locally conditioned.

    The layout implements the chain-shortening reassociation
    ``fg_{i+1} = x_i @ Wfcur_{i+1} + g_i @ (Wdense_i @ Wfcur_{i+1}) + ...``:
    only ``g_i @ wgb_i`` sits on the serial dependence chain; the residual
    updates and state-tap matmuls are independent work the MXU pipelines
    under the chain's latency.
    """
    R, DC, S = net.residual_channels, net.dilation_channels, net.skip_channels
    gc_vecs = None
    if gc_ids is not None and net.gc_channels:
        gc_vecs = jnp.take(params["gc_embedding"], gc_ids, axis=0)  # [B, C]

    wfcur, wfstate, bfg = [], [], []
    wdense, bdense, wskip, bskip, wlc = [], [], [], [], []
    for lp in params["layers"]:
        f, g = lp["filter"], lp["gate"]  # [2, R, DC]; tap 0 = past/state
        wfcur.append(jnp.concatenate([f[1], g[1]], axis=1))     # [R, 2DC]
        wfstate.append(jnp.concatenate([f[0], g[0]], axis=1))   # [R, 2DC]
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

    L = len(wfcur)
    # Chain blocks: wgb[i] = Wdense_i @ Wfcur_{i+1} (the only per-layer
    # matmul on the serial chain). The kernel tracks the residual WITHOUT
    # its accumulated dense biases (one add per layer saved on the hot
    # loop, and the rings store the same bias-free values); the cumulative
    # bias cbd_i = sum_{j<i} bdense_j is constant per layer, so its
    # current-tap and state-tap gate contributions fold into bchain.
    wgb = [wdense[i] @ wfcur[i + 1] for i in range(L - 1)]
    cbd = [jnp.zeros_like(bdense[0])]
    for i in range(L - 1):
        cbd.append(cbd[-1] + bdense[i])
    bchain = [bfg[i] + cbd[i][None, :] @ (wfcur[i] + wfstate[i])
              for i in range(L)]
    wc = jnp.concatenate([params["causal"][1], params["causal"][0]],
                         axis=0)                      # [2Q, R]: [cur; past]

    # Per-layer fused output block: one matmul from the gated activation
    # yields [next-gate chain contribution | residual delta | skip
    # contribution]. The last layer has no chain/residual consumer.
    zero_gb = jnp.zeros((DC, 2 * DC))
    zero_d = jnp.zeros((DC, R))
    wabc = jnp.stack([
        jnp.concatenate([
            wgb[i] if i < L - 1 else zero_gb,
            wdense[i] if i < L - 1 else zero_d,
            wskip[i],
        ], axis=1)
        for i in range(L)
    ])                                                # [L, DC, 2DC+R+S]
    # Per-layer fused pre-activation: [x_i ; s_{i+1}] @ [Wfcur; Wfstate].
    wpair = jnp.stack([
        jnp.concatenate([wfcur[i + 1], wfstate[i + 1]], axis=0)
        for i in range(L - 1)
    ]) if L > 1 else jnp.zeros((1, 2 * R, 2 * DC))    # [L-1, 2R, 2DC]
    wfstate0 = wfstate[0]

    packed = {
        # causal folded straight into layer 0's gate: one dependent matmul
        # takes the input one-hots to [fg_0 | x_0]
        "wcc": jnp.concatenate([wc @ wfcur[0], wc], axis=1),  # [2Q, 2DC+R]
        "wfstate0": wfstate0,                        # [R(+M), 2DC]
        "wpair": wpair,                              # [L-1, 2R(+M), 2DC]
        "wabc": wabc,                                # [L, DC, 2DC+R+S]
        # batched path: chain|dense only + one stacked skip matmul at the
        # end (per-layer skip accumulation beats it at B=1, loses at B>1)
        "wab": wabc[:, :, : 2 * DC + R],             # [L, DC, 2DC+R]
        "wskip": jnp.concatenate(wskip, axis=0),     # [L*DC, S]
        "bchain": jnp.stack(bchain),                 # [L, 1|B, 2DC]
        "bdense": jnp.stack(bdense)[:, None, :],     # [L, 1, R]
        "bskip": sum(bskip)[None, :],                # [1, S]
        "post1": params["post1"][0],                 # [S, S]
        "post2": params["post2"][0],                 # [S, Q]
        "b1": (params.get("post1_bias", jnp.zeros((S,))))[None, :],
        "b2": (params.get("post2_bias",
                          jnp.zeros((net.quantization_channels,))))[None, :],
    }
    if net.lc_channels:
        packed["wlcs"] = jnp.stack(wlc)               # [L, M, 2DC]

    # Single-transcendental gate: sigmoid(b) == (1 + tanh(b/2)) / 2, so
    # pre-halving every gate-half column lets the kernel evaluate ONE tanh
    # over [filter|gate] instead of tanh + sigmoid on the serial chain.
    half_gate = jnp.concatenate(
        [jnp.ones((DC,)), jnp.full((DC,), 0.5)])      # [2DC]
    packed["wcc"] = packed["wcc"] * jnp.concatenate([half_gate, jnp.ones((R,))])
    packed["wfstate0"] = packed["wfstate0"] * half_gate
    packed["wpair"] = packed["wpair"] * half_gate
    packed["bchain"] = packed["bchain"] * half_gate
    packed["wabc"] = packed["wabc"] * jnp.concatenate(
        [half_gate, jnp.ones((R + S,))])
    packed["wab"] = packed["wab"] * jnp.concatenate(
        [half_gate, jnp.ones((R,))])
    if net.lc_channels:
        packed["wlcs"] = packed["wlcs"] * half_gate
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), packed)


def _make_kernel(net, batch: int, n_chunks: int, prime_len: int,
                 temperature: float, deterministic: bool, use_lc: bool,
                 dtype=jnp.float32):
    """Builds the sampling kernel. Local conditioning ships as RAW mel rows
    ([LANE, B, M] per chunk, ~100x smaller than per-layer projections) and
    is projected in-kernel by ONE off-chain [B, M] @ [M, L*2DC] matmul per
    step; per-layer contributions are then static lane slices."""
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
    M = net.lc_channels if use_lc else 1   # raw mel rows per chunk

    # Skip path: at B=1 per-layer accumulation from the fused wabc matmul
    # measures faster (it lives in one vreg row); at B>1 gated activations
    # collect in scratch for ONE [B, L*DC] @ [L*DC, S] matmul at the end.
    use_sk = B == 1
    # B=1 latency path additionally precomputes the chunk's Gumbel noise.
    use_noise = B == 1 and not deterministic

    def kernel(seed_ref, forced_ref, lc_ref,
               wcc_ref, wfstate0_ref, wpair_ref, wabc_ref,
               bchain_ref,
               bskip_ref, post1_ref, post2_ref, b1_ref, b2_ref,
               *rest):
        chunk = pl.program_id(0)
        rest = list(rest)
        wskip_ref = None if use_sk else rest.pop(0)        # extra inputs
        wlcs_ref = rest.pop(0) if use_lc else None
        out_ref, ring_ref, oh_cur_ref, ccprev_ref = rest[:4]
        rest = rest[4:]
        noise_ref = rest.pop(0) if use_noise else None
        gated_ref = rest.pop(0) if not use_sk else None
        lcproj_ref = rest.pop(0) if use_lc else None

        q_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
        lane_group_iota = lane_iota // R

        @pl.when(chunk == 0)
        def _init():
            if not deterministic:
                pltpu.prng_seed(seed_ref[0])
            ring_ref[:] = jnp.zeros_like(ring_ref)
            # First free-running input: mid-scale silence
            # (generate_wavenet.py:88); previous input at t=0: zeros (the
            # reference queues start zeroed, wavenet.py:499-531), so its
            # causal past-tap contribution is zero too.
            oh_cur_ref[:] = (q_iota == Q // 2).astype(dtype)
            ccprev_ref[:] = jnp.zeros_like(ccprev_ref)

        if use_lc:
            # Project the whole chunk's mel rows for every layer in one
            # batched pass (50 [LANE*B, M] @ [M, 2DC] matmuls per 128
            # samples); the hot loop then does one row read + add per
            # layer. In-loop per-layer dots measured pathologically slow
            # (scheduling/pressure), though cheap in isolation.
            mel_flat = lc_ref[0].astype(jnp.float32).reshape(LANE * B, M)
            for li in range(L):
                proj = jnp.dot(mel_flat, wlcs_ref[li],
                               preferred_element_type=jnp.float32)
                lcproj_ref[li * LANE:(li + 1) * LANE] = proj.reshape(
                    LANE, B, 2 * DC)

        if noise_ref is not None:
            # Draw the whole chunk's Gumbel noise in one vectorized pass —
            # per step it's then a single dynamic-slice row read instead of
            # two transcendental ops on the sampling path. Temperature is
            # folded into the noise: argmax(logits/T + g) = argmax(logits
            # + g*T), saving the per-step logits multiply.
            bits = pltpu.prng_random_bits((LANE, Q))
            u = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
            ).astype(jnp.float32)
            u = u * (1.0 / (1 << 24)) + 1e-10
            noise_ref[:] = -jnp.log(-jnp.log(u)) * (1.0 / inv_temp)

        def ring_read(li, t):
            """State tap x_li(t - d_li); depends on t only, not the chain.

            Rings are addressed with a dynamic slice on the LEADING dim —
            leading dims are untiled, so this is plain address arithmetic
            (~10ns), unlike sublane/lane dynamic indexing which lowers
            pathologically. (Round 1 used iota-mask selects over the whole
            segment: ~870ns per d=512 layer, the kernel's hidden cost.)
            """
            d = dilations[li]
            nrow = rows_per_layer[li]
            off = int(row_offsets[li])
            slot = jax.lax.bitwise_and(t, d - 1)     # d is 2^k
            if nrow == 1:
                padded = ring_ref[off]               # [B, ring_lanes]
            else:
                padded = ring_ref[pl.ds(off + slot // pack, 1)][0]
            if pack == 1:
                return padded
            if d == 1:
                # only lane-group 0 is ever used when d == 1
                return padded[:, :R]
            return jax.lax.switch(
                slot % pack,
                [lambda p, k=k: p[:, k * R:(k + 1) * R] for k in range(pack)],
                padded)

        def ring_write(li, t, x):
            """Store x_li(t) in layer li's ring (after its read this step)."""
            d = dilations[li]
            nrow = rows_per_layer[li]
            off = int(row_offsets[li])
            slot = jax.lax.bitwise_and(t, d - 1)
            if pack == 1 or d == 1:
                new_row = x if pack == 1 else jnp.pad(
                    x, ((0, 0), (0, LANE - R)))
            else:
                # read-modify-write this slot's lane group within its row
                row = ring_ref[pl.ds(off + slot // pack, 1)][0]
                x_tiled = jnp.concatenate([x] * pack, axis=1)
                new_row = jnp.where(lane_group_iota == slot % pack,
                                    x_tiled, row)
            if nrow == 1:
                ring_ref[off] = new_row
            else:
                ring_ref[pl.ds(off + slot // pack, 1)] = new_row[None]

        def step(i, carry):
            # One-hots, the previous input's causal half, and the output
            # row live in the loop carry (vector registers): no per-step
            # VMEM round trips on the serial path.
            oh_cur, cc_prev, out_vec = carry
            t = chunk * LANE + i

            # --- input one-hot ------------------------------------------
            if prime_len > 0:
                forced_code = jnp.sum(
                    jnp.where(lane_iota == i, forced_ref[0], 0),
                    axis=1, keepdims=True)                         # [B, 1]
                use_forced = (t < prime_len).astype(dtype)
                forced_onehot = (q_iota == forced_code).astype(dtype)
                cur_onehot = (use_forced * forced_onehot
                              + (1.0 - use_forced) * oh_cur)
            else:
                cur_onehot = oh_cur

            # --- dilated stack ------------------------------------------
            # Serial chain: fg_0 via the causal-folded matmul, then per
            # layer ONE dependent matmul + the gate tanh. Everything else
            # (residual updates, state taps, ring traffic, skip
            # accumulation, lc adds) is independent of the newest gated
            # value, so the MXU/VPU pipeline it under the chain's latency.
            # current-tap half on the chain; the past-tap half (cc_prev)
            # was computed last step from what is now the previous one-hot
            cc = cc_prev + jnp.dot(cur_onehot, wcc_ref[:Q],
                                   preferred_element_type=jnp.float32)
            cc_next = jnp.dot(cur_onehot, wcc_ref[Q:],
                              preferred_element_type=jnp.float32)  # off-chain
            x = cc[:, 2 * DC:].astype(dtype)                  # x_0
            s0 = ring_read(0, t)   # MUST read ring 0 before writing it
            pre = (jnp.dot(s0, wfstate0_ref[:],
                           preferred_element_type=jnp.float32)
                   + bchain_ref[0])
            if use_lc:
                pre = pre + lcproj_ref[pl.ds(i, 1)][0]
            ring_write(0, t, x)
            fg = cc[:, :2 * DC] + pre
            sk = jnp.zeros((B, S), jnp.float32)
            for li in range(L):
                # gate halves were pre-scaled by 1/2 in pack_params:
                # tanh(f) * sigmoid(g) == tanh(f) * (1 + tanh(g/2))/2
                th = jnp.tanh(fg)
                gated = (th[:, :DC]
                         * (th[:, DC:] * 0.5 + 0.5)).astype(dtype)
                # one fused matmul: [chain | residual delta | skip contrib]
                abc = jnp.dot(gated, wabc_ref[li],
                              preferred_element_type=jnp.float32)
                if use_sk:
                    sk = sk + abc[:, 2 * DC + R:]
                else:
                    gated_ref[:, li * DC:(li + 1) * DC] = gated
                if li + 1 < L:
                    # off-chain: next layer's input-tap + state-tap terms
                    s = ring_read(li + 1, t)
                    pre = (jnp.dot(jnp.concatenate([x, s], axis=1),
                                   wpair_ref[li],
                                   preferred_element_type=jnp.float32)
                           + bchain_ref[li + 1])
                    if use_lc:
                        pre = pre + lcproj_ref[
                            pl.ds((li + 1) * LANE + i, 1)][0]
                    # the chain: previous gate's folded dense contribution
                    fg = abc[:, :2 * DC] + pre
                    # off-chain bias-free residual update (biases folded
                    # into bchain) feeds ring + later pres
                    x = (x.astype(jnp.float32)
                         + abc[:, 2 * DC:2 * DC + R]).astype(dtype)
                    ring_write(li + 1, t, x)

            if use_sk:
                # skip accumulation finished during the chain
                skips = sk + bskip_ref[:]
            else:
                skips = jnp.dot(gated_ref[:], wskip_ref[:],
                                preferred_element_type=jnp.float32
                                ) + bskip_ref[:]

            h = jnp.maximum(skips, 0.0)
            h = jnp.maximum(
                jnp.dot(h, post1_ref[:], preferred_element_type=jnp.float32)
                + b1_ref[:], 0.0)
            logits = jnp.dot(h, post2_ref[:],
                             preferred_element_type=jnp.float32) + b2_ref[:]

            if deterministic:
                scores = logits
            elif noise_ref is not None:
                scores = logits + noise_ref[pl.ds(i, 1)]      # T-scaled noise
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
            # the emitted integer code (exact min-index tie-break) is only
            # consumed by the output buffer — off the serial chain
            code = jnp.min(jnp.where(scores == best, q_iota, Q), axis=1,
                           keepdims=True)                        # [B, 1]
            out_vec = jnp.where(lane_iota == i, code, out_vec)
            if deterministic:
                oh_next = (q_iota == code).astype(dtype)
            else:
                # scores carry continuous Gumbel noise, so the equality
                # mask IS the argmax one-hot (ties are measure-zero); this
                # skips the code->one-hot round trip on the serial path
                oh_next = (scores == best).astype(dtype)
            return (oh_next, cc_next, out_vec)

        oh_cur0, ccprev0, out0 = jax.lax.fori_loop(
            0, LANE, step,
            (oh_cur_ref[:], ccprev_ref[:], jnp.zeros((B, LANE), jnp.int32)),
            unroll=False)
        oh_cur_ref[:] = oh_cur0      # persist across chunks
        ccprev_ref[:] = ccprev0
        out_ref[0] = out0

    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # seed
            pl.BlockSpec((1, B, LANE), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),                  # forced
            pl.BlockSpec((1, LANE, B, M), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),                  # lc mel
        ] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)                   # weights
            for _ in range((10 if use_sk else 11) + (1 if use_lc else 0))
        ],
        out_specs=pl.BlockSpec((1, B, LANE), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((total_rows_ring, B, ring_lanes), dtype),  # rings
            pltpu.VMEM((B, Q), dtype),                    # current one-hot
            pltpu.VMEM((B, 2 * DC + R), jnp.float32),     # prev causal half
        ] + ([pltpu.VMEM((LANE, Q), jnp.float32)]        # chunk Gumbel noise
             if use_noise else [])
          + ([pltpu.VMEM((B, L * DC), dtype)]            # gated (lanes)
             if not use_sk else [])
          + ([pltpu.VMEM((L * LANE, B, 2 * DC), jnp.float32)]  # lc chunk
             if use_lc else []),
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
        bias_keys = {"bchain", "bdense", "bskip", "b1", "b2"}
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
                # the per-chunk lc projection scratch can exceed the 16MB
                # default scoped-vmem budget at larger batches
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )
            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def __call__(self, n_samples: int, seed: int = 0, batch: int = 1,
                 seed_codes: Optional[jnp.ndarray] = None,
                 lc: Optional[jnp.ndarray] = None,
                 temperature: float = 1.0,
                 deterministic: bool = False) -> jnp.ndarray:
        """Generate mu-law codes [batch, n_samples].

        ``lc``: per-sample local conditioning [batch, prime_len + n_samples,
        M]. ``deterministic=True`` replaces Gumbel sampling with argmax
        (used for equivalence tests against the scan generator).
        """
        use_lc = lc is not None
        if use_lc and not self.net.lc_channels:
            raise ValueError("model has lc_channels=0; cannot condition")
        if self.net.lc_channels and not use_lc:
            raise ValueError("locally-conditioned model needs lc=")
        if use_lc and lc.shape[0] != batch:
            raise ValueError(
                f"lc batch {lc.shape[0]} != generation batch {batch}")

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

        if use_lc:
            # Raw per-stream mel rows, chunked; the kernel projects them
            # with one off-chain matmul per step (in-kernel wlc).
            lc = jnp.asarray(lc, jnp.float32)               # [B, T, M]
            if lc.shape[1] < n_chunks * LANE:
                lc = jnp.pad(
                    lc, ((0, 0), (0, n_chunks * LANE - lc.shape[1]), (0, 0)))
            lc_mel = jnp.transpose(
                lc[:, : n_chunks * LANE], (1, 0, 2)).reshape(
                    n_chunks, LANE, batch, self.net.lc_channels)
        else:
            lc_mel = jnp.zeros((n_chunks, LANE, batch, 1), jnp.float32)

        p = self.packed
        weight_args = [p["wcc"], p["wfstate0"], p["wpair"],
                       p["wabc"] if batch == 1 else p["wab"],
                       p["bchain"],
                       p["bskip"], p["post1"], p["post2"], p["b1"], p["b2"]]
        if batch != 1:
            weight_args.append(p["wskip"])
        if use_lc:
            weight_args.append(p["wlcs"])
        out = fn(jnp.asarray([seed], jnp.int32), forced, lc_mel,
                 *weight_args)
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
