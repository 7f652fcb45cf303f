"""Pallas TPU kernel: WaveNet autoregressive sampling, fully VMEM-resident.

The generation loop runs inside ONE kernel launch as a grid over 128-sample
chunks: weights and the dilation ring buffers stay resident in VMEM across
the whole utterance (scratch persists over the sequential TPU grid), while
the per-chunk inputs/outputs (forced priming codes, local-conditioning mel
rows, emitted codes) are double-buffered through the Pallas pipeline. This
replaces the reference's one-session-call-per-sample queue generator
(reference: generate_wavenet.py:109-122, wavenet.py:487-557).

Kernel design rules (measured on v5e; the serial budget is DEPENDENT-OP
LATENCY — a dependent small matmul costs ~85ns and every VPU op on the
dependence chain adds ~25-30ns, while INDEPENDENT work pipelines
underneath for free):

- The serial chain is THREE VPU ops + ONE matmul per layer:
  ``th = tanh(out)`` then, in parallel, ``m = th*c1 + c2`` (the sigmoid
  half via the tanh identity) and ``r = roll(th, -DC)`` (aligning the
  filter half), then one fused-multiply-add ``v = r*m + xs1`` builds the
  ENTIRE next matmul input, and ``out = v @ W`` closes the layer.
- Everything else rides inside that one [128, 128+S] matmul. With
  ``v = [gated | x_prev | s | 1]``, W's row blocks are
  [chain block wdense@wfcur | wdense | wskip] for the gated rows,
  [wfcur | I] for the residual rows (the residual UPDATE is the identity
  block — no separate add), [wfstate | 0] for the state-tap rows, and the
  accumulated layer bias in the constant-1 row. The former per-layer
  pre-dot, pre-add, and residual update all disappear from the program.
- Gate columns are laid out [g | f] with the tanh-identity 1/2 folded into
  the g half (sigmoid(b) == (1 + tanh(b/2))/2), so ``m`` needs no roll —
  sigma(g) lands at lanes 0:DC where the product happens.
- Ring rows are stored in the matmul-output layout ([.., x@2DC:2DC+R,
  1@2DC+R]) so a RAW ring row IS the [s, 1] tail of a future ``v``:
  ``xs1 = where(x-lanes, roll(out), ring_row)`` is one blend. Dynamic
  indexing on the LEADING (untiled) dim of a VMEM ref is plain address
  arithmetic (~10ns); rings are read/written with pl.ds row slices.
- Cross-step state (one-hots, the carried causal half, the output row)
  rides in fori_loop carries (vector registers); the causal layer is
  folded into the input one-hot matmul (wcc), split so the past-tap half
  is computed one step early and carried.
- Gumbel noise for a whole chunk is drawn in one vectorized pass with the
  temperature folded in (argmax(l/T + g) == argmax(l + gT)); per step the
  sampling path is one row read + add + max/min reduction.
- Global conditioning is constant over the utterance: at B=1 it folds
  into the shared bias row of W (zero chain cost); at B>1 it becomes a
  per-stream per-layer side constant summed off-chain into the lc add.
  Local conditioning streams as RAW mel rows, projected for the whole
  chunk in one batched pass per layer; the only serial cost is ONE add
  per layer. At B=1 the rows are stored LANE-wide (no per-step pad, the
  fastest measured variant); batched runs store them narrow ([B, 2DC])
  and pad off-chain, trading ~50ns/layer of off-chain work for 2x less
  scratch. (In-loop per-layer lc dots measured slower than chunk
  projection at every batch — matmul issue pressure.) NOTE when
  benchmarking lc on this testbed: ship the mel to the device FIRST —
  a host-resident lc array is transferred through the axon relay at
  ~40MB/s and dominates wall-clock, masquerading as kernel time.

Batch lives on the sublane dimension: generating B streams costs barely
more per step than one (the chain is latency-bound), so aggregate
throughput scales ~linearly with batch up to the sublane tile.

The latency model above is validated end-to-end by a layer sweep
(``scripts/kernel_lab.py --ceiling``, ``docs/pallas_ceiling.json``,
BASELINE.md "Single-stream sampling"): fitted per-layer serial cost
160.45 ns == the 85 + 3x25 ns dependent-op floor, per-step fixed cost
1.02 us, and the full 50-layer kernel measures 9.19 us/sample — 98% of
the optimistic latency-bound ceiling. Single-stream speed-of-light for
this architecture on this chip.
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
    """Restructure WaveNet params into the kernel's fused layout.

    Returns a dict of f32 arrays:
      wcc   [2Q, 128]      one-hot -> [fg_0(g|f) | x_0 | 0] (cur; past taps)
      wpre0 [128, 128]     ring-row-0 -> layer-0 state-tap + bias
      ws    [L, 128, 128+S] per-layer fused matmul (see module docstring)
      gcside [L, B, 2DC]   per-stream per-layer gate bias (only when
                           gc_ids has >1 entries)
      bskip/post1/post2/b1/b2: output network.

    When ``gc_ids`` has exactly one entry the speaker bias folds into the
    shared bias row of ``ws``/``wpre0`` — zero serial cost at B=1.
    """
    R, DC, S = net.residual_channels, net.dilation_channels, net.skip_channels
    Q = net.quantization_channels
    if 2 * DC + R + 1 > LANE or DC + 2 * R + 1 > LANE:
        raise NotImplementedError(
            f"residual_channels={R}/dilation_channels={DC} too wide for the "
            f"{LANE}-lane fused layout")
    gc_vecs = None
    if gc_ids is not None and net.gc_channels:
        gc_vecs = jnp.take(params["gc_embedding"], gc_ids, axis=0)  # [B, C]
    fold_gc = gc_vecs is not None and gc_vecs.shape[0] == 1

    def gf(f_blk, g_blk):
        # gate columns in [g|f] order with the tanh-identity 1/2 folded
        # into the g half: sigmoid(b) == (1 + tanh(b/2)) / 2
        return jnp.concatenate([0.5 * g_blk, f_blk], axis=-1)   # [.., 2DC]

    wfcur, wfstate, bshared, bgc = [], [], [], []
    wdense, bdense, wskip, wlc = [], [], [], []
    for lp in params["layers"]:
        f, g = lp["filter"], lp["gate"]          # [2, R, DC]; tap 0 = past
        wfcur.append(gf(f[1], g[1]))             # [R, 2DC] (g|f)
        wfstate.append(gf(f[0], g[0]))           # [R, 2DC]
        b = jnp.zeros((1, 2 * DC))
        if net.use_biases:
            b = b + gf(lp["filter_bias"][None], lp["gate_bias"][None])
        bg = jnp.zeros((1, 2 * DC))
        if gc_vecs is not None:
            bg = gf(gc_vecs @ lp["gc_filter"][0], gc_vecs @ lp["gc_gate"][0])
        if fold_gc:
            b, bg = b + bg, jnp.zeros((1, 2 * DC))
        bshared.append(b)
        bgc.append(bg)
        wdense.append(lp["dense"][0])            # [DC, R]
        bdense.append(lp.get("dense_bias", jnp.zeros((R,))))
        wskip.append(lp["skip"][0])              # [DC, S]
        if net.lc_channels:
            wlc.append(gf(lp["lc_filter"][0], lp["lc_gate"][0]))  # [M, 2DC]

    L = len(wfcur)
    # The residual is tracked WITHOUT its accumulated dense biases (the
    # rings store the same bias-free values); the cumulative bias
    # cbd_i = sum_{j<i} bdense_j is constant per layer, so its current-tap
    # and state-tap gate contributions fold into the shared bias row.
    cbd = [jnp.zeros_like(bdense[0])]
    for i in range(L - 1):
        cbd.append(cbd[-1] + bdense[i])
    bchain = [bshared[i] + cbd[i][None, :] @ (wfcur[i] + wfstate[i])
              for i in range(L)]
    bskip = [lp.get("skip_bias", jnp.zeros((S,))) for lp in params["layers"]]

    wc = jnp.concatenate([params["causal"][1], params["causal"][0]],
                         axis=0)                 # [2Q, R]: [cur; past]
    wcc = jnp.concatenate([
        wc @ wfcur[0], wc, jnp.zeros((2 * Q, LANE - 2 * DC - R))], axis=1)

    # Wpre0: ring-row-0 layout [.., s_0@2DC:2DC+R, 1@2DC+R] -> fg_0 terms
    wpre0 = jnp.zeros((LANE, LANE))
    wpre0 = wpre0.at[2 * DC: 2 * DC + R, : 2 * DC].set(wfstate[0])
    wpre0 = wpre0.at[2 * DC + R, : 2 * DC].set(bchain[0][0])

    # W_i for i = 1..L: rows follow v = [gated_{i-1}(0:DC) |
    # x_{i-1}(DC:DC+R) | s_i(DC+R:DC+2R) | 1(DC+2R)]; cols are
    # [fg_i(g|f, 0:2DC) | x_i(2DC:2DC+R) | 0 | skip_{i-1}(128:)]
    Ws = []
    for i in range(1, L + 1):
        W = jnp.zeros((LANE, LANE + S))
        W = W.at[:DC, LANE:].set(wskip[i - 1])
        if i < L:
            W = W.at[:DC, : 2 * DC].set(wdense[i - 1] @ wfcur[i])
            W = W.at[:DC, 2 * DC: 2 * DC + R].set(wdense[i - 1])
            W = W.at[DC: DC + R, : 2 * DC].set(wfcur[i])
            W = W.at[DC: DC + R, 2 * DC: 2 * DC + R].set(jnp.eye(R))
            W = W.at[DC + R: DC + 2 * R, : 2 * DC].set(wfstate[i])
            W = W.at[DC + 2 * R, : 2 * DC].set(bchain[i][0])
        Ws.append(W)

    packed = {
        "wcc": wcc,                              # [2Q, 128]
        "wpre0": wpre0,                          # [128, 128]
        "ws": jnp.stack(Ws),                     # [L, 128, 128+S]
        # batched path: the skip block of ws is DC real rows in a 128-row
        # store (over 75% zeros) — splitting it keeps the per-layer matmul
        # at [128, 128] and computes all skips in ONE [B, L*DC] @
        # [L*DC, S] matmul at step end, saving ~10MB of VMEM
        "ws_chain": jnp.stack(Ws)[:, :, :LANE],  # [L, 128, 128]
        "wskip": jnp.concatenate(wskip, axis=0),  # [L*DC, S]
        "bskip": sum(bskip)[None, :],            # [1, S]
        "post1": params["post1"][0],             # [S, S]
        "post2": params["post2"][0],             # [S, Q]
        "b1": (params.get("post1_bias", jnp.zeros((S,))))[None, :],
        "b2": (params.get("post2_bias", jnp.zeros((Q,))))[None, :],
    }
    if gc_vecs is not None and not fold_gc:
        # per-stream per-layer side constant, widened to the out layout
        B = gc_vecs.shape[0]
        packed["gcside"] = jnp.stack(bgc)        # [L, B, 2DC]
    if net.lc_channels:
        packed["wlcs"] = jnp.stack(wlc)          # [L, M, 2DC]
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), packed)


def _make_kernel(net, batch: int, n_chunks: int, prime_len: int,
                 temperature: float, deterministic: bool, use_lc: bool,
                 use_gcside: bool, dtype=jnp.float32, carry_io: bool = False):
    """``carry_io=True`` builds the STREAMING form: the cross-step state
    (dilation rings, current one-hot, carried causal half) enters as
    inputs and leaves as outputs, and ring slots are addressed by the
    ABSOLUTE sample index ``t0 + chunk*LANE + i`` (t0 from SMEM), so
    consecutive launches continue one generation exactly. The state
    "outputs" double as the working buffers (constant index_map => the
    buffer persists across the sequential grid and is flushed once), so
    the streaming kernel body is the latency-optimized body unchanged —
    zero extra on-chain cost. Priming is not supported with carry_io."""
    if carry_io and prime_len:
        raise ValueError("carry_io kernels do not support priming")
    L = len(net.dilations)
    dilations = list(net.dilations)
    R, DC, S, Q = (net.residual_channels, net.dilation_channels,
                   net.skip_channels, net.quantization_channels)
    rows_per_layer = [max(1, d) for d in dilations]
    row_offsets = np.concatenate([[0], np.cumsum(rows_per_layer)[:-1]]).astype(int)
    total_rows_ring = int(sum(rows_per_layer))
    inv_temp = 1.0 / max(temperature, 1e-6)
    B = batch
    M = net.lc_channels if use_lc else 1
    # B=1 latency path pre-draws the chunk's Gumbel noise.
    use_noise = B == 1 and not deterministic
    # B=1 keeps the skip block fused into the layer matmul (free for
    # latency); batched runs split it out to keep VMEM under budget —
    # gated activations collect in a small scratch for ONE
    # [B, L*DC] @ [L*DC, S] matmul at step end.
    fuse_skip = B == 1
    # B=1 affords LANE-wide lc rows (no per-step pad); batched runs store
    # them narrow ([B, 2DC]) to stay inside VMEM.
    wide_lc = use_lc and B == 1
    # ring rows are in the out layout; when R != DC the write is rolled so
    # the s/1 tail still lands on v's lanes (free when R == DC)
    ring_shift = (R - DC) % LANE

    def kernel(seed_ref, *args):
        rest = list(args)
        t0_ref = rest.pop(0) if carry_io else None
        forced_ref, lc_ref = rest.pop(0), rest.pop(0)
        (wcc_ref, wpre0_ref, ws_ref, bskip_ref, post1_ref, post2_ref,
         b1_ref, b2_ref) = (rest.pop(0) for _ in range(8))
        chunk = pl.program_id(0)
        gcside_ref = rest.pop(0) if use_gcside else None
        wlcs_ref = rest.pop(0) if use_lc else None
        wskip_ref = rest.pop(0) if not fuse_skip else None
        if carry_io:
            rings_in_ref, oh_in_ref, ccprev_in_ref = (rest.pop(0)
                                                      for _ in range(3))
        out_ref, ring_ref, oh_cur_ref, ccprev_ref = rest[:4]
        rest = rest[4:]
        noise_ref = rest.pop(0) if use_noise else None
        lcproj_ref = rest.pop(0) if use_lc else None
        gated_ref = rest.pop(0) if not fuse_skip else None
        t_base = t0_ref[0] if carry_io else 0

        q_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
        # e_one: the constant-1 marker lane of a ring row (out layout,
        # position 2DC+R, which is v position DC+2R after ring_shift)
        e_one = (lane_iota == 2 * DC + R).astype(jnp.float32)
        xmask = jnp.logical_and(lane_iota >= 2 * DC,
                                lane_iota < 2 * DC + R).astype(jnp.float32)
        c1 = jnp.where(lane_iota < DC, 0.5, 0.0)
        c2 = jnp.where(lane_iota < DC, 0.5, 0.0)
        xs_mask = jnp.logical_and(lane_iota >= DC, lane_iota < DC + R)

        def roll_if(xv, sh):
            return xv if sh % LANE == 0 else pltpu.roll(xv, sh % LANE, 1)

        @pl.when(chunk == 0)
        def _init():
            if not deterministic:
                pltpu.prng_seed(seed_ref[0])
            if carry_io:
                # resume: state buffers are outputs; load the carried-in
                # state once, then work in place for the whole launch
                ring_ref[:] = rings_in_ref[:]
                oh_cur_ref[:] = oh_in_ref[:]
                ccprev_ref[:] = ccprev_in_ref[:]
            else:
                # rings start zeroed (the reference queues start zeroed,
                # wavenet.py:499-531) with the constant-1 marker set
                ring_ref[:] = jnp.zeros_like(ring_ref) + roll_if(e_one,
                                                                 ring_shift)
                oh_cur_ref[:] = (q_iota == Q // 2).astype(dtype)
                ccprev_ref[:] = jnp.zeros_like(ccprev_ref)

        if use_lc:
            # Project the whole chunk's mel rows for every layer in one
            # batched pass (in-loop per-layer dots measure pathologically
            # slow); rows stay NARROW ([B, 2DC]) so the scratch fits VMEM
            # at batch 8 — the widening to 128 lanes happens per step as
            # an off-chain pad. Per-stream gc folds in here when present.
            mel_flat = lc_ref[0].astype(jnp.float32).reshape(LANE * B, M)
            for li in range(L):
                proj = jnp.dot(mel_flat, wlcs_ref[li],
                               preferred_element_type=jnp.float32)
                proj = proj.reshape(LANE, B, 2 * DC)
                if use_gcside:
                    proj = proj + gcside_ref[li][None]
                if wide_lc:
                    proj = jnp.pad(proj,
                                   ((0, 0), (0, 0), (0, LANE - 2 * DC)))
                lcproj_ref[li * LANE:(li + 1) * LANE] = proj

        if noise_ref is not None:
            # Whole-chunk Gumbel noise with the temperature folded in:
            # argmax(logits/T + g) == argmax(logits + g*T)
            bits = pltpu.prng_random_bits((LANE, Q))
            u = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
            ).astype(jnp.float32)
            u = u * (1.0 / (1 << 24)) + 1e-10
            noise_ref[:] = -jnp.log(-jnp.log(u)) * (1.0 / inv_temp)

        def ring_read(li, t):
            """[B, LANE] row: layer li's state tap x_li(t - d_li) + marker."""
            d = dilations[li]
            off = int(row_offsets[li])
            if d == 1:
                return ring_ref[pl.ds(off, 1)][0]
            slot = jax.lax.bitwise_and(t, d - 1)     # d is 2^k
            return ring_ref[pl.ds(off + slot, 1)][0]

        def ring_write(li, t, row):
            d = dilations[li]
            off = int(row_offsets[li])
            if d == 1:
                ring_ref[pl.ds(off, 1)] = row[None]
            else:
                slot = jax.lax.bitwise_and(t, d - 1)
                ring_ref[pl.ds(off + slot, 1)] = row[None]

        def side_add(out, li, i):
            """Conditioning add: ONE op on the chain (compiled out when
            absent); the row read and its widening to 128 lanes are
            off-chain (they depend only on the step index)."""
            if use_lc:
                row = lcproj_ref[pl.ds(li * LANE + i, 1)][0]
                if wide_lc:
                    return out + row
            elif use_gcside:
                row = gcside_ref[li]
            else:
                return out
            return out + jnp.pad(row, ((0, 0), (0, LANE - 2 * DC)))

        def step(i, carry):
            # One-hots, the previous input's causal half, and the output
            # row live in the loop carry (vector registers): no per-step
            # VMEM round trips on the serial path.
            oh_cur, cc_prev, out_vec = carry
            t = t_base + chunk * LANE + i

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

            # --- causal entry: out_0 = cc + pre0 ------------------------
            # current-tap half on the chain; the past-tap half (cc_prev)
            # was computed last step from what is now the previous one-hot
            cc = cc_prev + jnp.dot(cur_onehot, wcc_ref[:Q],
                                   preferred_element_type=jnp.float32)
            cc_next = jnp.dot(cur_onehot, wcc_ref[Q:],
                              preferred_element_type=jnp.float32)  # off-chain
            r0 = roll_if(ring_read(0, t), -ring_shift)
            pre0 = jnp.dot(r0, wpre0_ref[:],
                           preferred_element_type=jnp.float32)     # off-chain
            # fg: the [B, 128] gate-input row. The lc/gc side rows are
            # zero on the x lanes, so the ring write and the x extraction
            # can use the conditioned value unchanged.
            fg = side_add(cc + pre0, 0, i)
            ring_write(0, t, roll_if(fg * xmask, ring_shift)
                       + roll_if(e_one, ring_shift))
            sk = jnp.zeros((B, S), jnp.float32)
            for li in range(1, L + 1):
                # --- the serial chain: tanh -> {m || r} -> fma -> matmul
                th = jnp.tanh(fg)
                m = th * c1 + c2                  # sigma(g) at lanes 0:DC
                r = pltpu.roll(th, LANE - DC, 1)  # th_f    to lanes 0:DC
                if li < L:
                    ro = pltpu.roll(fg, LANE - DC, 1)
                    s1 = ring_read(li, t)         # [.., s, 1] tail of v
                    xs1 = jnp.where(xs_mask, ro, s1)
                    v = (r * m + xs1).astype(dtype)
                else:
                    v = (r * m).astype(dtype)     # flush: gated_{L-1} only
                if not fuse_skip:
                    # off-chain: collect gated_{li-1} for the step-end
                    # stacked skip matmul
                    gated_ref[:, (li - 1) * DC: li * DC] = v[:, :DC]
                if fuse_skip or li < L:
                    out = jnp.dot(v, ws_ref[li - 1],
                                  preferred_element_type=jnp.float32)
                if fuse_skip:
                    sk = sk + out[:, LANE:]       # off-chain accumulation
                if li < L:
                    fg = side_add(out[:, :LANE], li, i)
                    ring_write(li, t, roll_if(fg * xmask, ring_shift)
                               + roll_if(e_one, ring_shift))

            if fuse_skip:
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
                # uint32->f32 unsupported in Mosaic; >>8 fits in int32
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
            # derive the next input one-hot from the SAME min-index
            # tie-break as the emitted code: the Gumbel noise is quantized
            # to 24-bit steps, so (scores == best) can be multi-hot on an
            # exact float tie, which would feed the sum of two code
            # embeddings into the causal matmul
            oh_next = (q_iota == code).astype(dtype)
            return (oh_next, cc_next, out_vec)

        oh_cur0, ccprev0, out0 = jax.lax.fori_loop(
            0, LANE, step,
            (oh_cur_ref[:], ccprev_ref[:], jnp.zeros((B, LANE), jnp.int32)),
            unroll=False)
        oh_cur_ref[:] = oh_cur0      # persist across chunks
        ccprev_ref[:] = ccprev0
        out_ref[0] = out0

    n_weights = (8 + (1 if use_gcside else 0) + (1 if use_lc else 0)
                 + (0 if fuse_skip else 1))
    state_shapes = [                       # carried generation state
        ((total_rows_ring, B, LANE), jnp.float32),   # dilation rings
        ((B, Q), dtype),                             # current one-hot
        ((B, LANE), jnp.float32),                    # prev causal half
    ]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)     # unblocked: persists
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # seed
        ] + ([pl.BlockSpec(memory_space=pltpu.SMEM)]            # t0
             if carry_io else []) + [
            pl.BlockSpec((1, B, LANE), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),              # forced
            pl.BlockSpec((1, LANE, B, M), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # lc mel
        ] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)
        ] + ([full] * 3 if carry_io else []),        # carried state in
        out_specs=(pl.BlockSpec((1, B, LANE), lambda c: (c, 0, 0),
                                memory_space=pltpu.VMEM),
                   # state buffers ride as outputs in streaming form: the
                   # constant index_map keeps them VMEM-resident across the
                   # sequential grid and flushes them once at the end
                   full, full, full) if carry_io
        else pl.BlockSpec((1, B, LANE), lambda c: (c, 0, 0),
                          memory_space=pltpu.VMEM),
        scratch_shapes=(
            [] if carry_io else
            [pltpu.VMEM(s, d) for s, d in state_shapes]
        ) + ([pltpu.VMEM((LANE, Q), jnp.float32)]    # chunk Gumbel noise
             if use_noise else [])
          + ([pltpu.VMEM((L * LANE, B,
                          LANE if wide_lc else 2 * DC), jnp.float32)]
             if use_lc else [])
          + ([] if fuse_skip else [pltpu.VMEM((B, L * DC), dtype)]),
    )
    codes_shape = jax.ShapeDtypeStruct((n_chunks, B, LANE), jnp.int32)
    out_shape = ((codes_shape,
                  *(jax.ShapeDtypeStruct(s, d) for s, d in state_shapes))
                 if carry_io else codes_shape)
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
        self.packed = jax.tree_util.tree_map(jnp.asarray,
                                             pack_params(net, params, gc_ids))
        self._fns: dict = {}

    def _get_fn(self, batch: int, n_chunks: int, prime_len: int,
                temperature: float, deterministic: bool, use_lc: bool,
                carry_io: bool = False):
        key = (batch, n_chunks, prime_len, temperature, deterministic,
               use_lc, carry_io)
        if key not in self._fns:
            kernel, grid_spec, out_shape = _make_kernel(
                self.net, batch, n_chunks, prime_len, temperature,
                deterministic, use_lc, "gcside" in self.packed,
                dtype=self.dtype, carry_io=carry_io)
            fn = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=self.interpret,
                # rings + per-layer weights + lc rows can exceed the 16MB
                # default scoped-vmem budget at larger batches
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
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
        # match the scan generator's contract: temperature <= 0 is argmax
        deterministic = deterministic or temperature <= 0.0

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
            # with one off-chain matmul per layer per chunk.
            lc = jnp.asarray(lc, jnp.float32)               # [B, T, M]
            if lc.shape[1] < n_chunks * LANE:
                lc = jnp.pad(
                    lc, ((0, 0), (0, n_chunks * LANE - lc.shape[1]), (0, 0)))
            lc_mel = jnp.transpose(
                lc[:, : n_chunks * LANE], (1, 0, 2)).reshape(
                    n_chunks, LANE, batch, self.net.lc_channels)
        else:
            lc_mel = jnp.zeros((n_chunks, LANE, batch, 1), jnp.float32)

        out = fn(jnp.asarray([seed], jnp.int32), forced, lc_mel,
                 *self._weight_args(batch, use_lc))
        codes = jnp.transpose(out, (1, 0, 2)).reshape(batch, n_chunks * LANE)
        # codes[:, t] is the prediction for time t+1 (same convention as the
        # scan generator): the first free sample sits at prime_len-1.
        start = max(prime_len - 1, 0)
        return codes[:, start: start + n_samples]

    def _weight_args(self, batch: int, use_lc: bool):
        p = self.packed
        # batch=1 gets the skip block fused into the layer matmul; batched
        # runs get the chain-only matrices plus the stacked skip matmul
        args = [p["wcc"], p["wpre0"],
                p["ws"] if batch == 1 else p["ws_chain"],
                p["bskip"], p["post1"], p["post2"], p["b1"], p["b2"]]
        if "gcside" in p:
            args.append(p["gcside"])
        if use_lc:
            args.append(p["wlcs"])
        if batch != 1:
            args.append(p["wskip"])
        return args

    # -- chunked (streaming) generation: carried state across launches ------

    def chunk_carry0(self, batch: int = 1):
        """Initial carry for :meth:`generate_chunk`: ``(t0, rings, one_hot,
        causal_half)`` — the exact VMEM state the one-shot kernel builds at
        chunk 0 (zeroed rings with the constant-1 marker at v lane DC+2R,
        mid-scale one-hot, zero causal half)."""
        net = self.net
        R, DC, Q = (net.residual_channels, net.dilation_channels,
                    net.quantization_channels)
        rows = int(sum(max(1, d) for d in net.dilations))
        rings = np.zeros((rows, batch, LANE), np.float32)
        rings[:, :, (DC + 2 * R) % LANE] = 1.0
        oh = jnp.zeros((batch, Q), self.dtype).at[:, Q // 2].set(1.0)
        return (0, jnp.asarray(rings), oh,
                jnp.zeros((batch, LANE), jnp.float32))

    def generate_chunk(self, carry, n_samples: int, seed: int = 0,
                       lc: Optional[jnp.ndarray] = None,
                       temperature: float = 1.0,
                       deterministic: bool = False, final: bool = False):
        """Continue a generation: run ``n_samples`` steps from ``carry``
        and return ``(codes [B, n_samples], new_carry)``.

        The kernel always advances in LANE-sample chunks, so ``n_samples``
        must be a multiple of LANE — except with ``final=True``, where the
        launch rounds UP to the next multiple (overshoot steps see the
        edge-held last lc row), the overshoot codes are discarded, and the
        returned carry is None (the stream has ended; the state has
        advanced past ``n_samples``). Concatenated aligned chunks followed
        by one final chunk reproduce the one-shot :meth:`__call__` exactly
        at ``deterministic=True`` (tested). At temperature>0 each launch
        draws fresh Gumbel noise from ``seed`` — pass a per-launch seed
        (e.g. ``base_seed + t0``) for non-repeating sampling noise.
        """
        t0, rings, oh, ccprev = carry
        batch = oh.shape[0]
        # match the scan generator's contract: temperature <= 0 is argmax
        deterministic = deterministic or temperature <= 0.0
        if n_samples % LANE and not final:
            raise ValueError(
                f"chunked generation advances in multiples of {LANE} "
                f"samples (got {n_samples}); pass final=True for the last "
                "partial chunk")
        use_lc = lc is not None
        if use_lc and not self.net.lc_channels:
            raise ValueError("model has lc_channels=0; cannot condition")
        if self.net.lc_channels and not use_lc:
            raise ValueError("locally-conditioned model needs lc=")
        n_chunks = _round_up(max(n_samples, 1), LANE) // LANE
        fn = self._get_fn(batch, n_chunks, 0, temperature, deterministic,
                          use_lc, carry_io=True)
        forced = jnp.zeros((n_chunks, batch, LANE), jnp.int32)
        if use_lc:
            lc = jnp.asarray(lc, jnp.float32)
            if lc.shape[1] < n_chunks * LANE:   # final-chunk edge hold
                lc = jnp.concatenate(
                    [lc, jnp.repeat(lc[:, -1:],
                                    n_chunks * LANE - lc.shape[1], axis=1)],
                    axis=1)
            lc_mel = jnp.transpose(
                lc[:, : n_chunks * LANE], (1, 0, 2)).reshape(
                    n_chunks, LANE, batch, self.net.lc_channels)
        else:
            lc_mel = jnp.zeros((n_chunks, LANE, batch, 1), jnp.float32)
        codes, rings, oh, ccprev = fn(
            jnp.asarray([seed], jnp.int32), jnp.asarray([t0], jnp.int32),
            forced, lc_mel, *self._weight_args(batch, use_lc),
            rings, oh, ccprev)
        codes = jnp.transpose(codes, (1, 0, 2)).reshape(batch,
                                                        n_chunks * LANE)
        if final:
            return codes[:, :n_samples], None
        return codes, (int(t0) + n_chunks * LANE, rings, oh, ccprev)


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
