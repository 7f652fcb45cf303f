#!/usr/bin/env python
"""Benchmark harness: prints one JSON line per metric (headline first).

Headline: Tacotron-2 training throughput in mel frames/sec/chip on the
default backend (the real TPU when available). Baseline target: 10,000
frames/sec/chip on v5e (BASELINE.md); ``vs_baseline`` is value/10000.

Also emitted by default: MFU (XLA cost-analysis FLOPs / step time / chip
peak), sec/step, WaveNet TRAINING throughput, and — on TPU hosts only
(the Pallas kernel does not lower on CPU) — the WaveNet Pallas sampling
rates (single-stream and batch-8 aggregate; target 5x real time per
BASELINE.md) plus the mel-conditioned vocoder rate and the Tacotron-2
text->wav serving latency at the full decode budget. Every record
carries the active matmul precision so the numbers are interpretable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Peak dense-matmul throughput per chip (FLOP/s) by device kind, bf16.
# v5e: 197 TFLOP/s bf16 (v5p: 459, v4: 275). CPU fallback is a nominal
# figure so MFU never divides by zero off-TPU.
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
}


def _chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_FLOPS.items():
        if kind.startswith(name):
            return peak
    return 1e12


def bench_taco2_train(batch_size: int = 32, t_in: int = 160, t_out: int = 400,
                      steps: int = 10, precision: str = "bfloat16",
                      hparams: str = ""):
    """Returns (frames/sec/chip, sec_per_step, mfu)."""
    # Training default: single-pass bf16 MXU matmuls (~2x over fp32 passes).
    jax.config.update("jax_default_matmul_precision", precision)
    import nspeech_tpu.config as config
    from nspeech_tpu.data.feeder import Batch
    from nspeech_tpu.models import create_model
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_tacotron_train_step
    from nspeech_tpu.train.runner import pick_mesh

    cfg = config.load_config("taco2")
    cfg.batch_size = batch_size
    # Experiment overrides (e.g. outputs_per_step=3 for the MFU-vs-r
    # recurrence-ceiling sweep). The frame budget stays a multiple of r
    # like the feeder guarantees.
    cfg.parse(hparams)
    r = int(cfg.outputs_per_step)
    t_out = ((t_out + r - 1) // r) * r
    model = create_model("taco2", cfg)
    tx, schedule = make_optimizer(cfg, "taco2")
    mesh = pick_mesh(batch_size)
    step_fn = build_tacotron_train_step(model, tx, mesh=mesh, schedule=schedule)
    state = create_state(model, tx, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = Batch(
        inputs=jnp.asarray(rng.integers(2, 60, (batch_size, t_in)), jnp.int32),
        input_lengths=jnp.asarray([t_in] * batch_size, jnp.int32),
        speaker_ids=jnp.zeros((batch_size,), jnp.int32),
        mel_targets=jnp.asarray(rng.random((batch_size, t_out, cfg.num_mels)),
                                jnp.float32),
        linear_targets=jnp.asarray(rng.random((batch_size, t_out, cfg.num_freq)),
                                   jnp.float32),
        audio=jnp.zeros((batch_size, 16), jnp.float32),
    )
    if mesh is not None:
        from nspeech_tpu.parallel import shard_batch

        batch = shard_batch(batch, mesh)

    # Whole-step FLOPs (fwd+bwd+Adam) from XLA's own cost model, for MFU.
    # The AOT-compiled executable is then REUSED for the timed loop: a
    # manual lower().compile() does not populate jit's internal dispatch
    # cache, so calling step_fn afterwards would load the same (cached)
    # multi-hundred-MB executable through the relay a second time —
    # measured ~45s of pure deserialize+transfer per duplicate load.
    step_flops = None
    try:
        _phase("  taco2: lowering")
        lowered = step_fn.lower(state, batch, jax.random.PRNGKey(9))
        _phase("  taco2: compiling (or persistent-cache load)")
        compiled = lowered.compile()
        _phase("  taco2: compiled")
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        step_flops = float(analysis["flops"])
        step_fn = compiled
    except Exception:
        pass

    key = jax.random.PRNGKey(1)
    # Warmup: compile + pipeline spin-up. The scalar readback (float()) is
    # the sync point — block_until_ready is not reliable on relayed
    # backends.
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, 100 + i))
        float(metrics["loss"])
    _phase("  taco2: warm, timing steps")

    # Sustained rate: dispatch a CHAIN of steps and sync ONCE at the end,
    # exactly like a real training loop (which reads metrics every k
    # steps, not every step). Timing each step individually would charge
    # every step a full host<->device round trip — ~40ms through this
    # testbed's relay, independent of batch and length, which is harness
    # overhead, not framework time.
    def chain_time(n: int) -> float:
        nonlocal state
        start = time.perf_counter()
        for i in range(n):
            state, m = step_fn(state, batch, jax.random.fold_in(key, i))
        float(m["loss"])
        return time.perf_counter() - start
    # subtract the single dispatch+readback constant via two run lengths
    short = max(1, steps // 4)
    steps = max(steps, short + 1)
    sec_per_step = (chain_time(steps) - chain_time(short)) / (steps - short)

    n_chips = len(jax.devices())
    mfu = None
    if step_flops:
        mfu = step_flops / sec_per_step / (_chip_peak_flops() * n_chips)
    return batch_size * t_out / sec_per_step / n_chips, sec_per_step, mfu


def bench_wavenet_train(batch_size: int = 4, sample_size: int = 20480,
                        steps: int = 8, precision: str = "bfloat16",
                        use_lc: bool = False, hparams: str = ""):
    """Sustained WaveNet training rate in audio samples/sec/chip (chained
    dispatch, same methodology as the Tacotron bench). ``use_lc``
    measures the mel-conditioned vocoder configuration (lc_channels=80,
    frame-rate mels upsampled on device — the layout the feeder ships)."""
    jax.config.update("jax_default_matmul_precision", precision)
    import nspeech_tpu.config as config
    from nspeech_tpu.data.wavenet_feeder import WaveNetBatch
    from nspeech_tpu.models.wavenet import WaveNet
    from nspeech_tpu.train import create_state, make_optimizer
    from nspeech_tpu.train.loop import build_wavenet_train_step

    cfg = config.load_config("wavenet")
    if use_lc:
        cfg.parse("lc_channels=80")
    cfg.parse(hparams)
    net = WaveNet(cfg)
    tx, schedule = make_optimizer(cfg, "wavenet")
    step_fn = build_wavenet_train_step(net, tx, cfg, schedule=schedule,
                                       use_lc=use_lc)
    state = create_state(net, tx, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    T = net.receptive_field + sample_size
    if use_lc:
        _, hop, _ = config.stft_params(cfg)
        mel = jnp.asarray(rng.random((batch_size, T // hop + 2,
                                      cfg.num_mels), np.float32))
        phase = jnp.zeros((batch_size,), jnp.int32)
    else:
        mel = jnp.zeros((batch_size, T, cfg.num_mels), jnp.float32)
        phase = None
    batch = WaveNetBatch(
        audio=jnp.asarray(rng.random((batch_size, T), np.float32) * 2 - 1),
        speaker_ids=jnp.zeros((batch_size,), jnp.int32),
        mel=mel, mel_phase=phase,
    )
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        state, m = step_fn(state, batch, key)
        float(m["loss"])

    def chain_time(n):
        nonlocal state
        start = time.perf_counter()
        for _ in range(n):
            state, m = step_fn(state, batch, key)
        float(m["loss"])
        return time.perf_counter() - start

    short = max(1, steps // 4)
    steps = max(steps, short + 1)
    sec_per_step = (chain_time(steps) - chain_time(short)) / (steps - short)
    return batch_size * sample_size / sec_per_step / len(jax.devices())


def bench_wavenet_generate(batch: int = 1):
    """Pallas VMEM-resident sampler (full 50-layer default config).

    Sustained rate via the SLOPE over two run lengths: a single dispatch
    through the axon relay carries ~38ms of fixed per-call overhead that
    is infrastructure, not kernel time — absolute timing of a 4k-sample
    call would understate the kernel by ~2x. (On a directly-attached TPU
    host the dispatch constant is microseconds and the slope and absolute
    numbers coincide.)
    """
    import nspeech_tpu.config as config
    from nspeech_tpu.models.wavenet import WaveNet
    from nspeech_tpu.ops.pallas.wavenet_gen import PallasWaveNetGenerator

    cfg = config.load_config("wavenet")
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    gen = PallasWaveNetGenerator(net, params)

    def best_time(n: int) -> float:
        np.asarray(gen(n, seed=0, batch=batch))  # compile
        best = float("inf")
        for s in range(4):
            start = time.perf_counter()
            np.asarray(gen(n, seed=1 + s, batch=batch))
            best = min(best, time.perf_counter() - start)
        return best

    n_small, n_large = 4096, 24576
    sec_per_sample = (best_time(n_large) - best_time(n_small)) / (
        n_large - n_small)
    rate = batch / sec_per_sample  # aggregate samples/sec across streams
    return rate, rate / cfg.sample_rate


def bench_taco2_serving():
    """Steady-state text -> waveform serving latency through the one jitted
    decode + Griffin-Lim program (serving/synthesizer.py), in seconds per
    utterance. A random-init model never crosses ``stop_threshold``, so the
    decoder runs its full ``max_iters`` budget — this is the deterministic
    UPPER bound; a trained model exits at its stop frames and pays only its
    own decode steps (measured in README's serving section). Returns
    (sec_per_utterance, decoded_audio_seconds)."""
    import nspeech_tpu.config as config
    from nspeech_tpu.models import create_model
    from nspeech_tpu.serving.synthesizer import Synthesizer

    cfg = config.load_config("taco2")
    model = create_model("taco2", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    syn = Synthesizer(cfg).set_variables(params, bn_state, model=model)
    text = "The birch canoe slid on the smooth planks across the lake."
    wav, mel, _ = syn.synthesize(text)  # compile
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        syn.synthesize(text)
        best = min(best, time.perf_counter() - start)
    # wav-only (the GET /synthesize HTTP semantics): skips the mel/linear
    # device->host pulls — through the relay the full-resolution linear
    # transfer dominates the per-request wall clock
    best_wav = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        syn.synthesize(text, want_features=False)
        best_wav = min(best_wav, time.perf_counter() - start)
    _, hop, _ = config.stft_params(cfg)
    audio_secs = mel.shape[0] * hop / cfg.sample_rate
    return best, best_wav, audio_secs


def bench_streaming_first_audio():
    """Time-to-first-audio of the streaming serving path
    (serving/streaming.py): seconds from the stream() call until the
    first waveform chunk is on host. A random-init model never stops,
    so the decoder would run its full budget in the one-shot path —
    streaming yields its first 0.5 s chunk after ONE prefix dispatch
    (encoder + first decoder steps + first postnet rows) plus one fused
    vocoder launch. Returns (best-of-3 first-audio seconds, batch-8
    aggregate real-time factor)."""
    import nspeech_tpu.config as config
    from nspeech_tpu.models import create_model
    from nspeech_tpu.serving.pipeline import WaveNetVocoder
    from nspeech_tpu.serving.streaming import StreamingTTS
    from nspeech_tpu.serving.synthesizer import Synthesizer

    cfg = config.load_config("taco2")
    model = create_model("taco2", cfg)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    syn = Synthesizer(cfg).set_variables(params, bn_state, model=model)
    vcfg = config.load_config("wavenet")
    vcfg.parse("lc_channels=80")
    from nspeech_tpu.models.wavenet import WaveNet

    net = WaveNet(vcfg)
    voc = WaveNetVocoder(vcfg, use_pallas=False).set_variables(
        net, net.init(jax.random.PRNGKey(1)))
    tts = StreamingTTS(syn, voc, chunk_frames=40)
    text = "The birch canoe slid on the smooth planks across the lake."

    def first_chunk_sec() -> float:
        start = time.perf_counter()
        for _ in tts.stream(text):
            return time.perf_counter() - start
        raise RuntimeError("stream produced no audio")

    first_chunk_sec()  # compile all chunk programs
    ttfa = min(first_chunk_sec() for _ in range(3))

    # Concurrent batched streaming: 8 streams through one batched
    # pipeline (stream_batch). Aggregate real-time factor = total audio
    # seconds produced / wall seconds.
    texts = [text,
             "Glue the sheet to the dark blue background of the wall.",
             "It is easy to tell the depth of a deep well today.",
             "These days a chicken leg is quite a rare dish indeed.",
             "Rice is often served in round bowls at dinner time.",
             "The juice of lemons makes fine punch for everyone.",
             "The box was thrown beside the parked truck outside.",
             "The hogs were fed with chopped corn and garbage."]
    list(tts.stream_batch(texts))  # compile the batch-8 programs
    start = time.perf_counter()
    samples = sum(len(c) for chunks in tts.stream_batch(texts)
                  for c in chunks if c is not None)
    wall = time.perf_counter() - start
    rt8 = (samples / cfg.sample_rate) / wall
    return ttfa, rt8


_BENCH_T0 = time.monotonic()
_HEADLINE = {}  # first-emitted record, re-printed as the final line


def _emit(metric: str, value, unit: str, vs_baseline, precision: str) -> None:
    rec = {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
        "precision": precision,
    }
    if not _HEADLINE:
        _HEADLINE.update(rec)
    print(json.dumps(rec), flush=True)


def _phase(name: str) -> None:
    print("bench: [t=%.0fs] %s" % (time.monotonic() - _BENCH_T0, name),
          file=sys.stderr, flush=True)


def _fits(budget_s: float, est_s: float, name: str) -> bool:
    """Start a phase only if its worst-case cost fits the wall budget.

    The driver wraps ``python bench.py`` in a hard timeout; getting
    SIGKILLed mid-metric records rc=124 and voids the whole run, so each
    phase starts only when ``elapsed + worst-case estimate`` stays inside
    the budget, and is skipped loudly otherwise (exit stays 0, the
    already-emitted metrics stand). Phases are ordered
    most-important-first so a slow relay sheds the least valuable rows.
    Estimates are worst cases measured on this testbed's relay, whose
    compile/executable-load service varies ~5x run to run."""
    elapsed = time.monotonic() - _BENCH_T0
    if elapsed + est_s <= budget_s:
        return True
    print("bench: [t=%.0fs] skipping %s (worst-case ~%.0fs would pass the "
          "%.0fs budget; set NSPEECH_BENCH_BUDGET_S to raise)"
          % (elapsed, name, est_s, budget_s), file=sys.stderr, flush=True)
    return False


def _require_live_relay() -> None:
    """Fail fast (one diagnosable JSON line) when the axon TPU relay is
    down instead of hanging forever in backend init.

    This testbed reaches its one v5e through a localhost relay
    (JAX_PLATFORMS=axon); when the relay process is dead, jax's first
    device use blocks indefinitely rather than erroring, which would
    turn a driver bench invocation into a silent timeout. Testbed
    detection + probe live in nspeech_tpu.utils.relay (shared with
    __graft_entry__); on hosts with no axon markers this is a no-op."""
    from nspeech_tpu.utils.relay import (RELAY_HOST, RELAY_PORT,
                                         device_init_blocks, exec_probe_subprocess,
                                         on_axon_testbed, relay_dead)

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return  # explicit CPU run never touches the relay

    def _bail(why: str) -> None:
        print(json.dumps({
            "metric": "taco2_train_mel_frames_per_sec_per_chip",
            "value": None, "unit": "frames/sec/chip", "vs_baseline": None,
            "error": "TPU relay unreachable (%s:%d): %s"
                     % (RELAY_HOST, RELAY_PORT, why),
        }), flush=True)
        raise SystemExit(1)

    if relay_dead():
        _bail("connection refused")
    # The port can accept while the tunnel behind the relay daemon is gone
    # (the daemon is a byte pump to an external orchestrator); in that
    # half-dead state backend init blocks forever with no error. Probe the
    # real thing under a watchdog — on success the backend is initialized
    # and cached, so this costs the bench nothing extra.
    if on_axon_testbed():
        _phase("probing device init (watchdog 90s)")
        if device_init_blocks(90.0):
            _bail("port accepts but backend init hung >90s "
                  "(relay tunnel half-dead)")
        # Init alone is NOT decisive: the relayed backend lists its device
        # instantly even when the tunnel behind the relay is wedged
        # (observed 2026-08-20: devices() 0.2s, first dispatch 221s..inf).
        # Probe one tiny real dispatch in a FRESH CHILD PROCESS — a hang
        # then wedges only the child, and the wedged-tunnel state has been
        # observed to heal within minutes, so wait and retry before giving
        # up. Budgets overridable: per-attempt watchdog NSPEECH_EXEC_PROBE_S,
        # attempt count NSPEECH_EXEC_PROBE_TRIES.
        exec_budget = float(os.environ.get("NSPEECH_EXEC_PROBE_S", "240"))
        tries = int(os.environ.get("NSPEECH_EXEC_PROBE_TRIES", "2"))
        last = None
        for attempt in range(tries):
            _phase("probing first device dispatch (attempt %d/%d, "
                   "watchdog %.0fs)" % (attempt + 1, tries, exec_budget))
            last = exec_probe_subprocess(exec_budget)
            if last.ok:
                _phase("device dispatch OK in %.1fs" % last.seconds)
                break
            _phase("dispatch probe failed: %s%s"
                   % (last.status, ": " + last.detail if last.detail else ""))
            if last.status == "error":
                break  # decisive failure — retrying will not change it
            if attempt + 1 < tries:
                _phase("waiting 30s for the tunnel to heal")
                time.sleep(30.0)
        if last is not None and not last.ok:
            if last.status == "error":
                _bail("probe child errored (not a hang) — %s" % last.detail)
            _bail("backend init returns but a tiny dispatch hung >%.0fs "
                  "in %d attempts (relay tunnel half-dead)"
                  % (exec_budget, tries))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true",
                        help="Accepted for compatibility; every metric is "
                             "emitted by default (on CPU-only hosts the "
                             "Pallas sampling / vocoder / serving metrics "
                             "are skipped — the kernel needs a TPU)")
    parser.add_argument("--steps", type=int, default=10,
                        help="timed steps per training bench (Tacotron-2 "
                             "and both WaveNet configurations)")
    parser.add_argument("--batch-size", type=int, default=32,
                        help="Tacotron-2 training bench batch size (the "
                             "WaveNet benches keep their own default)")
    parser.add_argument("--precision", default="bfloat16",
                        choices=["bfloat16", "tensorfloat32", "highest"])
    parser.add_argument("--hparams", default="",
                        help="k=v overrides for the Tacotron-2 training "
                             "bench config (e.g. outputs_per_step=3 for "
                             "the MFU-vs-r ceiling sweep)")
    args = parser.parse_args()

    _require_live_relay()
    # Persistent XLA compilation cache: a bench invocation with
    # already-seen programs (e.g. the driver's round-end run after a
    # warm-up) skips the multi-minute big-model compiles. JAX_PLATFORMS=cpu
    # must be forwarded into the live config: this testbed's sitecustomize
    # forces the axon TPU platform at interpreter start, so the env var
    # alone does NOT stick — without this a "CPU" bench run would silently
    # hammer the shared relay (and hang forever if the relay is dead,
    # which _require_live_relay skipped checking on the env var's word).
    from nspeech_tpu.utils.platform import set_platform
    env_platforms = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    set_platform("cpu" if env_platforms == "cpu" else None)
    # Persistent XLA compile cache (same location as __graft_entry__'s
    # dryrun): the big-model programs below cost minutes to compile cold
    # but are byte-stable run to run, so a driver bench that follows any
    # warm-up run on this host loads them in seconds. This is what lets
    # the full 15-metric set fit the wall budget (round 4's cold run
    # spent ~8 min compiling and shed the two most-cited metrics).
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/nspeech_jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache flag absent — cold compiles still work

    budget_s = float(os.environ.get("NSPEECH_BENCH_BUDGET_S", "1140"))

    _phase("taco2 train (headline)")
    frames_per_sec, sec_per_step, mfu = bench_taco2_train(
        batch_size=args.batch_size, steps=args.steps,
        precision=args.precision, hparams=args.hparams)
    _emit("taco2_train_mel_frames_per_sec_per_chip", round(frames_per_sec, 1),
          "frames/sec/chip", round(frames_per_sec / 10000.0, 3),
          args.precision)
    if mfu is not None:
        # No baseline ratio: the reference publishes no MFU (BASELINE.md).
        _emit("taco2_train_mfu", round(mfu, 4), "fraction_of_peak", None,
              args.precision)
    _emit("taco2_sec_per_step", round(sec_per_step, 4), "sec", None,
          args.precision)

    # Mixed-precision policy variant (compute_dtype=bfloat16,
    # ops/policy.py) — the best single training number in the repo and
    # the README's lead, so it runs IMMEDIATELY after the f32 headline
    # (round 4 had it last and the driver run shed it). It reuses the
    # f32 phase's already-warm backend; the only extra cost is its own
    # compile, which the persistent cache serves on a warm host.
    on_tpu = jax.default_backend() not in ("cpu",)
    def _hp_join(*parts):
        return ",".join(p for p in parts if p)
    if _fits(budget_s, 200, "bf16-policy taco2 train"):
        _phase("bf16-policy taco2 train")
        try:
            fps16, _, mfu16 = bench_taco2_train(
                batch_size=args.batch_size, steps=args.steps,
                precision=args.precision,
                hparams=_hp_join(args.hparams, "compute_dtype=bfloat16"))
            _emit("taco2_train_mel_frames_per_sec_per_chip_bf16",
                  round(fps16, 1), "frames/sec/chip",
                  round(fps16 / 10000.0, 3), "bfloat16_policy")
            if mfu16 is not None:
                _emit("taco2_train_mfu_bf16", round(mfu16, 4),
                      "fraction_of_peak", None, "bfloat16_policy")
        except Exception as e:  # pragma: no cover - defensive
            print("bench: bf16-policy taco2 metrics failed: %s" % e,
                  file=sys.stderr)

    # Mel-conditioned vocode rate (the trained-vocoder serving figure) —
    # second-most-cited row, so it runs before the nice-to-have serving /
    # streaming extras. Slope over two mel lengths (the relay's fixed
    # dispatch + mel transfer cost would otherwise dominate).
    if on_tpu and _fits(budget_s, 90, "mel-conditioned vocoder rate"):
        _phase("mel-conditioned vocoder rate")
        from nspeech_tpu.serving.pipeline import WaveNetVocoder
        import nspeech_tpu.config as config

        cfg = config.load_config("wavenet")
        cfg.parse("lc_channels=80")
        from nspeech_tpu.models.wavenet import WaveNet

        net = WaveNet(cfg)
        voc = WaveNetVocoder(cfg).set_variables(
            net, net.init(jax.random.PRNGKey(0)))
        rng = np.random.default_rng(0)

        def voc_time(frames: int) -> float:
            mel = rng.random((frames, cfg.num_mels)).astype(np.float32)
            voc.vocode(mel)  # compile
            best = float("inf")
            for _ in range(3):
                start = time.perf_counter()
                wav = voc.vocode(mel)
                best = min(best, time.perf_counter() - start)
            return best, len(wav)

        t_small, n_small = voc_time(32)
        t_large, n_large = voc_time(160)   # 2 s at 12.5 ms hop
        rate_lc = (n_large - n_small) / (t_large - t_small)
        _emit("wavenet_vocoder_lc_samples_per_sec", round(rate_lc, 1),
              "samples/sec", round(rate_lc / cfg.sample_rate / 5.0, 4),
              "float32")

    # WaveNet TRAINING throughput — the reference's second trainer
    # (train_wavenet.py) — emitted by default so every driver-captured
    # bench file carries training AND sampling numbers for both families.
    if _fits(budget_s, 90, "wavenet train"):
        _phase("wavenet train")
        rate_tr = bench_wavenet_train(steps=args.steps,
                                      precision=args.precision)
        _emit("wavenet_train_samples_per_sec_per_chip", round(rate_tr, 1),
              "samples/sec/chip", round(rate_tr / 20000.0 / 5.0, 4),
              args.precision)
    if _fits(budget_s, 60, "wavenet train (mel-conditioned)"):
        _phase("wavenet train (mel-conditioned)")
        rate_tr_lc = bench_wavenet_train(steps=args.steps,
                                         precision=args.precision,
                                         use_lc=True)
        _emit("wavenet_train_lc_samples_per_sec_per_chip",
              round(rate_tr_lc, 1), "samples/sec/chip",
              round(rate_tr_lc / 20000.0 / 5.0, 4), args.precision)
    if _fits(budget_s, 80, "bf16-policy wavenet"):
        _phase("bf16-policy wavenet")
        try:
            rate_lc16 = bench_wavenet_train(
                steps=args.steps, precision=args.precision, use_lc=True,
                hparams="compute_dtype=bfloat16")
            _emit("wavenet_train_lc_samples_per_sec_per_chip_bf16",
                  round(rate_lc16, 1), "samples/sec/chip",
                  round(rate_lc16 / 20000.0 / 5.0, 4), "bfloat16_policy")
        except Exception as e:  # pragma: no cover - defensive
            print("bench: bf16-policy wavenet metric failed: %s" % e,
                  file=sys.stderr)

    # WaveNet sampling runs the Pallas kernel in fp32 (serial small matmuls
    # are MXU-latency-bound; bf16 measured no faster). The TPU kernel does
    # not lower on CPU-only hosts — skip rather than crash mid-run there.
    if not on_tpu:
        print("bench: skipping Pallas sampling / vocoder / serving metrics "
              "(TPU-only; backend is %s)" % jax.default_backend(),
              file=sys.stderr)
    sec_utt = None
    if on_tpu and _fits(budget_s, 120, "pallas sampling"):
        _phase("pallas sampling")
        rate, rtf = bench_wavenet_generate(batch=1)
        _emit("wavenet_pallas_single_stream_samples_per_sec", round(rate, 1),
              "samples/sec", round(rtf / 5.0, 4), "float32")
        rate8, rtf8 = bench_wavenet_generate(batch=8)
        _emit("wavenet_pallas_batch8_samples_per_sec_per_chip",
              round(rate8, 1), "samples/sec/chip", round(rtf8 / 5.0, 4),
              "float32")
    if on_tpu and _fits(budget_s, 400, "taco2 serving latency"):
        # Serving latency at the full decode budget (see bench_taco2_serving
        # docstring); vs_baseline = decoded-audio-seconds / latency, i.e.
        # how many times faster than real time the serving path runs. The
        # decode runs under the same global matmul precision as training
        # (set by bench_taco2_train above), so label it accordingly.
        _phase("taco2 serving latency")
        sec_utt, sec_wav_only, audio_secs = bench_taco2_serving()
        _emit("taco2_serving_sec_per_utterance_cap", round(sec_utt, 4),
              "sec", round(audio_secs / sec_utt, 2), args.precision)
        _emit("taco2_serving_wav_only_sec", round(sec_wav_only, 4),
              "sec", round(audio_secs / sec_wav_only, 2), args.precision)
    if on_tpu and _fits(budget_s, 450, "streaming first-audio"):
        # Streaming serving: time-to-first-audio. vs_baseline = the
        # one-shot cap latency over TTFA (how much sooner the first
        # audio reaches the client). LAST in the order: it is the most
        # expensive phase (444s measured cold in round 4 — many chunk
        # programs) and its rows are beyond-parity extras, so when the
        # budget runs short the shed lands here, not on the cited
        # training/vocoder metrics. Guarded: a failure here must not
        # void the already-emitted metrics.
        _phase("streaming first-audio + batch-8")
        try:
            ttfa, rt8 = bench_streaming_first_audio()
            _emit("taco2_streaming_first_audio_sec", round(ttfa, 4), "sec",
                  round(sec_utt / ttfa, 2) if sec_utt else None,
                  args.precision)
            # vs_baseline: aggregate RT over the 5x single-stream target
            _emit("taco2_stream_batch8_rt_aggregate", round(rt8, 2),
                  "x_realtime", round(rt8 / 5.0, 2), args.precision)
        except Exception as e:  # pragma: no cover - defensive
            print("bench: streaming first-audio metric failed: %s" % e,
                  file=sys.stderr)

    # Re-print the headline record as the FINAL line: the driver parses
    # the last JSON line of stdout, and the tail it archives keeps the
    # END of the stream — this guarantees the headline metric survives
    # both, however many phases ran.
    if _HEADLINE:
        print(json.dumps(_HEADLINE), flush=True)


if __name__ == "__main__":
    main()
