#!/usr/bin/env python
"""Kernel lab: measure the Pallas WaveNet sampler's per-sample latency
breakdown on the real chip by varying the architecture.

Slope method (see bench.py): rate = d(samples)/d(time) over two run
lengths, which cancels the per-dispatch relay constant.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import nspeech_tpu.config as config
from nspeech_tpu.models.wavenet import WaveNet
from nspeech_tpu.ops.pallas.wavenet_gen import PallasWaveNetGenerator


def measure(cfg_overrides: str = "", batch: int = 1, reps: int = 4,
            n_small: int = 4096, n_large: int = 24576) -> float:
    cfg = config.load_config("wavenet")
    if cfg_overrides:
        cfg.parse(cfg_overrides)
    net = WaveNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    gen = PallasWaveNetGenerator(net, params)

    def best_time(n: int) -> float:
        np.asarray(gen(n, seed=0, batch=batch))  # compile
        best = float("inf")
        for s in range(reps):
            start = time.perf_counter()
            np.asarray(gen(n, seed=1 + s, batch=batch))
            best = min(best, time.perf_counter() - start)
        return best

    sec_per_sample = (best_time(n_large) - best_time(n_small)) / (
        n_large - n_small)
    return sec_per_sample


def ceiling(out_json: str = None):
    """Single-stream latency-bound ceiling: layer sweep -> linear fit.

    The kernel's serial chain per layer is ONE dependent matmul plus
    THREE dependent VPU ops (wavenet_gen.py module docstring), so
    sec/sample is linear in the layer count L:

        t(L) = per_layer * L + fixed

    where the docstring's measured latencies predict per_layer ~= 85ns
    (matmul) + 3 x 25-30ns (VPU) = 160-175ns, and `fixed` is the
    per-step work outside the stack (fused-causal input matmul, layer-0
    state-tap matmul, 2-matmul output network + relu, sampling
    read+add+argmax, loop carry). Sweeping L in {10, 25, 50} and
    fitting the line yields BOTH constants empirically; the ceiling
    check is whether the fitted per-layer slope has any headroom left
    over the model's dependent-op floor.
    """
    import json

    sweep = {10: "dilations_length=10,dilations_depth=1",
             25: "dilations_length=5,dilations_depth=5",
             50: ""}
    pts = {}
    for L, ov in sweep.items():
        sps = measure(ov)
        pts[L] = sps
        print(f"L={L:3d}  {sps*1e9:9.1f} ns/sample "
              f"({1/sps:10.1f} samples/s)", flush=True)
    Ls = np.array(sorted(pts), float)
    ts = np.array([pts[int(l)] for l in Ls])
    slope, intercept = np.polyfit(Ls, ts, 1)
    model_lo, model_hi = 85e-9 + 3 * 25e-9, 85e-9 + 3 * 30e-9
    full = pts[50]
    out = {
        "ns_per_sample": {str(int(l)): round(pts[int(l)] * 1e9, 1)
                          for l in Ls},
        "per_layer_ns": round(slope * 1e9, 2),
        "fixed_ns": round(intercept * 1e9, 1),
        "model_per_layer_ns": [round(model_lo * 1e9, 1),
                               round(model_hi * 1e9, 1)],
        "model_floor_50L_ns": [round((model_lo * 50 + intercept) * 1e9, 1),
                               round((model_hi * 50 + intercept) * 1e9, 1)],
        "measured_50L_ns": round(full * 1e9, 1),
        "samples_per_sec_50L": round(1 / full, 1),
        "pct_of_latency_ceiling": round(
            100 * (model_lo * 50 + intercept) / full, 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=None)
    p.add_argument("--ceiling", action="store_true",
                   help="layer sweep + linear fit: derive the serial "
                        "latency ceiling and where the 50L kernel sits")
    p.add_argument("--out-json", default=None)
    args = p.parse_args()

    if args.ceiling:
        ceiling(args.out_json)
        return

    # name -> hparam override string
    default_suite = {
        "full_50L": "",
        "25L": "dilations_length=5,dilations_depth=5",   # 25 layers
        "10L": "dilations_length=10,dilations_depth=1",  # 10 layers
        "skip128": "skip_channels=128",
        "quant128": "quantization_channels=128",
    }
    suite = default_suite
    if args.configs:
        suite = {c: default_suite.get(c, c) for c in args.configs}

    for name, ov in suite.items():
        try:
            sps = measure(ov)
            print(f"{name:24s} {sps*1e9:9.1f} ns/sample  "
                  f"({1/sps:10.1f} samples/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
