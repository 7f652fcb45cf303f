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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=None)
    args = p.parse_args()

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
