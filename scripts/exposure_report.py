"""Compare free-run (autoregressive) health across training runs.

Reads each run's ``metrics.jsonl`` (written by ``train.py
--freerun-preview``) and emits a step-aligned table plus a curve PNG of
``freerun_rms`` — the serving-path canary that exposes the
exposure-bias failure mode (teacher-forced previews look perfect while
the free-running decoder emits silence; see
docs/alignment/README.md "Exposure bias").

Built for the scheduled-sampling experiment: train the same config
twice with ``scheduled_sampling_ratio=0.0`` and ``>0`` and compare when
each run's free-run output becomes (and stays) audible.

Usage:
    python scripts/exposure_report.py --run ss0.0=/tmp/ss_run/ss00 \
        --run ss0.5=/tmp/ss_run/ss05 --out docs/alignment/ss_freerun
"""

from __future__ import annotations

import argparse
import json
import os


def load_freerun(run_dir: str) -> list[tuple[int, float, float]]:
    rows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "freerun_rms" in rec:
                rows.append((int(rec["step"]), float(rec["freerun_rms"]),
                             float(rec.get("freerun_decoder_steps", 0))))
    return sorted(rows)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run", action="append", required=True,
                        metavar="LABEL=DIR",
                        help="label=path-to-run-dir (repeatable)")
    parser.add_argument("--out", required=True,
                        help="output dir for freerun_rms.png + report.json")
    parser.add_argument("--audible-rms", type=float, default=0.05,
                        help="threshold below which a free-run preview is "
                             "counted as (near-)silent")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    runs = {}
    for spec in args.run:
        label, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--run expects LABEL=DIR, got {spec!r}")
        runs[label] = load_freerun(path)
        if not runs[label]:
            raise SystemExit(f"{path}: no freerun_rms rows — was the run "
                             "launched with --freerun-preview?")

    report = {"audible_rms_threshold": args.audible_rms, "runs": {}}
    for label, rows in runs.items():
        audible = [s for s, rms, _ in rows if rms >= args.audible_rms]
        report["runs"][label] = {
            "points": [{"step": s, "freerun_rms": round(rms, 4)}
                       for s, rms, _ in rows],
            "first_audible_step": audible[0] if audible else None,
            "audible_fraction": round(len(audible) / len(rows), 3),
            "final_rms": round(rows[-1][1], 4),
        }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for label, rows in runs.items():
        ax.plot([s for s, _, _ in rows], [r for _, r, _ in rows],
                marker="o", label=label)
    ax.axhline(args.audible_rms, color="gray", ls="--", lw=1,
               label=f"audible threshold ({args.audible_rms})")
    ax.set_xlabel("training step")
    ax.set_ylabel("free-run preview RMS")
    ax.set_title("Autoregressive (serving-path) output level vs training")
    ax.legend()
    fig.tight_layout()
    png = os.path.join(args.out, "freerun_rms.png")
    fig.savefig(png, dpi=120)

    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["runs"], indent=1))
    print(f"wrote {png} and {path}")


if __name__ == "__main__":
    main()
