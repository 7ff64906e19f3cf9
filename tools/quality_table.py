"""Assemble the quality-parity table (VERDICT r2 #3 / BASELINE.md quality bar).

Both frameworks train on the SAME binarized corpus to the SAME step count
(tools/torch_baseline.py train / visinger_tpu.run train with
configs/parity_run.yaml), synthesize the test split, and record the same
objective metrics vs ground truth (utils/audio/quality.py: MCD, mel-L1,
f0-RMSE in cents, V/UV error).  This script merges the two results.json
files into artifacts/parity/quality_table.md.

  python tools/quality_table.py --ours <dir>/results.json \
      --torch <dir>/results.json --steps 1500 \
      --out artifacts/parity/quality_table.md
"""

from __future__ import annotations

import argparse
import json

import numpy as np

METRICS = [("mcd", "MCD (dB)"), ("mel_l1", "mel-L1"),
           ("f0_rmse_cents", "f0-RMSE (cents)"), ("vuv_error", "V/UV err"),
           ("rtf", "RTF")]


def _stats(results: list[dict]) -> dict:
    out = {}
    for key, _label in METRICS:
        vals = np.asarray([r[key] for r in results], float)
        vals = vals[np.isfinite(vals)]
        out[key] = (float(np.mean(vals)), float(np.std(vals)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", required=True)
    ap.add_argument("--torch", dest="torch_fn", required=True)
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--corpus", default="synthetic 28-song corpus "
                    "(configs/parity_run.yaml)")
    ap.add_argument("--notes", default="")
    ap.add_argument("--out", default="artifacts/parity/quality_table.md")
    args = ap.parse_args()

    with open(args.ours) as f:
        ours = json.load(f)
    with open(args.torch_fn) as f:
        ref = json.load(f)
    so, sr = _stats(ours), _stats(ref)

    lines = [
        "# Quality parity — synthesis vs ground truth at equal training steps",
        "",
        f"Corpus: {args.corpus}; both frameworks trained to "
        f"**{args.steps} steps** on identical binarized batches, then "
        "synthesized the test split (batch 1, infer branch: prior sample -> "
        "flow reverse -> full decode).  Metrics vs ground-truth audio "
        "(utils/audio/quality.py); mean +- std over "
        f"{len(ours)}/{len(ref)} items.",
        "",
        "| metric | visinger_tpu (JAX/TPU-trained) | torch reference "
        "(CPU-trained) | delta |",
        "|---|---|---|---|",
    ]
    for key, label in METRICS:
        mo, do = so[key]
        mr, dr = sr[key]
        note = " (TPU vs CPU hw)" if key == "rtf" else ""
        lines.append(f"| {label} | {mo:.3f} +- {do:.3f} | {mr:.3f} +- "
                     f"{dr:.3f} | {mo - mr:+.3f}{note} |")
    lines += ["", "Sources: " f"`{args.ours}`, `{args.torch_fn}`."]
    if args.notes:
        lines += ["", args.notes]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
