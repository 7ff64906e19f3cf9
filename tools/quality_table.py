"""Assemble the quality-parity table (VERDICT r2 item 3): ours vs the
torch reference, each synthesizing the same test split at the same
training step count, each scored against ground truth with the same
objective metrics (utils/audio/quality.py — MCD, mel-L1, f0-RMSE cents,
V/UV error).

Inputs are the two results.json files written by
  - ours:  `python -m visinger_tpu.run test --config <run>/config.yaml`
           -> <run>/generated_<step>/results.json
  - torch: `python tools/torch_baseline.py synth --ckpt <pt> --out_dir d`
           -> d/results.json

    python tools/quality_table.py --ours A/results.json --torch B/results.json \
        --steps 1500 --out artifacts/parity/quality_table.md
"""

from __future__ import annotations

import argparse
import json

METRICS = ["mcd", "mel_l1", "f0_rmse_cents", "vuv_error"]


def _load(fn):
    with open(fn) as f:
        return json.load(f)


def _mean(rows, key):
    return sum(r[key] for r in rows) / max(len(rows), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", required=True)
    ap.add_argument("--torch", dest="torch_fn", required=True)
    ap.add_argument("--steps", required=True)
    ap.add_argument("--out", default="artifacts/parity/quality_table.md")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    ours, torch_r = _load(args.ours), _load(args.torch_fn)
    # zip() would silently truncate per-item rows while the mean row still
    # averages each full list — rows and means would disagree (r4 ADVICE)
    assert len(ours) == len(torch_r), \
        f"item-count mismatch: ours {len(ours)} vs torch {len(torch_r)}"
    lines = [
        "# Quality parity: ours (JAX/TPU) vs the torch reference",
        "",
        f"Both frameworks trained to **{args.steps} optimizer steps** on the "
        "same binarized corpus (identical batching economics), then "
        "synthesized the same test split; every metric is pred-vs-GROUND-"
        "TRUTH with the same scorer (utils/audio/quality.py: DCT-II "
        "mel-cepstra MCD excluding c0, masked mel-L1, f0-RMSE in cents and "
        "V/UV error over jointly-voiced frames).",
        "",
        f"- ours: `{args.ours}`",
        f"- torch: `{args.torch_fn}`",
    ]
    if args.note:
        lines += [f"- note: {args.note}"]
    lines += [
        "",
        "| item | MCD ours | MCD torch | mel-L1 ours | mel-L1 torch | "
        "f0-RMSE¢ ours | f0-RMSE¢ torch | V/UV ours | V/UV torch |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for i, (a, b) in enumerate(zip(ours, torch_r)):
        lines.append(
            f"| {i} | {a['mcd']:.2f} | {b['mcd']:.2f} | {a['mel_l1']:.3f} | "
            f"{b['mel_l1']:.3f} | {a['f0_rmse_cents']:.0f} | "
            f"{b['f0_rmse_cents']:.0f} | {a['vuv_error']:.3f} | "
            f"{b['vuv_error']:.3f} |")
    lines.append(
        "| **mean** | **{:.2f}** | **{:.2f}** | **{:.3f}** | **{:.3f}** | "
        "**{:.0f}** | **{:.0f}** | **{:.3f}** | **{:.3f}** |".format(
            _mean(ours, "mcd"), _mean(torch_r, "mcd"),
            _mean(ours, "mel_l1"), _mean(torch_r, "mel_l1"),
            _mean(ours, "f0_rmse_cents"), _mean(torch_r, "f0_rmse_cents"),
            _mean(ours, "vuv_error"), _mean(torch_r, "vuv_error")))
    lines += [
        "",
        "Per-item spread at these step counts is large (few-hundred-step "
        "GAN checkpoints on a tiny corpus); the comparison is the MEANS — "
        "deltas within the item-to-item spread = parity.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"| wrote {args.out}")
    for m in METRICS:
        print(f"|   {m}: ours {_mean(ours, m):.3f} vs torch "
              f"{_mean(torch_r, m):.3f}")


if __name__ == "__main__":
    main()
