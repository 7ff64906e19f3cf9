"""Loss-curve parity comparison: torch reference vs this framework.

Round-1 VERDICT item #1(b): train the actual torch reference
(tools/torch_baseline.py train) and our JAX trainer on the SAME binarized
synthetic corpus, then compare trajectories.  The torch log is per-step
(tasks/visinger.py loss dict); the JAX trainer's log.jsonl rows are
``tb_log_interval``-step window averages — so the torch series is averaged
over the same windows before comparison.

Outputs (into --out_dir):
  loss_curves.png   small-multiples figure, one axis per loss (never dual)
  parity_table.md   windowed values side by side + relative gap

Usage:
  python tools/parity_compare.py \
      --torch_log artifacts/parity/torch_train_log.jsonl \
      --jax_log checkpoints/parity_run_r2/log.jsonl \
      --out_dir artifacts/parity
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Losses to compare (shared keys of tasks/visinger.py:104-146 and our
# training/train_step.py metrics).  (key, pretty name, log-scale?)
LOSSES = [
    ("mel_l1", "mel L1 (x45 in total)", False),
    ("kl_v", "KL (valid)", True),
    ("ctc", "CTC", True),
    ("f0", "f0 L1", True),
    ("uv", "UV BCE", False),
    ("adv", "adv (gen)", False),
    ("fm", "feature match", False),
    ("disc", "disc", False),
]

# dataviz default palette, slots 1+2 (pre-validated adjacent pair).
C_JAX = "#2a78d6"    # blue — this framework
C_TORCH = "#eb6834"  # orange — torch reference
INK = "#0b0b0b"
INK2 = "#52514e"
SURFACE = "#fcfcfb"


def read_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def window_avg(rows, window, max_step):
    """Average per-step rows into [window]-step buckets ending at k*window."""
    out = {}
    for k, _name, _log in LOSSES:
        vals = {}
        for r in rows:
            s = r.get("step", 0)
            if s > max_step or k not in r:
                continue
            b = ((s - 1) // window + 1) * window
            vals.setdefault(b, []).append(float(r[k]))
        out[k] = {b: float(np.mean(v)) for b, v in sorted(vals.items())}
    return out


def jax_series(rows, max_step):
    out = {k: {} for k, _n, _l in LOSSES}
    for r in rows:
        if r.get("prefix") != "train" or r.get("step", 0) > max_step:
            continue
        for k, _n, _l in LOSSES:
            if k in r:
                out[k][int(r["step"])] = float(r[k])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_log", default="artifacts/parity/torch_train_log.jsonl")
    ap.add_argument("--jax_log", default="checkpoints/parity_run_r2/log.jsonl")
    ap.add_argument("--out_dir", default="artifacts/parity")
    ap.add_argument("--window", type=int, default=25)
    args = ap.parse_args()

    torch_rows = read_jsonl(args.torch_log)
    jax_rows = read_jsonl(args.jax_log)
    max_torch = max(r.get("step", 0) for r in torch_rows)
    tser = window_avg(torch_rows, args.window, max_torch)
    jser = jax_series(jax_rows, max_torch)

    os.makedirs(args.out_dir, exist_ok=True)

    # ------------------------------------------------------------------ table
    lines = [
        "| step | " + " | ".join(
            f"{k} ref / ours" for k, _n, _l in LOSSES) + " |",
        "|---|" + "---|" * len(LOSSES),
    ]
    steps = sorted(set().union(*[set(v) for v in jser.values()])) or []
    for s in steps:
        cells = []
        for k, _n, _l in LOSSES:
            t = tser[k].get(s)
            j = jser[k].get(s)
            ts = f"{t:.3g}" if t is not None else "-"
            js = f"{j:.3g}" if j is not None else "-"
            cells.append(f"{ts} / {js}")
        lines.append(f"| {s} | " + " | ".join(cells) + " |")
    with open(os.path.join(args.out_dir, "parity_table.md"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # ----------------------------------------------------------------- figure
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 4, figsize=(14, 6.5), facecolor=SURFACE)
    for ax, (k, name, logscale) in zip(axes.ravel(), LOSSES):
        ax.set_facecolor(SURFACE)
        tx = sorted(tser[k])
        jx = sorted(jser[k])
        ax.plot(tx, [tser[k][s] for s in tx], color=C_TORCH, lw=2,
                label="torch reference", solid_capstyle="round")
        ax.plot(jx, [jser[k][s] for s in jx], color=C_JAX, lw=2,
                label="visinger_tpu (JAX)", solid_capstyle="round")
        if logscale:
            ax.set_yscale("log")
        ax.set_title(name, fontsize=10, color=INK)
        ax.tick_params(labelsize=8, colors=INK2)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color("#d8d7d2")
        ax.grid(True, color="#ecebe7", lw=0.6)
        ax.set_axisbelow(True)
    axes[1, 0].set_xlabel("train step", fontsize=9, color=INK2)
    handles, labels = axes[0, 0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="upper center", ncol=2, frameon=False,
               fontsize=10, bbox_to_anchor=(0.5, 1.0))
    fig.suptitle(
        f"Same corpus, same batches: {args.window}-step windowed losses",
        y=0.965, fontsize=11, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    out_png = os.path.join(args.out_dir, "loss_curves.png")
    fig.savefig(out_png, dpi=130)
    print(f"wrote {out_png} and parity_table.md ({len(steps)} windows)")


if __name__ == "__main__":
    main()
