"""Statistically-powered quality parity: a ladder of matched checkpoints.

Round-4's quality table compared ONE checkpoint per framework and every
metric flipped leader between adjacent checkpoints (VERDICT r4 weak #2) —
single snapshots sit inside GAN checkpoint noise.  This tool synthesizes
the same test split at EVERY matched checkpoint (each 250 steps) of the two
parity runs and reports, per metric:

  - per-checkpoint means for both frameworks (the trajectory),
  - cross-ladder mean ± std (framework noise floor),
  - paired per-(item, checkpoint) deltas with mean ± std,
  - leave-one-out stability: does the sign of the mean cross-framework
    delta survive dropping any single checkpoint?

Reference anchors: the torch test loop is tasks/visinger.py:244-263; the
scorer is ours (utils/audio/quality.py) applied identically to both sides.

Usage (each stage is resumable — existing results.json are skipped):
  python tools/quality_ladder.py synth-ours  --work_dir checkpoints/parity_fp32_r5
  python tools/quality_ladder.py synth-torch --ckpt_base checkpoints/torch_parity_r5
  python tools/quality_ladder.py report --ours_dir ... --torch_dir ... \
      --out artifacts/parity/quality_ladder.md
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METRICS = ["mcd", "mel_l1", "f0_rmse_cents", "vuv_error"]
LOWER_IS_BETTER = True  # all four


def _ladder_steps(arg: str) -> list[int]:
    m = re.match(r"^(\d+):(\d+):(\d+)$", arg)
    if m:
        lo, hi, st = map(int, m.groups())
        return list(range(lo, hi + 1, st))
    return [int(s) for s in arg.split(",") if s]


def synth_ours(work_dir: str, steps: list[int], out_root: str):
    import jax.numpy as jnp  # noqa: F401  (env check before heavy imports)

    from visinger_tpu.config import load_config
    from visinger_tpu.data.dataset import build_dataset
    from visinger_tpu.training.checkpoint import restore_checkpoint
    from visinger_tpu.training.trainer import Trainer

    cfg = load_config(os.path.join(work_dir, "config.yaml"))
    cfg = cfg.replace(work_dir=work_dir)
    tr = Trainer(cfg)
    ds = build_dataset(cfg, cfg.train_set_name)
    first = next(ds.batches(shuffle=False))
    state = tr._init_state(first)
    for step in steps:
        out_dir = os.path.join(out_root, f"step_{step:06d}")
        if os.path.exists(os.path.join(out_dir, "results.json")):
            print(f"| step {step}: exists, skipping")
            continue
        path = os.path.join(work_dir, f"model_ckpt_steps_{step}.msgpack")
        if not os.path.exists(path):
            print(f"| step {step}: no checkpoint, skipping")
            continue
        st = restore_checkpoint(path, state)
        print(f"| synthesizing ours @ step {step}")
        tr.test(st, out_dir=out_dir)


def synth_torch(ckpt_base: str, steps: list[int], out_root: str):
    from tools.torch_baseline import mode_synth

    for step in steps:
        out_dir = os.path.join(out_root, f"step_{step:06d}")
        if os.path.exists(os.path.join(out_dir, "results.json")):
            print(f"| step {step}: exists, skipping")
            continue
        fn = f"{ckpt_base}_step{step:06d}.pt"
        if not os.path.exists(fn):
            print(f"| step {step}: no checkpoint, skipping")
            continue
        print(f"| synthesizing torch @ step {step}")
        mode_synth(fn, out_dir, config="configs/parity_run.yaml")


def _mean(xs):
    return sum(xs) / max(len(xs), 1)


def _std(xs):
    if len(xs) < 2:
        return 0.0
    mu = _mean(xs)
    return math.sqrt(sum((x - mu) ** 2 for x in xs) / (len(xs) - 1))


def _collect(root: str) -> dict[int, list[dict]]:
    out = {}
    for fn in sorted(glob.glob(os.path.join(root, "step_*", "results.json"))):
        step = int(re.search(r"step_(\d+)", fn).group(1))
        with open(fn) as f:
            out[step] = json.load(f)
    return out


def report(ours_dir: str, torch_dir: str, out_fn: str):
    ours, torch_r = _collect(ours_dir), _collect(torch_dir)
    steps = sorted(set(ours) & set(torch_r))
    if not steps:
        raise SystemExit("no matched checkpoints")
    n_items = min(min(len(ours[s]) for s in steps),
                  min(len(torch_r[s]) for s in steps))
    for s in steps:
        assert len(ours[s]) == len(torch_r[s]) == n_items, \
            f"item-count mismatch at step {s}"

    lines = [
        "# Quality-parity ladder: ours (JAX/TPU) vs the torch reference",
        "",
        f"**{len(steps)} matched checkpoints** ({steps[0]}..{steps[-1]}, "
        f"every {steps[1] - steps[0] if len(steps) > 1 else 0} optimizer "
        f"steps) x {n_items} test items, both frameworks trained on the "
        "identical binarized corpus and batching, both synthesizing the "
        "same test split, both scored against ground truth by the same "
        "scorer (utils/audio/quality.py).  Lower is better on every metric.",
        "",
        f"- ours ladder: `{ours_dir}`  |  torch ladder: `{torch_dir}`",
        "",
        "## Per-checkpoint means",
        "",
        "| step | " + " | ".join(f"{m} ours | {m} torch" for m in METRICS)
        + " |",
        "|" + "---|" * (1 + 2 * len(METRICS)),
    ]
    for s in steps:
        cells = []
        for m in METRICS:
            cells.append(f"{_mean([r[m] for r in ours[s]]):.2f}")
            cells.append(f"{_mean([r[m] for r in torch_r[s]]):.2f}")
        lines.append(f"| {s} | " + " | ".join(cells) + " |")

    lines += ["", "## Cross-ladder statistics", "",
              "| metric | ours mean±std | torch mean±std | paired delta "
              "(ours−torch) mean±std | leader | sign stable under "
              "leave-one-out? |", "|---|---|---|---|---|---|"]
    summary = {}
    for m in METRICS:
        ours_ck = [_mean([r[m] for r in ours[s]]) for s in steps]
        torch_ck = [_mean([r[m] for r in torch_r[s]]) for s in steps]
        deltas = [ours[s][i][m] - torch_r[s][i][m]
                  for s in steps for i in range(n_items)]
        d_mu, d_sd = _mean(deltas), _std(deltas)
        # leave-one-out over checkpoints: recompute the mean delta dropping
        # each checkpoint once; stable iff the sign never flips
        loo = []
        for drop in steps:
            sub = [ours[s][i][m] - torch_r[s][i][m]
                   for s in steps if s != drop for i in range(n_items)]
            loo.append(_mean(sub))
        stable = all(x > 0 for x in loo) or all(x < 0 for x in loo)
        leader = "ours" if d_mu < 0 else "torch"
        summary[m] = {"ours": [_mean(ours_ck), _std(ours_ck)],
                      "torch": [_mean(torch_ck), _std(torch_ck)],
                      "delta": [d_mu, d_sd], "leader": leader,
                      "loo_stable": stable}
        lines.append(
            f"| {m} | {_mean(ours_ck):.2f}±{_std(ours_ck):.2f} | "
            f"{_mean(torch_ck):.2f}±{_std(torch_ck):.2f} | "
            f"{d_mu:+.2f}±{d_sd:.2f} | {leader} | "
            f"{'yes' if stable else 'no'} |")

    lines += [
        "",
        "## Reading",
        "",
        "A metric shows a REAL cross-framework gap only when the paired "
        "delta's magnitude clears the checkpoint noise (its ±std) AND the "
        "leader survives leave-one-out; otherwise the honest conclusion is "
        "parity within GAN checkpoint noise.  Deltas are paired per (item, "
        "checkpoint), so item difficulty cancels.",
    ]
    os.makedirs(os.path.dirname(out_fn), exist_ok=True)
    with open(out_fn, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(out_fn.replace(".md", ".json"), "w") as f:
        json.dump({"steps": steps, "n_items": n_items, "summary": summary},
                  f, indent=1)
    print(f"| wrote {out_fn} ({len(steps)} checkpoints x {n_items} items)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["synth-ours", "synth-torch", "report"])
    ap.add_argument("--work_dir", default="checkpoints/parity_fp32_r5")
    ap.add_argument("--ckpt_base", default="checkpoints/torch_parity_r5")
    ap.add_argument("--steps", default="250:3000:250")
    ap.add_argument("--ours_dir", default="artifacts/parity/ladder_r5/ours")
    ap.add_argument("--torch_dir", default="artifacts/parity/ladder_r5/torch")
    ap.add_argument("--out", default="artifacts/parity/quality_ladder.md")
    args = ap.parse_args()
    steps = _ladder_steps(args.steps)
    if args.mode == "synth-ours":
        synth_ours(args.work_dir, steps, args.ours_dir)
    elif args.mode == "synth-torch":
        synth_torch(args.ckpt_base, steps, args.torch_dir)
    else:
        report(args.ours_dir, args.torch_dir, args.out)
