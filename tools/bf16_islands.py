"""bf16 warm-up transient bisect (VERDICT r4 weak #5).

bf16 training shows a 5x longer initial gradient-norm transient than fp32
(gnorm 20k-95k until ~step 1100 vs ~200; artifacts/parity/bf16_run_2500.md).
This tool trains the parity configuration in bf16 for the transient window
repeatedly, each run forcing ONE subsystem back to f32
(``bf16_f32_islands``, models/visinger.py setup), all inside one process /
one tunnel slot so settle steps are comparable.  The island whose f32-ing
collapses the transient is the source.

    python tools/bf16_islands.py          # on the TPU
    ISLANDS=none,disc,decoder python tools/bf16_islands.py
    ISLAND_STEPS=1200 python tools/bf16_islands.py

Writes artifacts/parity/bf16_islands.jsonl (+ md summary).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ISLANDS = ["none", "disc", "decoder", "posterior", "flow", "pitch",
           "phoneme", "frame_prior", "text_encoder", "fp32"]


def settle_step(gnorms: list[tuple[int, float]], thresh: float = 2000.0,
                window: int = 5) -> int | None:
    """First logged step from which the next `window` gnorm logs all sit
    below `thresh` (fp32 steady state is ~550)."""
    vals = [v for _, v in gnorms]
    for i in range(len(vals) - window + 1):
        if all(v < thresh for v in vals[i:i + window]):
            return gnorms[i][0]
    return None


def main():
    from visinger_tpu.config import load_config
    from visinger_tpu.training.trainer import Trainer

    steps = int(os.environ.get("ISLAND_STEPS", 1200))
    names = [n for n in os.environ.get(
        "ISLANDS", ",".join(ISLANDS)).split(",") if n]
    out_fn = os.path.join(REPO, "artifacts", "parity", "bf16_islands.jsonl")
    results = []
    for name in names:
        work = os.path.join(REPO, "checkpoints", f"bf16_island_{name}")
        shutil.rmtree(work, ignore_errors=True)
        cfg = load_config(os.path.join(REPO, "configs", "parity_run.yaml"))
        over = dict(work_dir=work, max_updates=steps,
                    val_check_interval=10 ** 9, num_sanity_val_steps=0,
                    tb_log_interval=25, compute_dtype="bfloat16")
        if name == "fp32":
            over["compute_dtype"] = "float32"
        elif name != "none":
            over["bf16_f32_islands"] = (name,)
        cfg = cfg.replace(**over)
        print(f"== island {name} ==", flush=True)
        tr = Trainer(cfg)
        tr.fit()
        gnorms = []
        with open(os.path.join(work, "log.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("prefix") == "train" and "gnorm_g" in rec:
                    gnorms.append((int(rec["step"]), float(rec["gnorm_g"])))
        peak = max(v for _, v in gnorms) if gnorms else float("nan")
        st = settle_step(gnorms)
        rec = {"island": name, "steps": steps, "peak_gnorm": round(peak, 1),
               "settle_step": st,
               "tail_gnorm": round(sum(v for _, v in gnorms[-5:]) / 5, 1)}
        print("  " + json.dumps(rec), flush=True)
        results.append(rec)
        with open(out_fn, "a") as f:
            f.write(json.dumps(rec) + "\n")
    # summarize from the FULL jsonl so separate single-island processes
    # (each a fresh TPU program; see tools/r5_tpu_queue2.sh) compose into
    # one table
    all_rows = []
    with open(out_fn) as f:
        for line in f:
            all_rows.append(json.loads(line))
    md = [
        "# bf16 warm-up transient bisect (one f32 island at a time)",
        "",
        "Parity config, bf16 compute, identical data/seeds.  settle_step "
        "= first logged step with 5 consecutive gnorm_g logs < 2000 "
        "(fp32 steady ~550).  Loss trajectories are tunnel-slot-"
        "independent, so runs from different processes compose; anchors "
        "from the recorded long runs: pure bf16 settles ~1100-1800 with "
        "peak ~1e5 (artifacts/parity/bf16_run_2500.md, the 20k soak), "
        "pure fp32 settles ~200 (checkpoints/parity_run_r2b, PARITY.md).",
        "",
        "| island forced f32 | peak gnorm | settle step | tail gnorm |",
        "|---|---|---|---|",
    ]
    for r in all_rows:
        md.append(f"| {r['island']} | {r['peak_gnorm']:,.0f} | "
                  f"{r['settle_step']} | {r['tail_gnorm']:,.0f} |")
    with open(out_fn.replace(".jsonl", ".md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("| wrote", out_fn)


if __name__ == "__main__":
    main()
