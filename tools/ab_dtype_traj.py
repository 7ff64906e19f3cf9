"""CPU trajectory A/B: fp32 vs bf16 fused train step over N steps.

Complements tools/ab_dtype.py (same-slot TPU timing): this one checks that
mixed precision (bf16 compute / f32 params, modules/common.py) does not
change the TRAINING TRAJECTORY — both runs start from the same init and the
same per-step PRNG keys, so every difference is a pure precision effect.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/ab_dtype_traj.py

Writes artifacts/parity/bf16_trajectory.md.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visinger_tpu.models.factory import (  # noqa: E402
    build_models,
    init_state,
    tiny_batch,
    tiny_config,
)
from visinger_tpu.training.train_step import make_train_step  # noqa: E402

TRACK_KEYS = ("total_g", "mel_l1", "kl_v", "ctc", "uv", "f0", "disc")


def run(cfg, batch, steps):
    model, disc = build_models(cfg, 40, 96, 64)
    state = init_state(cfg, model, disc, batch)
    step_fn = jax.jit(make_train_step(cfg, model, disc), donate_argnums=(0,))
    hist = []
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        hist.append({k: float(metrics[k]) for k in TRACK_KEYS if k in metrics})
    return hist


def main():
    steps = int(os.environ.get("TRAJ_STEPS", 60))
    cfg32 = tiny_config()
    batch = tiny_batch(cfg32)
    t0 = time.time()
    h32 = run(cfg32, batch, steps)
    h16 = run(cfg32.replace(compute_dtype="bfloat16"), batch, steps)
    keys = list(h32[0].keys())

    lines = [
        "# bf16 vs fp32 training trajectory (CPU, tiny config, shared init/keys)",
        "",
        f"{steps} fused GAN steps, identical init and per-step PRNG keys; every",
        "difference below is a pure bf16-compute precision effect (params f32).",
        "",
        "| step | " + " | ".join(f"{k} f32 / bf16" for k in keys) + " |",
        "|---|" + "---|" * len(keys),
    ]
    probe = sorted({0, 1, steps // 4, steps // 2, steps - 1})
    for i in probe:
        cells = [f"{h32[i][k]:.4g} / {h16[i][k]:.4g}" for k in keys]
        lines.append(f"| {i} | " + " | ".join(cells) + " |")
    # final-quarter relative gap per loss (trajectory-level agreement)
    lines += ["", "Final-quarter mean relative gap per loss:", ""]
    q = steps - max(1, steps // 4)
    ok = True
    for k in keys:
        a = np.mean([h[k] for h in h32[q:]])
        b = np.mean([h[k] for h in h16[q:]])
        rel = abs(a - b) / max(abs(a), abs(b), 1e-6)
        lines.append(f"- `{k}`: f32 {a:.5g}, bf16 {b:.5g}, rel {rel:.3f}")
        if rel > 0.15:
            ok = False
    lines += ["", f"Verdict: {'TRACKS (<=15% rel on every loss)' if ok else 'DIVERGES'}",
              f"", f"(wall {time.time() - t0:.0f}s)"]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "parity", "bf16_trajectory.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
