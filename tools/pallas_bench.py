"""Native-TPU A/B benchmark: Pallas fused WaveNet stack vs the XLA layer-by-
layer WaveNet (round-1 VERDICT item #2).

Shapes are the real model's (visinger.yaml): hidden 192, K=5, gin 256;
posterior stack L=16 at train shapes, flow-coupling stack L=4 at inference
shapes.  Prints one JSON line per case with median times for both paths and
the speedup.  Run directly on the TPU (no env overrides); BENCH_T_BLK to
sweep the kernel's time tile.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from visinger_tpu.modules.wavenet import WaveNet, fused_forward_from_params

CASES = [
    # (name, B, T, C, L, gin)
    ("posterior_train", 4, 800, 192, 16, 256),
    ("posterior_b1", 1, 800, 192, 16, 256),
    ("flow_coupling", 4, 800, 192, 4, 256),
    ("flow_coupling_b1", 1, 800, 192, 4, 256),
]
if os.environ.get("BENCH_B"):  # e.g. BENCH_B=16 BENCH_T=640: bench.py shapes
    _b = int(os.environ["BENCH_B"])
    _t = int(os.environ.get("BENCH_T", 640))
    CASES = [(f"posterior_b{_b}", _b, _t, 192, 16, 256),
             (f"flow_coupling_b{_b}", _b, _t, 192, 4, 256)]


R1 = int(os.environ.get("BENCH_R1", 10))
R2 = int(os.environ.get("BENCH_R2", 50))


def _chain(raw_fn, reps):
    """Repeat the op ``reps`` times inside ONE program, output feeding
    input; reduce to a scalar so timing can force a real readback (this
    tunnel's block_until_ready resolves before execution finishes — only a
    host transfer of the result is an honest barrier)."""

    def chained(p, x, m, g):
        return jnp.sum(jax.lax.fori_loop(
            0, reps, lambda i, acc: raw_fn(p, acc, m, g), x))

    return jax.jit(chained)


def _total_time(fn, *args, warmup=1, iters=5):
    for _ in range(warmup):
        float(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))  # device->host scalar = true completion barrier
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _per_op_time(raw_fn, *args):
    """Two-length chained timing: slope (t_R2 - t_R1)/(R2 - R1) cancels the
    fixed dispatch/tunnel latency (~30 ms here — larger than the op)."""
    t1 = _total_time(_chain(raw_fn, R1), *args)
    t2 = _total_time(_chain(raw_fn, R2), *args)
    if os.environ.get("BENCH_DEBUG"):
        print(f"  totals: R{R1}={t1 * 1e3:.2f} ms  R{R2}={t2 * 1e3:.2f} ms")
    return max((t2 - t1) / (R2 - R1), 1e-9)


def main():
    # Per-case subprocess: the tunneled backend shows weird in-process timing
    # state after several compiles (first-case totals collapse below the
    # physical dispatch latency); a fresh session per case measures cleanly.
    if not os.environ.get("BENCH_CASE") and not os.environ.get("BENCH_INPROC"):
        import subprocess
        import sys

        for name, *_ in CASES:
            env = dict(os.environ, BENCH_CASE=name)
            out = subprocess.run([sys.executable, "-u", __file__], env=env,
                                 capture_output=True, text=True)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
            if out.returncode != 0:
                print(json.dumps({"case": name, "error":
                                  out.stderr.strip()[-500:]}))
        return None

    t_blk = int(os.environ.get("BENCH_T_BLK", 256))
    only = os.environ.get("BENCH_CASE", "")
    results = []
    for name, b, t, c, l, gin in CASES:
        if only and name != only:
            continue
        wn = WaveNet(hidden_channels=c, kernel_size=5, dilation_rate=1,
                     n_layers=l, gin_channels=gin)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (b, t, c), jnp.float32) * 0.1
        mask = jnp.ones((b, t, 1), jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(1), (b, 1, gin)) * 0.1
        params = jax.jit(wn.init)(rng, x, mask, g)["params"]

        xla_raw = lambda p, x, m, g: wn.apply(  # noqa: E731
            {"params": p}, x, m, g, deterministic=True)
        pallas_raw = lambda p, x, m, g: fused_forward_from_params(  # noqa: E731
            p, x, m, g, t_blk=t_blk)

        t_xla = _per_op_time(xla_raw, params, x, mask, g)
        t_pallas = _per_op_time(pallas_raw, params, x, mask, g)
        # numerics check on device (single application)
        diff = float(jnp.max(jnp.abs(
            jax.jit(xla_raw)(params, x, mask, g)
            - jax.jit(pallas_raw)(params, x, mask, g))))
        rec = {
            "case": name, "B": b, "T": t, "C": c, "L": l, "t_blk": t_blk,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pallas * 1e3, 3),
            "speedup": round(t_xla / t_pallas, 3),
            "max_abs_diff": diff,
            "platform": jax.devices()[0].platform,
        }
        results.append(rec)
        print(json.dumps(rec))
    return results


if __name__ == "__main__":
    main()
