"""Back-to-back e2e A/B: geometric grid coarse aggregates (shipped
default) vs blocked contiguous-RCM aggregates (FEA_TPU_COARSE_BLOCK=1,
fem/coarse.build_block_aggregates).

The blocked space makes the coarse restriction/prolongation pure
reshapes (zero segment/gather ops in the CG hot loop — the 48%/iter
cost measured by iteration_profile.py), but it changes the
preconditioner: RCM blocks are BFS level-set strips, not grid cells, so
iteration counts can move either way. This harness measures the only
number that decides shipping: end-to-end plates/h, plus the iteration
and failure telemetry to attribute the result.

Interleaved A/B (A B A B) per the round-2 measurement methodology: the
tunnel's minute-scale stall tail poisons any non-adjacent comparison;
best-of per config over interleaved reps is the trustworthy statistic.

Usage: timeout 3600 python benchmarks/coarse_block_ab.py [n_plates] [reps]
"""
import os
import sys
import tempfile
import time

import numpy as np

from fea_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()
import jax

print("devices:", jax.devices(), file=sys.stderr)

from fea_tpu.datagen.batched import generate_data_batched

n_plates = int(sys.argv[1]) if len(sys.argv) > 1 else 16
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

common = dict(
    image_size=512,
    conditions_per_plate=4,
    mesh_size=1e-2,
    num_steps_per_condition=6,
    save_displacement=True,
    verbose=False,
)

CONFIGS = [("geometric", "0"), ("blocked", "1")]
results = {name: [] for name, _ in CONFIGS}
telemetry = {}

with tempfile.TemporaryDirectory() as tmp:
    # warm both programs (compile + cache) outside the timed region
    for name, flag in CONFIGS:
        os.environ["FEA_TPU_COARSE_BLOCK"] = flag
        t0 = time.time()
        generate_data_batched(
            data_dir=os.path.join(tmp, f"warm_{name}"),
            num_plates=4,
            seed=7,
            **common,
        )
        print(f"warmup {name}: {time.time() - t0:.1f}s", file=sys.stderr)

    for r in range(reps):
        for name, flag in CONFIGS:
            os.environ["FEA_TPU_COARSE_BLOCK"] = flag
            t0 = time.time()
            stats = generate_data_batched(
                data_dir=os.path.join(tmp, f"t{r}_{name}"),
                num_plates=n_plates,
                seed=1234,
                **common,
            )
            w = time.time() - t0
            results[name].append(w)
            iters = stats["converged_iters"]
            telemetry[name] = {
                "iters_median": float(np.median(iters)) if iters else None,
                "iters_mean": round(float(np.mean(iters)), 1)
                if iters
                else None,
                "solves": stats["solves"],
                "cg_failures": stats["failures"],
                "direct_fallbacks": stats.get("direct_fallbacks", 0),
                "cg_resamples": stats.get("cg_resamples", 0),
                "device_busy_s": round(stats.get("device_busy_s", 0.0), 1),
            }
            print(
                f"rep {r} {name}: {w:.1f}s ({n_plates / w * 3600:.0f} "
                f"plates/h) iters_med={telemetry[name]['iters_median']} "
                f"fail={stats['failures']}/{stats['solves']}",
                file=sys.stderr,
            )

best = {k: min(v) for k, v in results.items()}
print(
    {
        "plates": n_plates,
        "best_wall_s": {k: round(v, 1) for k, v in best.items()},
        "plates_per_hour": {
            k: round(n_plates / v * 3600.0, 0) for k, v in best.items()
        },
        "speedup_blocked": round(best["geometric"] / best["blocked"], 3),
        "telemetry": telemetry,
    }
)
