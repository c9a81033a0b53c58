"""A/B the production-scale training feed on the current backend.

VERDICT r2 ask #2's done-bar: steps/s on a >=50k-sample dataset within
~15% of the in-memory bench number. Three modes over the SAME condition
store (bit-exact outputs, tests/test_store.py):

  host          packed per-step upload (~19-33 MB/step on the wire)
  tables        HBM-resident bitpacked tables, index-vector feed
                (~100 bytes/step; data/device_store.py)
  tables_accum  ditto at micro-batch B/2 x 2 accumulation steps — the
                guaranteed-HBM-fit ladder rung (train_loop_resume.sh)

Each mode replicates the trainer's real prefetch-overlap micro-loop
(trainer.py train(): dispatch step i async, host-prep batch i+1, never
block mid-run), so host decode and transfer hide exactly as much as they
do in production. Fresh-init params — this measures the feed, not the
model. Best-of-2 per mode per CLAUDE.md's tunnel methodology.

Usage:
  timeout 2400 python benchmarks/feed_ab.py [store_dir] [data_dir] \
      [eval_dir] [n_steps]
Defaults: runs3/store256 runs3/train_data runs3/eval_data 40
"""

import os
import sys
import time

_platform = os.environ.get("FEA_TPU_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

from fea_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

store_dir = sys.argv[1] if len(sys.argv) > 1 else "runs3/store256"
data_dir = sys.argv[2] if len(sys.argv) > 2 else "runs3/train_data"
eval_dir = sys.argv[3] if len(sys.argv) > 3 else "runs3/eval_data"
n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 40

from fea_tpu.train.trainer import Trainer, TrainerConfig  # noqa: E402

MODES = {
    "host": dict(train_batch_size=16, device_resident_store=False),
    "tables": dict(train_batch_size=16, device_resident_store=True),
    "tables_accum": dict(
        train_batch_size=8,
        num_gradient_accumulation_steps=2,
        device_resident_store=True,
    ),
}


def run_mode(name: str, overrides: dict) -> float:
    cfg = TrainerConfig(
        dataset_folder=data_dir,
        sample_dataset_folder=eval_dir,
        dataset_store=store_dir,
        dataset_image_size=256,
        num_train_steps=1,
        num_steps_per_condition=6,
        num_steps_per_sample_condition=6,
        conditions_per_plate=4,
        num_sample_conditions_per_plate=1,
        skip_dataset_size_check=True,
        results_folder=f"/tmp/feed_ab_{name}",
        progress_bar=False,
        compute_dtype="bfloat16",
        **overrides,
    )
    trainer = Trainer(cfg)
    if overrides.get("device_resident_store") and trainer.device_tables is None:
        print(f"{name}: device tables rejected by cap — skipping")
        return float("nan")
    per_step = cfg.train_batch_size * cfg.num_gradient_accumulation_steps
    state = trainer.state

    # compile + warm (2 steps)
    t0 = time.time()
    for i in range(2):
        state, _ = trainer._train_step(
            state, trainer._fetch_batch(i * per_step), trainer.device_tables
        )
    jax.block_until_ready(state.params)
    print(f"{name}: compile+warm {time.time() - t0:.1f}s")

    best = float("inf")
    for rep in range(2):  # best-of-2: any rpc can stall minutes
        nxt = trainer._fetch_batch(2 * per_step)
        t0 = time.time()
        for i in range(n_steps):
            state, loss = trainer._train_step(state, nxt, trainer.device_tables)
            if i + 1 < n_steps:
                nxt = trainer._fetch_batch((3 + rep * n_steps + i) * per_step)
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        print(f"{name} rep{rep}: {n_steps / dt:.3f} steps/s ({dt:.1f}s)")
        best = min(best, dt)
    return n_steps / best


results = {}
for name, overrides in MODES.items():
    try:
        results[name] = run_mode(name, overrides)
    except Exception as e:  # an HBM OOM in one mode must not sink the A/B
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
        results[name] = float("nan")

print("\n=== feed A/B (steps/s, best-of-2, effective batch 16) ===")
for name, v in results.items():
    print(f"  {name:14s} {v:.3f}")
