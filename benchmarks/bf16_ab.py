"""300-step loss-curve + throughput A/B: f32 vs bf16 compute at the
flagship config (256px, batch 16), fed by the production condition
store. The keep/reject evidence for --compute_dtype bfloat16
(VERDICT r2 #6). Usage: python benchmarks/bf16_ab.py [store_dir] [steps]
"""
import sys, time
import numpy as np
from fea_tpu.utils.device import enable_compilation_cache
enable_compilation_cache()
import jax
from fea_tpu.train import Trainer, TrainerConfig

store = sys.argv[1] if len(sys.argv) > 1 else "runs3/store256"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300

curves = {}
rates = {}
for dtype in (None, "bfloat16"):
    cfg = TrainerConfig(
        dataset_store=store, dataset_image_size=256, train_batch_size=16,
        num_train_steps=n_steps, num_steps_per_condition=6,
        num_steps_per_sample_condition=6, conditions_per_plate=4,
        results_folder="/tmp/bf16ab", skip_dataset_size_check=True,
        progress_bar=False, compute_dtype=dtype, seed=42,
        sample_dataset_folder="unused", num_sample_conditions_per_plate=1,
    )
    # the sample dataset is unused for pure stepping: reuse the store
    from fea_tpu.data.store import StoredFEADataset

    t = Trainer(cfg, sample_dataset=StoredFEADataset(store))
    state = t.state
    losses = []
    # warm + compile
    batch = t._fetch_batch(0)
    state, l0 = t._train_step(state, batch)
    jax.block_until_ready(state.params)
    t0 = time.time()
    for i in range(1, n_steps):
        batch = t._fetch_batch(i)
        state, loss = t._train_step(state, batch)
        losses.append(float(loss))
        if i % 50 == 0:
            print(f"[{dtype}] step {i} loss {np.mean(losses[-50:]):.4f}",
                  file=sys.stderr, flush=True)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    curves[str(dtype)] = losses
    rates[str(dtype)] = (n_steps - 1) / dt
    print(f"[{dtype}] {rates[str(dtype)]:.3f} steps/s", file=sys.stderr, flush=True)

f32, b16 = np.array(curves["None"]), np.array(curves["bfloat16"])
k = min(100, len(f32) // 3)
print({
    "steps": n_steps,
    "steps_per_s_f32": round(rates["None"], 3),
    "steps_per_s_bf16": round(rates["bfloat16"], 3),
    "speedup": round(rates["bfloat16"] / rates["None"], 3),
    "final_loss_f32": round(float(f32[-k:].mean()), 5),
    "final_loss_bf16": round(float(b16[-k:].mean()), 5),
    "mean_abs_diff_last": round(float(np.abs(f32[-k:] - b16[-k:]).mean()), 5),
})
