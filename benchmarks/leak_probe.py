"""RSS-growth attribution for the training loop (VERDICT r2 #10).

Runs N identical train steps on the selected backend and prints RSS
every 20 steps. Framework-side leaks (batch refs, optax states, cache
growth) would show on ANY backend; the axon tunnel plugin's staging
buffers only on the TPU. Usage:
  FEA_TPU_PLATFORM=cpu python _leakprobe.py 200
  python _leakprobe.py 200   (tpu)
"""
import os, sys, tempfile
import numpy as np

def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
from fea_tpu.datagen import generate_data
from fea_tpu.train import Trainer, TrainerConfig

td = tempfile.mkdtemp()
generate_data(data_dir=td, image_size=48, num_plates=2, conditions_per_plate=2,
              mesh_size=0.08, num_steps_per_condition=3, seed=11, verbose=False)
cfg = TrainerConfig(dataset_folder=td, sample_dataset_folder=td,
    dataset_image_size=32, train_batch_size=4, num_gradient_accumulation_steps=4,
    num_train_steps=n_steps, num_steps_per_condition=3,
    num_steps_per_sample_condition=3, conditions_per_plate=2,
    num_sample_conditions_per_plate=2, results_folder=td+"/r",
    skip_dataset_size_check=True, input_dim=16, progress_bar=False, seed=3)
t = Trainer(cfg)
state = t.state
base = None
import time
t0 = time.time()
for i in range(n_steps):
    batch = t._fetch_batch(i)
    state, loss = t._train_step(state, batch)
    if i == 4:
        float(loss); base = rss_mb()
        print(f"step {i}: rss {base:.0f} MB (baseline)", flush=True)
    elif i % 20 == 0 and i > 4:
        float(loss)
        r = rss_mb()
        print(f"step {i}: rss {r:.0f} MB (+{(r-base)/(i-4):.2f} MB/step)", flush=True)
print(f"done {n_steps} steps in {time.time()-t0:.0f}s; final +{(rss_mb()-base)/(n_steps-5):.2f} MB/step", flush=True)
