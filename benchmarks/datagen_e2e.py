"""End-to-end batched datagen bench: warmup + 2 timed 16-plate runs
with the per-stage breakdown (the same shape bench.py scores).
"""
import os, sys, time, tempfile
from fea_tpu.utils.device import enable_compilation_cache
enable_compilation_cache()
import jax
print("devices:", jax.devices(), file=sys.stderr)
from fea_tpu.datagen.batched import generate_data_batched
from fea_tpu.utils.profiling import StageTimer
common = dict(image_size=512, conditions_per_plate=4, mesh_size=1e-2,
              num_steps_per_condition=6, save_displacement=True, verbose=False)
with tempfile.TemporaryDirectory() as tmp:
    t0=time.time()
    generate_data_batched(data_dir=os.path.join(tmp,"warm"), num_plates=4, seed=7, **common)
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)
    for r in range(2):
        st = StageTimer()
        t0=time.time()
        stats = generate_data_batched(data_dir=os.path.join(tmp,f"t{r}"), num_plates=16, seed=1234, stage_timer=st, **common)
        w=time.time()-t0
        print(f"run {r}: {w:.1f}s  ({16/w*3600:.0f} plates/h)", file=sys.stderr)
        print(st.summary(), file=sys.stderr)
        print({k:v for k,v in stats.items() if k not in ("failed_lanes","converged_iters","stage_seconds")}, file=sys.stderr)
