"""A/B the datagen chunk kernel variants on the current backend.

Dispatches identical 8-plate x 4-condition chunks and prints
dispatch/exec/fetch walls per group size. Toggle variants via env:
  FEA_TPU_FLAT_CHUNK=0  two-level vmap kernel (baseline)
  FEA_TPU_BANDED=0      flat kernel, incidence gather operator
  (default)             flat kernel + RCM-banded MXU operator

Measured on the tunneled v5e (round 3, 32-lane chunks, best of
back-to-back runs): vmap 9.0 s -> flat 6.6 s -> flat+banded 3.8 s.
"""
import sys, time
import numpy as np
from fea_tpu.utils.device import enable_compilation_cache
enable_compilation_cache()
import jax
from fea_tpu.geometry import GeometrySampler
from fea_tpu.mesh import triangulate_polygon
from fea_tpu.datagen.conditions import ConditionSampler
from fea_tpu.datagen.batched import (
    PlateSolver, RunningBuckets, dispatch_plate_group,
    ITERS_PER_DISPATCH, RESTARTS_PER_DISPATCH,
)
from fea_tpu.fem.problem import StaticProblem

gs = GeometrySampler(random_seed=5)
cs = ConditionSampler(random_seed=6)
buckets = RunningBuckets()
jobs = []
while len(jobs) < 8:
    try:
        poly = gs.generate(); mesh = triangulate_polygon(poly, mesh_size=1e-2)
        conds = cs.sample(mesh, 4)
    except Exception:
        continue
    pairs = []
    ok = True
    for c in conds:
        p = StaticProblem.from_condition(
            mesh, material_regions=c["material_regions"],
            point_constraints=c["point_constraints"],
            edge_constraints=c["edge_constraints"],
            point_forces=c["point_forces"], edge_forces=c["edge_forces"],
            num_steps=6)
        if p.structurally_singular():
            ok = False
            break
        pairs.append(p)
    if not ok:
        continue
    jobs.append((mesh, pairs))
buckets.update(m for m, _ in jobs)
print("buckets:", buckets.node, buckets.tri, file=sys.stderr)
solvers = [PlateSolver(m, 6, node_bucket=buckets.node, tri_bucket=buckets.tri,
                       include_cell_fields=False, max_iters=ITERS_PER_DISPATCH,
                       restarts=RESTARTS_PER_DISPATCH) for m, _ in jobs]
wmax = max(s.slots_dev.shape[1] for s in solvers)
hmax = max(s.band_hb for s in solvers)
solvers = [PlateSolver(m, 6, node_bucket=buckets.node, tri_bucket=buckets.tri,
                       min_incidence_degree=wmax,
                       band_hb=hmax if min(s.band_hb for s in solvers) > 0 else -1,
                       include_cell_fields=False,
                       max_iters=ITERS_PER_DISPATCH,
                       restarts=RESTARTS_PER_DISPATCH) for m, _ in jobs]
payloads = [(s, pairs) for s, (_, pairs) in zip(solvers, jobs)]

for n_plates in (8, 8, 4, 2, 1, 8, 8):
    pl = payloads[:n_plates]
    t0 = time.time()
    tok = dispatch_plate_group(pl, pad_group_to=n_plates)
    t1 = time.time()
    tok.block_until_ready()
    t2 = time.time()
    np.asarray(tok)
    t3 = time.time()
    print(f"plates={n_plates} lanes={4*n_plates}: dispatch {t1-t0:.2f}s "
          f"exec {t2-t1:.2f}s fetch {t3-t2:.2f}s total {t3-t0:.2f}s",
          file=sys.stderr)
