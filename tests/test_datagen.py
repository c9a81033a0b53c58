import os

import numpy as np
import pytest

from fea_tpu.datagen import ConditionSampler, cluster_regions, generate_data
from fea_tpu.mesh import read_vtk, triangulate

UNIT_SQUARE = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])


def test_cluster_regions_partition():
    import random

    coords = np.random.default_rng(0).random((500, 2))
    for seed in range(5):
        regions = cluster_regions(coords, (1, 5), random.Random(seed))
        total = sum(len(r) for r in regions)
        assert total == 500
        all_ids = np.concatenate([r for r in regions if len(r)])
        assert len(np.unique(all_ids)) == 500


def test_condition_sampler_contract():
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.2)
    sampler = ConditionSampler(random_seed=0)
    conditions = sampler.sample(mesh, num_conditions=4)
    assert len(conditions) == 4
    for c in conditions:
        # at least one force
        assert len(c["point_forces"]) + len(c["edge_forces"]) >= 1
        # at least one constrained edge
        assert len(c["edge_constraints"]) >= 1
        # magnitudes in +-1..1000
        for _, (fx, fy) in c["point_forces"] + c["edge_forces"]:
            assert 1 <= abs(fx) <= 1000 and 1 <= abs(fy) <= 1000
        # material regions cover all nodes exactly
        total = sum(len(r) for _, r in c["material_regions"])
        assert total == mesh.num_nodes
        # distinct materials
        mats = [m for m, _ in c["material_regions"]]
        assert len(set(mats)) == len(mats)
        # constrained/force entities are disjoint
        constrained = set(c["point_constraints"])
        for e in c["edge_constraints"]:
            constrained.update(e)
        for v, _ in c["point_forces"]:
            assert v not in constrained

    # determinism
    sampler2 = ConditionSampler(random_seed=0)
    conditions2 = sampler2.sample(mesh, num_conditions=4)
    assert [c["point_constraints"] for c in conditions] == [
        c["point_constraints"] for c in conditions2
    ]


def test_generate_data_end_to_end(tmp_path):
    """Minimum end-to-end slice: one plate, two conditions, files in the
    reference's on-disk layout (SURVEY.md §1)."""
    data_dir = str(tmp_path / "data")
    stats = generate_data(
        data_dir=data_dir,
        image_size=96,
        num_plates=1,
        conditions_per_plate=2,
        mesh_size=0.06,
        holes_per_polygon_range=(0, 1),
        num_steps_per_condition=3,
        save_meshes=True,
        seed=123,
        verbose=False,
    )
    assert stats["plates"] == 1

    plate = os.path.join(data_dir, "1")
    assert os.path.isfile(os.path.join(plate, "input.png"))
    assert os.path.isfile(os.path.join(plate, "outline.png"))

    for cond in ("1", "2"):
        cdir = os.path.join(plate, cond)
        files = os.listdir(cdir)
        assert "magnitudes.txt" in files
        assert "materials.txt" in files
        assert "ranges.txt" in files
        assert "outputs_displacement_x.png" in files
        assert "outputs_displacement_y.png" in files
        assert any(f.startswith("regions_MaterialRegion") for f in files)
        assert any("Constraint" in f for f in files)
        # per-step ground-truth meshes
        for step in range(3):
            assert f"domain.{step}.vtk" in files

        # magnitudes.txt format parses with eval (the dataset contract)
        with open(os.path.join(cdir, "magnitudes.txt")) as f:
            for line in f.readlines():
                name, value = line.strip().split(":")
                v = eval(value)
                assert len(v) == 2
                assert name.startswith(("VertexForce", "EdgeForce"))

        # ranges.txt: (num_steps-1) * 2 displacement lines, x then y
        with open(os.path.join(cdir, "ranges.txt")) as f:
            lines = [l.strip().split(":") for l in f.readlines()]
        assert len(lines) == 2 * 2
        assert lines[0][0] == "displacement_x_1"
        assert lines[1][0] == "displacement_y_1"
        assert lines[2][0] == "displacement_x_2"

        # per-step VTK displacements scale linearly: u(step2) = 2*u(step1)
        u1 = read_vtk(os.path.join(cdir, "domain.1.vtk"))["u"]
        u2 = read_vtk(os.path.join(cdir, "domain.2.vtk"))["u"]
        np.testing.assert_allclose(u2, 2.0 * u1, rtol=1e-6, atol=1e-12)

        # ranges match the VTK extremes
        lo, hi = eval(lines[0][1])
        assert lo == pytest.approx(u1[:, 0].min(), rel=1e-6, abs=1e-12)
        assert hi == pytest.approx(u1[:, 0].max(), rel=1e-6, abs=1e-12)


def test_generate_data_batched(tmp_path):
    from fea_tpu.datagen.batched import generate_data_batched

    data_dir = str(tmp_path / "bdata")
    stats = generate_data_batched(
        data_dir=data_dir,
        image_size=96,
        num_plates=3,
        conditions_per_plate=2,
        mesh_size=0.06,
        holes_per_polygon_range=(0, 1),
        num_steps_per_condition=3,
        save_meshes=True,
        seed=42,
        batch_size=2,
        verbose=False,
    )
    assert stats["plates"] == 3
    for plate in ("1", "2", "3"):
        assert os.path.isfile(os.path.join(data_dir, plate, "input.png"))
        for cond in ("1", "2"):
            cdir = os.path.join(data_dir, plate, cond)
            assert os.path.isfile(os.path.join(cdir, "magnitudes.txt"))
            assert os.path.isfile(
                os.path.join(cdir, "outputs_displacement_x.png")
            )
            u1 = read_vtk(os.path.join(cdir, "domain.1.vtk"))["u"]
            assert np.isfinite(u1).all()


def test_solve_plate_group_sharded_over_mesh():
    """Multi-chip datagen surface: the grouped solve sharded over a 'dp'
    device mesh (8 virtual CPU devices) matches the unsharded result."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fea_tpu.datagen.batched import PlateSolver, solve_plate_group
    from fea_tpu.datagen.conditions import ConditionSampler
    from fea_tpu.parallel.mesh import make_mesh

    sampler = ConditionSampler(random_seed=11)
    payloads = []
    # 8 plates (one per device), same bucket by construction (same mesh_size)
    meshes = []
    for i in range(8):
        mesh = triangulate(UNIT_SQUARE, mesh_size=0.14 if i % 2 else 0.145)
        meshes.append(mesh)
    keys = set()
    for mesh in meshes:
        solver = PlateSolver(mesh, num_steps=2)
        keys.add(solver.shape_key)
        condition = None
        for _ in range(50):
            c = sampler.sample_one(mesh)
            p = solver.build_problem(c)
            if not p.structurally_singular():
                condition = (c, p)
                break
        assert condition is not None
        payloads.append((solver, [condition[1]]))
    assert len(keys) == 1, f"meshes landed in different buckets: {keys}"

    base = solve_plate_group(payloads)
    mesh_dp = make_mesh(8)
    sharding = NamedSharding(mesh_dp, P("dp"))
    sharded = solve_plate_group(payloads, sharding=sharding)
    compared = 0
    for b_res, s_res in zip(base, sharded):
        b, s = b_res[0], s_res[0]
        # near-singular conditions legitimately fail on both paths;
        # compare only solves that converge on both.
        if not (b.success and s.success):
            continue
        bu = np.asarray(b.displacements)
        su = np.asarray(s.displacements)
        scale = max(np.abs(bu).max(), 1e-12)
        assert np.abs(bu - su).max() / scale < 1e-4
        compared += 1
    assert compared >= 3, f"only {compared} mutually-converged plates"


def test_generate_data_start_plate_resume(tmp_path):
    """--start_plate resumes into the same directory (the reference's
    restartable datagen, generate_data.py:9-14)."""
    data_dir = str(tmp_path / "rdata")
    generate_data(
        data_dir=data_dir,
        image_size=64,
        num_plates=2,
        conditions_per_plate=1,
        mesh_size=0.08,
        holes_per_polygon_range=(0, 0),
        num_steps_per_condition=2,
        seed=50,
        verbose=False,
    )
    # resume from plate 2: only plate 2 rewritten, plate 1 untouched
    import time

    before = os.path.getmtime(os.path.join(data_dir, "1", "input.png"))
    generate_data(
        data_dir=data_dir,
        image_size=64,
        num_plates=2,
        start_plate=2,
        conditions_per_plate=1,
        mesh_size=0.08,
        holes_per_polygon_range=(0, 0),
        num_steps_per_condition=2,
        seed=51,
        verbose=False,
    )
    assert os.path.getmtime(os.path.join(data_dir, "1", "input.png")) == before
    assert os.path.isfile(os.path.join(data_dir, "2", "1", "magnitudes.txt"))


def test_forced_buckets_match_natural_solve():
    """RunningBuckets forces plates up to shared padded shapes so a chunk
    compiles once; padding is semantics-free, so a solve at a forced
    (larger) bucket must match the natural-bucket solve on the real
    nodes."""
    from fea_tpu.datagen.batched import PlateSolver
    from fea_tpu.datagen.conditions import ConditionSampler

    mesh = triangulate(UNIT_SQUARE, mesh_size=0.14)
    sampler = ConditionSampler(random_seed=3)
    natural = PlateSolver(mesh, num_steps=2)
    forced = PlateSolver(
        mesh,
        num_steps=2,
        node_bucket=natural.node_bucket * 2,
        tri_bucket=natural.tri_bucket * 2,
        min_incidence_degree=natural.slots_dev.shape[1] + 8,
    )
    assert forced.shape_key != natural.shape_key

    problems = []
    for _ in range(50):
        p = natural.build_problem(sampler.sample_one(mesh))
        if not p.structurally_singular():
            problems.append(p)
        if len(problems) == 2:
            break
    assert len(problems) == 2

    res_n = natural.fetch_batch(natural.dispatch_batch(problems))
    res_f = forced.fetch_batch(forced.dispatch_batch(problems))
    compared = 0
    for rn, rf in zip(res_n, res_f):
        if not (rn.success and rf.success):
            continue
        un, uf = np.asarray(rn.displacements), np.asarray(rf.displacements)
        assert un.shape == uf.shape  # both sliced back to real nodes
        scale = max(np.abs(un).max(), 1e-12)
        assert np.abs(un - uf).max() / scale < 1e-5
        compared += 1
    assert compared >= 1


def test_warm_start_continuation_matches_full_solve():
    """The scheduler's continuation path: a solve cut off by a small
    per-dispatch iteration budget, re-dispatched with x0 = its partial
    solution, must converge to the full-budget answer (warm restarts
    recompute the true residual, so chained budgets == one long solve)."""
    from fea_tpu.datagen.batched import PlateSolver, solve_plate_group
    from fea_tpu.datagen.conditions import ConditionSampler

    mesh = triangulate(UNIT_SQUARE, mesh_size=0.14)
    sampler = ConditionSampler(random_seed=5)
    solver = PlateSolver(mesh, num_steps=2)
    problem = None
    for _ in range(50):
        p = solver.build_problem(sampler.sample_one(mesh))
        if not p.structurally_singular():
            problem = p
            break
    assert problem is not None

    full = solve_plate_group([(solver, [problem])])[0][0]
    assert full.success

    # Budget so small the first dispatch cannot converge, then continue.
    partial = solve_plate_group([(solver, [problem])], max_iters=4)[0][0]
    warm = np.asarray(partial.displacements[-1], np.float32)
    chained = partial
    for _ in range(40):
        if chained.success:
            break
        chained = solve_plate_group(
            [(solver, [problem])], max_iters=40, x0s=[[warm]]
        )[0][0]
        warm = np.asarray(chained.displacements[-1], np.float32)
    assert chained.success, "continuation never converged"

    uf = np.asarray(full.displacements)
    uc = np.asarray(chained.displacements)
    scale = max(np.abs(uf).max(), 1e-12)
    assert np.abs(uf - uc).max() / scale < 1e-3


def test_batched_continuation_end_to_end(tmp_path, monkeypatch):
    """With a deliberately tiny per-dispatch budget, most lanes cannot
    converge in one chunk — the scheduler must finish every plate via
    warm-start continuations, and the outputs must be finite and
    complete (no resample storm: the conditions are valid, just slow
    at this budget)."""
    import fea_tpu.datagen.batched as B

    monkeypatch.setattr(B, "ITERS_PER_DISPATCH", 40)
    monkeypatch.setattr(B, "RESTARTS_PER_DISPATCH", 1)
    monkeypatch.setattr(B, "MAX_CONTINUATIONS", 50)
    # a 40-iteration dispatch often improves rnorm by <30%: disable the
    # cross-dispatch progress cut so slow-but-steady lanes keep going
    monkeypatch.setattr(B, "CONTINUE_PROGRESS_FACTOR", 1.0)

    data_dir = str(tmp_path / "cdata")
    stats = B.generate_data_batched(
        data_dir=data_dir,
        image_size=96,
        num_plates=2,
        conditions_per_plate=2,
        mesh_size=0.06,
        holes_per_polygon_range=(0, 1),
        num_steps_per_condition=3,
        save_meshes=True,
        seed=42,
        batch_size=2,
        verbose=False,
    )
    assert stats["plates"] == 2
    assert stats["continuations"] > 0, "tiny budget must force continuations"
    for plate in ("1", "2"):
        for cond in ("1", "2"):
            cdir = os.path.join(data_dir, plate, cond)
            u1 = read_vtk(os.path.join(cdir, "domain.1.vtk"))["u"]
            assert np.isfinite(u1).all()
            assert np.abs(u1).max() > 0


def test_direct_solve_matches_device_kernel():
    """fem/direct.py (the f64 SuperLU fallback lane) must satisfy the
    same SolveResult contract as the device kernel: identical
    displacements (to solver tolerance), el_avg strain/stress, and the
    linear load ramp u(t_k) = t_k * u1."""
    from fea_tpu.datagen.conditions import ConditionSampler
    from fea_tpu.fem.direct import direct_solve
    from fea_tpu.fem.problem import StaticProblem
    from fea_tpu.geometry import GeometrySampler
    from fea_tpu.mesh.mesher import triangulate_polygon

    gs = GeometrySampler(random_seed=7)
    cs = ConditionSampler(random_seed=7)
    poly = gs.generate()
    mesh = triangulate_polygon(poly, mesh_size=0.08)
    problem = None
    for c in cs.sample(mesh, 8):
        p = StaticProblem.from_condition(
            mesh,
            material_regions=c["material_regions"],
            point_constraints=c["point_constraints"],
            edge_constraints=c["edge_constraints"],
            point_forces=c["point_forces"],
            edge_forces=c["edge_forces"],
            num_steps=4,
        )
        if not p.structurally_singular():
            problem = p
            break
    assert problem is not None
    direct = direct_solve(problem)
    assert direct is not None
    assert direct.success
    n, m = len(mesh.coords), len(mesh.triangles)
    assert direct.displacements.shape == (4, n, 2)
    assert direct.strain.shape == (4, m, 3)
    assert direct.stress.shape == (4, m, 3)
    # linear ramp: step 0 is zero load, u(t) = t * u1
    np.testing.assert_allclose(direct.displacements[0], 0.0, atol=0)
    t = np.linspace(0.0, 1.0, 4)
    for k in range(4):
        np.testing.assert_allclose(
            direct.displacements[k],
            t[k] * direct.displacements[-1],
            rtol=1e-12,
            atol=1e-15,
        )
    # agreement with the device CG kernel (f32 + refinement tolerance)
    device = problem.solve()
    assert device.success
    u_dev = np.asarray(device.displacements[-1])
    u_dir = direct.displacements[-1]
    scale = max(np.abs(u_dir).max(), 1e-30)
    assert np.abs(u_dev - u_dir).max() / scale < 1e-3
    sig_dev = np.asarray(device.stress[-1])
    sig_scale = max(np.abs(direct.stress[-1]).max(), 1e-30)
    assert np.abs(sig_dev - direct.stress[-1]).max() / sig_scale < 1e-2


def test_direct_fallback_recovers_terminal_cg_failures(
    tmp_path, monkeypatch
):
    """With a starvation CG budget (1 iteration, no continuations) every
    lane terminally fails CG — the host f64 SuperLU fallback lane must
    recover them all so NO condition is resampled (reference parity:
    fea_analysis.py:455-461 keeps every finite direct solve) and the
    written outputs must be finite and real."""
    import fea_tpu.datagen.batched as B

    monkeypatch.setattr(B, "ITERS_PER_DISPATCH", 1)
    monkeypatch.setattr(B, "MAX_CONTINUATIONS", 0)
    assert B.DIRECT_FALLBACK  # default-on

    data_dir = str(tmp_path / "ddata")
    stats = B.generate_data_batched(
        data_dir=data_dir,
        image_size=96,
        num_plates=2,
        conditions_per_plate=2,
        mesh_size=0.06,
        holes_per_polygon_range=(0, 1),
        num_steps_per_condition=3,
        save_meshes=True,
        seed=42,
        batch_size=2,
        verbose=False,
    )
    assert stats["plates"] == 2
    assert stats["cg_failures"] >= 4, "starvation budget must fail CG"
    assert stats["direct_fallbacks"] == stats["cg_failures"]
    assert stats["cg_resamples"] == 0, (
        "every CG failure is oracle-solvable here; the fallback lane "
        "must keep the condition instead of resampling"
    )
    for plate in ("1", "2"):
        for cond in ("1", "2"):
            cdir = os.path.join(data_dir, plate, cond)
            u1 = read_vtk(os.path.join(cdir, "domain.1.vtk"))["u"]
            assert np.isfinite(u1).all()
            assert np.abs(u1).max() > 0
            # ranges.txt must reflect the fallback solution (the dataset
            # decode contract), not zeros from the failed CG lane
            with open(os.path.join(cdir, "ranges.txt")) as f:
                lines = [l.strip().split(":") for l in f.readlines()]
            lo, hi = eval(lines[0][1])
            assert np.isfinite([lo, hi]).all()


def test_flat_chunk_kernel_matches_vmapped(monkeypatch):
    """The flat super-mesh chunk kernel (fem/flatgroup.py: plates folded
    into one block-diagonal system, segmented CG) must match the
    two-level vmapped kernel on the same plate group — same contract,
    different lowering."""
    from fea_tpu.datagen.batched import PlateSolver, solve_plate_group
    from fea_tpu.datagen.conditions import ConditionSampler

    sampler = ConditionSampler(random_seed=7)
    payloads = []
    for ms in (0.14, 0.145, 0.15):
        mesh = triangulate(UNIT_SQUARE, mesh_size=ms)
        solver = PlateSolver(mesh, num_steps=2)
        problems = []
        for _ in range(60):
            p = solver.build_problem(sampler.sample_one(mesh))
            if not p.structurally_singular():
                problems.append(p)
            if len(problems) == 2:
                break
        assert len(problems) == 2
        payloads.append((solver, problems))
    assert len({s.shape_key for s, _ in payloads}) == 1

    monkeypatch.setenv("FEA_TPU_FLAT_CHUNK", "0")
    base = solve_plate_group(payloads)
    monkeypatch.setenv("FEA_TPU_FLAT_CHUNK", "1")
    flat = solve_plate_group(payloads)

    compared = 0
    for b_plate, f_plate in zip(base, flat):
        for b, f in zip(b_plate, f_plate):
            if not (b.success and f.success):
                continue
            bu = np.asarray(b.displacements)
            fu = np.asarray(f.displacements)
            assert bu.shape == fu.shape
            scale = max(np.abs(bu).max(), 1e-12)
            assert np.abs(bu - fu).max() / scale < 1e-4
            # cell fields ride the same packed rows — check strain too
            bs, fs = np.asarray(b.strain), np.asarray(f.strain)
            sscale = max(np.abs(bs).max(), 1e-12)
            assert np.abs(bs - fs).max() / sscale < 1e-3
            compared += 1
    assert compared >= 4, f"only {compared} mutually-converged lanes"
