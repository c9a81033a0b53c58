import os

import numpy as np
import pytest

from fea_tpu.apps import APPLICATIONS, run_application
from fea_tpu.apps.runner import build_problem, load_app_mesh
from fea_tpu.metrics import accuracy_for_one_sample, dataset_displacement_stats
from fea_tpu.mesh import read_vtk

REF = "/root/reference/applications"


GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("name", ["cantilever", "shearblade", "gusset"])
def test_app_parity_vs_reference_vtk(name):
    """Solve each sfepy-run application on its checked-in mesh and match
    the reference's solved VTK to <=1e-5 relative MAE.

    The reference ships no gusset.vtk, so gusset is checked against our
    own golden (tests/goldens/gusset_golden.npz): an independent f64
    SciPy direct solve of the exactly-assembled CSR on the reference's
    gusset.mesh (rel residual 2.6e-13; see gusset/gusset.py:38-85 for the
    problem definition)."""
    ref_vtk = f"{REF}/{name}/{name}.vtk"
    if os.path.isfile(ref_vtk):
        gt = read_vtk(ref_vtk)["u"][:, :2]
    else:
        golden = np.load(os.path.join(GOLDENS, f"{name}_golden.npz"))
        gt = golden["u"]
    spec = APPLICATIONS[name]
    mesh = load_app_mesh(spec)
    problem = build_problem(spec, mesh)
    assert len(gt) == mesh.num_nodes
    res = problem.solve(tol=1e-12, max_iters=60000)
    assert res.success
    u = np.asarray(res.displacements[-1])
    scale = np.abs(gt).max()
    rel_mae = np.abs(u - gt).mean() / scale
    assert rel_mae < 1e-5, f"{name}: relative MAE {rel_mae:.2e}"


def test_composite_app_is_singular_like_reference():
    """The composite app's disjoint material regions decouple under the
    strict sfepy cell-region semantics; the reference's own fixture shows
    the resulting garbage solve (ranges.txt magnitudes ~1e10). We detect
    it as structurally singular instead of emitting garbage."""
    spec = APPLICATIONS["composite"]
    mesh = load_app_mesh(spec)
    problem = build_problem(spec, mesh)
    assert problem.structurally_singular()


def test_run_application_end_to_end(tmp_path):
    out = run_application(
        "cantilever", output_dir=str(tmp_path), image_size=256
    )
    assert out["converged"]
    for f in (
        "geometry.png",
        "constraint.png",
        "force.png",
        "displacement_x.png",
        "displacement_y.png",
        "cantilever.vtk",
        "ranges.txt",
    ):
        assert os.path.isfile(os.path.join(str(tmp_path), f)), f
    # raster -> metrics roundtrip error: interior nodes are near-exact; the
    # mean is dominated by geometry-boundary nodes whose bilinear corners
    # fall on background pixels — inherent to the reference's sampler
    # design (accuracy_function.py:59-102 nudge heuristic), and part of
    # its reported MAE too.
    assert out["raster_roundtrip_mae"] < 1e-2


def test_metrics_roundtrip_on_generated_dataset(tmp_path):
    """Rasterized ground-truth displacement re-sampled at mesh nodes by
    the metrics pipeline recovers the nodal values (self-consistency of
    raster + metrics, bounded by the 8-bit decode scale)."""
    from fea_tpu.datagen import generate_data

    data_dir = str(tmp_path / "data")
    generate_data(
        data_dir=data_dir,
        image_size=256,
        num_plates=1,
        conditions_per_plate=1,
        mesh_size=0.05,
        holes_per_polygon_range=(0, 0),
        num_steps_per_condition=2,
        save_meshes=True,
        seed=21,
        verbose=False,
    )
    mae, mse, rmse = accuracy_for_one_sample(
        os.path.join(data_dir, "1", "1", "domain.1.vtk"),
        os.path.join(data_dir, "1", "1", "outputs_displacement_x.png"),
        os.path.join(data_dir, "1", "1", "outputs_displacement_y.png"),
        os.path.join(data_dir, "1", "input.png"),
        image_size=256,
    )
    # outputs use the per-image auto range (not ±0.05), so the metrics
    # decode mismatch dominates; just require a sane bounded error
    assert np.isfinite(mae) and mae < 0.05

    stats = dataset_displacement_stats(data_dir)
    assert stats["num_files"] == 2
    assert np.isfinite(stats["max"])


def test_composite_coupled_variant_is_solvable():
    """The interface-overlap composite variant couples the two materials
    and solves to a physical displacement scale (unlike the reference's
    decoupled composite, whose own fixture shows ~1e10 garbage)."""
    spec = APPLICATIONS["composite_coupled"]
    mesh = load_app_mesh(spec)
    problem = build_problem(spec, mesh)
    assert not problem.structurally_singular()
    res = problem.solve(max_iters=40000)
    assert res.success
    u = np.asarray(res.displacements[-1])
    assert np.abs(u).max() < 1.0  # physical scale, not 1e10 garbage
    assert np.abs(u).max() > 1e-6
