import jax.numpy as jnp
import numpy as np
import pytest

from fea_tpu.fem import StaticProblem, element_stiffness, plane_strain_stiffness
from fea_tpu.fem.assembly import (
    apply_element_stiffness,
    assemble_dense,
    assemble_scipy_csr,
    build_incidence,
)
from fea_tpu.fem.problem import element_materials
from fea_tpu.fem.solver import extract_diagonal, pcg_solve
from fea_tpu.mesh import read_medit_mesh, read_vtk, triangulate

CANTILEVER_DIR = "/root/reference/applications/cantilever"


def test_plane_strain_matches_sfepy_formula():
    D = np.asarray(plane_strain_stiffness(210000.0, 0.3))
    lam = 210000 * 0.3 / (1.3 * 0.4)
    mu = 210000 / 2.6
    expected = np.array(
        [[lam + 2 * mu, lam, 0], [lam, lam + 2 * mu, 0], [0, 0, mu]]
    )
    np.testing.assert_allclose(D, expected, rtol=1e-12)


def test_element_stiffness_rigid_body_modes():
    coords = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.3, 0.9], [1.2, 1.1]])
    tris = jnp.array([[0, 1, 2], [1, 3, 2]], dtype=jnp.int32)
    D = plane_strain_stiffness(1000.0, 0.3)
    Ke, B, area = element_stiffness(coords, tris, D)
    assert (np.asarray(area) > 0).all()
    Ke_m = np.asarray(Ke).transpose(2, 0, 1)  # element-minor (6,6,M) -> (M,6,6)
    # symmetry
    np.testing.assert_allclose(Ke_m, Ke_m.transpose(0, 2, 1), atol=1e-9)
    # translation x, translation y, rotation are zero-energy
    for e in range(2):
        p = np.asarray(coords)[np.asarray(tris)[e]]
        tx = np.tile([1.0, 0.0], 3)
        ty = np.tile([0.0, 1.0], 3)
        rot = np.stack([-p[:, 1], p[:, 0]], axis=1).reshape(-1)
        for mode in (tx, ty, rot):
            np.testing.assert_allclose(Ke_m[e] @ mode, 0.0, atol=1e-6)


def test_matrix_free_matches_dense():
    mesh = triangulate(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]), mesh_size=0.25
    )
    D = plane_strain_stiffness(50000.0, 0.25)
    coords = jnp.asarray(mesh.coords)
    tris = jnp.asarray(mesh.triangles, jnp.int32)
    Ke, _, _ = element_stiffness(coords, tris, D)
    inc = build_incidence(mesh.triangles, mesh.num_nodes)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(mesh.num_nodes, 2)))

    y1 = apply_element_stiffness(Ke, tris, inc.slots, u)
    Kd = assemble_dense(Ke, tris, mesh.num_nodes)
    y2 = (Kd @ u.reshape(-1)).reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-9, atol=1e-9)

    # diagonal extraction
    diag = extract_diagonal(Ke, tris, mesh.num_nodes)
    np.testing.assert_allclose(
        np.asarray(diag).reshape(-1), np.asarray(jnp.diag(Kd)), rtol=1e-9
    )


def test_pcg_matches_direct_solve():
    mesh = triangulate(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]), mesh_size=0.1
    )
    D = plane_strain_stiffness(210000.0, 0.3)
    coords = jnp.asarray(mesh.coords)
    tris = jnp.asarray(mesh.triangles, jnp.int32)
    Ke, _, _ = element_stiffness(coords, tris, D)
    inc = build_incidence(mesh.triangles, mesh.num_nodes)
    diag = extract_diagonal(Ke, tris, mesh.num_nodes)

    fixed = np.abs(mesh.coords[:, 0]) < 1e-12  # left edge
    free = jnp.asarray(~fixed, jnp.float64)[:, None].repeat(2, axis=1)
    b = np.zeros((mesh.num_nodes, 2))
    tip = int(np.argmax(mesh.coords[:, 0] + mesh.coords[:, 1]))
    b[tip] = (0.0, -1000.0)
    b = jnp.asarray(b)

    res = pcg_solve(
        lambda u: apply_element_stiffness(Ke, tris, inc.slots, u),
        b, diag, free, tol=1e-12, max_iters=5000,
    )
    assert bool(res.converged)

    # direct reference
    import scipy.sparse.linalg as spla

    K = assemble_scipy_csr(
        np.asarray(Ke).transpose(2, 0, 1), mesh.triangles, mesh.num_nodes
    )
    fixed_dofs = np.repeat(fixed, 2)
    K = K.tolil()
    for d in np.where(fixed_dofs)[0]:
        K[d, :] = 0
        K[:, d] = 0
        K[d, d] = 1.0
    x = spla.spsolve(K.tocsr(), np.asarray(b).reshape(-1))
    np.testing.assert_allclose(
        np.asarray(res.x).reshape(-1), x, atol=1e-6 * np.abs(x).max()
    )


def _facet_constrained_nodes(coords, triangles, candidate_mask):
    """sfepy facet-region rule: vertices of facets whose endpoints are both
    in the candidate set (reference cantilever.py:45 'vertices in (x < 0.01)'
    with kind 'facet')."""
    edges = set()
    for t in triangles:
        for e in range(3):
            a, b = int(t[e]), int(t[(e + 1) % 3])
            edges.add((min(a, b), max(a, b)))
    keep = np.zeros(len(coords), dtype=bool)
    for a, b in edges:
        if candidate_mask[a] and candidate_mask[b]:
            keep[a] = keep[b] = True
    return keep


def test_cantilever_golden_parity():
    """Solve the reference's checked-in cantilever and match its sfepy
    solution (applications/cantilever/cantilever.{mesh,vtk}) to <=1e-5 MAE
    relative to the displacement scale."""
    coords, tris = read_medit_mesh(f"{CANTILEVER_DIR}/cantilever.mesh")
    gt = read_vtk(f"{CANTILEVER_DIR}/cantilever.vtk")["u"][:, :2]

    candidate = coords[:, 0] < 0.01
    fixed = _facet_constrained_nodes(coords, tris, candidate)
    loads = np.zeros((len(coords), 2))
    loads[3] = (0.0, -1000.0)  # 'Force' region: vertex 3, Load.val (0, -1000)

    problem = StaticProblem(
        coords=coords,
        triangles=tris,
        young=np.full(len(tris), 210000.0),
        poisson=np.full(len(tris), 0.3),
        fixed_nodes=fixed,
        loads=loads,
        num_steps=2,
    )
    res = problem.solve(tol=1e-10, max_iters=40000)
    assert res.success
    u = np.asarray(res.displacements[-1])

    scale = np.abs(gt).max()
    mae = np.abs(u - gt).mean()
    assert mae / scale < 1e-5, f"relative MAE {mae / scale:.2e}"
    assert mae < 1e-5 * max(scale, 1.0), f"MAE {mae:.2e} vs scale {scale:.2e}"


def test_element_materials_strict_cover():
    tris = np.array([[0, 1, 2], [1, 3, 2]])
    regions = [
        ((100.0, 0.3), np.array([0, 1, 2])),
        ((200.0, 0.4), np.array([3])),
    ]
    young, poisson = element_materials(tris, 4, regions)
    assert young[0] == 100.0
    assert young[1] == 0.0  # straddling cell uncovered, sfepy-style


def test_linear_scaling_of_steps():
    mesh = triangulate(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]), mesh_size=0.2
    )
    fixed = np.abs(mesh.coords[:, 1]) < 1e-12
    loads = np.zeros((mesh.num_nodes, 2))
    top = int(np.argmax(mesh.coords[:, 1]))
    loads[top] = (50.0, -100.0)
    problem = StaticProblem(
        coords=mesh.coords,
        triangles=mesh.triangles,
        young=np.full(mesh.num_triangles, 1000.0),
        poisson=np.full(mesh.num_triangles, 0.3),
        fixed_nodes=fixed,
        loads=loads,
        num_steps=5,
    )
    res = problem.solve()
    assert res.success
    u = np.asarray(res.displacements)
    np.testing.assert_allclose(u[0], 0.0)
    np.testing.assert_allclose(u[2], 0.5 * u[4], rtol=1e-9)
    assert res.strain.shape == (5, mesh.num_triangles, 3)
    assert res.stress.shape == (5, mesh.num_triangles, 3)


def test_padded_solve_matches_unpadded():
    from fea_tpu.datagen.pipeline import next_bucket
    from fea_tpu.mesh import triangulate

    mesh = triangulate(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]), mesh_size=0.15
    )
    fixed = np.abs(mesh.coords[:, 1]) < 1e-12
    loads = np.zeros((mesh.num_nodes, 2))
    top = int(np.argmax(mesh.coords[:, 1]))
    loads[top] = (30.0, -70.0)
    problem = StaticProblem(
        coords=mesh.coords,
        triangles=mesh.triangles,
        young=np.full(mesh.num_triangles, 50000.0),
        poisson=np.full(mesh.num_triangles, 0.3),
        fixed_nodes=fixed,
        loads=loads,
        num_steps=3,
    )
    res = problem.solve()
    padded = problem.padded(
        next_bucket(mesh.num_nodes + 3), next_bucket(mesh.num_triangles)
    )
    res_p = padded.solve()
    assert res.success and res_p.success
    np.testing.assert_allclose(
        np.asarray(res_p.displacements)[:, : mesh.num_nodes],
        np.asarray(res.displacements),
        atol=1e-8,
    )
    # padded tail is exactly zero
    assert np.abs(np.asarray(res_p.displacements)[:, mesh.num_nodes:]).max() == 0


def test_solve_refined_cantilever_parity():
    """Mixed-precision refinement (f32 inner CG + f64 host residuals)
    reaches direct-solver parity even with f32 device kernels."""
    from fea_tpu.datagen.pipeline import next_bucket
    from fea_tpu.fem.problem import solve_refined

    coords, tris = read_medit_mesh(f"{CANTILEVER_DIR}/cantilever.mesh")
    gt = read_vtk(f"{CANTILEVER_DIR}/cantilever.vtk")["u"][:, :2]
    candidate = coords[:, 0] < 0.01
    fixed = _facet_constrained_nodes(coords, tris, candidate)
    loads = np.zeros((len(coords), 2))
    loads[3] = (0.0, -1000.0)
    problem = StaticProblem(
        coords=coords,
        triangles=tris,
        young=np.full(len(tris), 210000.0),
        poisson=np.full(len(tris), 0.3),
        fixed_nodes=fixed,
        loads=loads,
        num_steps=2,
    )
    res = solve_refined(
        problem,
        pad_buckets=(next_bucket(len(coords) + 3), next_bucket(len(tris))),
    )
    u = np.asarray(res.displacements[-1])
    rel_mae = np.abs(u - gt).mean() / np.abs(gt).max()
    assert rel_mae < 1e-8, f"relative MAE {rel_mae:.2e}"


def test_per_step_solve_mode_matches_scaled():
    """The reference's per-step time-stepping solve (one solve per ramped
    load) agrees with the exploit-linearity default (solve once, scale)."""
    mesh = triangulate(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]), mesh_size=0.2
    )
    fixed = np.abs(mesh.coords[:, 1]) < 1e-12
    loads = np.zeros((mesh.num_nodes, 2))
    top = int(np.argmax(mesh.coords[:, 1]))
    loads[top] = (40.0, -90.0)
    problem = StaticProblem(
        coords=mesh.coords,
        triangles=mesh.triangles,
        young=np.full(mesh.num_triangles, 2000.0),
        poisson=np.full(mesh.num_triangles, 0.3),
        fixed_nodes=fixed,
        loads=loads,
        num_steps=4,
    )
    fast = problem.solve()
    per_step = problem.solve(per_step_solves=True)
    assert per_step.success
    np.testing.assert_allclose(
        np.asarray(per_step.displacements),
        np.asarray(fast.displacements),
        atol=1e-8,
    )


def test_structurally_singular_detects_hinge():
    """A stiff component pinned at exactly one node keeps a zero-energy
    rigid rotation about that node — singular (the reference's LU NaNs or
    emits garbage on these); two distinct pinned nodes kill all 2D rigid
    modes."""
    mesh = triangulate(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]), mesh_size=0.3
    )
    loads = np.zeros((mesh.num_nodes, 2))
    loads[int(np.argmax(mesh.coords[:, 0]))] = (0.0, -10.0)

    def problem(fixed):
        return StaticProblem(
            coords=mesh.coords,
            triangles=mesh.triangles,
            young=np.full(mesh.num_triangles, 1000.0),
            poisson=np.full(mesh.num_triangles, 0.3),
            fixed_nodes=fixed,
            loads=loads,
            num_steps=2,
        )

    one = np.zeros(mesh.num_nodes, dtype=bool)
    one[0] = True
    assert problem(one).structurally_singular()  # hinge

    two = one.copy()
    two[1] = True
    assert not problem(two).structurally_singular()

    none = np.zeros(mesh.num_nodes, dtype=bool)
    assert problem(none).structurally_singular()  # floating island


def test_structural_hinge_detection():
    """>=2 fixed nodes per stiff component is necessary but not
    sufficient: two stiff bodies sharing exactly one node (a cut vertex)
    leave a zero-energy rotation of the side carrying no fixed node
    (reference hits these as LU NaNs, fea_analysis.py:455-461; we screen
    them host-side via cdt.cpp fea_hinge_singular)."""
    import numpy as np

    from fea_tpu.fem import StaticProblem

    coords = np.array(
        [[0.0, 0.0], [1.0, 0.0], [0.5, 1.0], [1.5, 2.0], [0.0, 2.0]]
    )
    bowtie = np.array([[0, 1, 2], [2, 3, 4]])
    young = np.full(2, 1000.0)
    poisson = np.full(2, 0.3)
    loads = np.zeros((5, 2))

    def make(fixed_ids, tris=bowtie, nn=5):
        fixed = np.zeros(nn, bool)
        fixed[list(fixed_ids)] = True
        return StaticProblem(
            coords=coords[:nn], triangles=tris,
            young=young[: len(tris)], poisson=poisson[: len(tris)],
            fixed_nodes=fixed, loads=loads[:nn], num_steps=2,
        )

    # both fixed nodes on one wing: the other wing rotates about node 2
    assert make({0, 1}).structurally_singular()
    # a fixed node on each side of the hinge: generically rigid
    assert not make({0, 1, 3}).structurally_singular()
    # edge-connected pair (no cut vertex): fine with 2 fixed nodes
    quad = np.array([[0, 1, 2], [1, 3, 2]])
    coords4 = coords[:4]
    p = StaticProblem(
        coords=coords4, triangles=quad, young=young, poisson=poisson,
        fixed_nodes=np.array([True, True, False, False]),
        loads=np.zeros((4, 2)), num_steps=2,
    )
    assert not p.structurally_singular()
