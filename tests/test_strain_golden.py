"""Strain/stress golden parity on the cantilever fixture.

The reference computes el_avg Cauchy strain/stress per time step
(`ev_cauchy_strain`/`ev_cauchy_stress`, datagen/fea_analysis.py:397-416)
and renders them as flat-shaded cell images (:526-565). Displacement
already has golden parity vs cantilever.vtk (tests/test_fem.py); this
module closes the same loop for the cell fields: the library's
strain/stress are checked against an INDEPENDENT float64 computation
(shape-function gradients via a 3x3 linear solve per element — a
different formulation than fem/elasticity.py's closed-form b/c
coefficients), and `cell_field_image` is checked end-to-end against a
brute-force point-location of pixel centers."""

import numpy as np

from fea_tpu.fem import StaticProblem
from fea_tpu.mesh import read_medit_mesh
from fea_tpu.raster.locate import build_pixel_map
from fea_tpu.raster.rasterizer import cell_field_image, scalar_range

CANTILEVER_DIR = "/root/reference/applications/cantilever"


def _solve_cantilever():
    coords, tris = read_medit_mesh(f"{CANTILEVER_DIR}/cantilever.mesh")
    candidate = coords[:, 0] < 0.01
    # facet-constrained nodes, as in tests/test_fem.py
    edges = set()
    for t in tris:
        for e in range(3):
            a, b = int(t[e]), int(t[(e + 1) % 3])
            edges.add((min(a, b), max(a, b)))
    fixed = np.zeros(len(coords), dtype=bool)
    for a, b in edges:
        if candidate[a] and candidate[b]:
            fixed[a] = fixed[b] = True
    loads = np.zeros((len(coords), 2))
    loads[3] = (0.0, -1000.0)
    problem = StaticProblem(
        coords=coords,
        triangles=tris,
        young=np.full(len(tris), 210000.0),
        poisson=np.full(len(tris), 0.3),
        fixed_nodes=fixed,
        loads=loads,
        num_steps=3,
    )
    res = problem.solve(tol=1e-10, max_iters=40000)
    assert res.success
    return coords, tris, res


def _independent_strain_stress(coords, tris, u):
    """f64 P1 element strain/stress via per-element linear solves.

    Shape function N_i(x, y) = a_i + b_i x + c_i y with
    [[1,x0,y0],[1,x1,y1],[1,x2,y2]] @ [a,b,c].T = I: the gradient rows
    come from inverting the nodal Vandermonde — no shared code with
    fem/elasticity.triangle_geometry's closed-form coefficients."""
    E, nu = 210000.0, 0.3
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    D = np.array(
        [
            [lam + 2 * mu, lam, 0.0],
            [lam, lam + 2 * mu, 0.0],
            [0.0, 0.0, mu],
        ]
    )
    eps = np.empty((len(tris), 3))
    for m, t in enumerate(tris):
        V = np.column_stack([np.ones(3), coords[t, 0], coords[t, 1]])
        G = np.linalg.solve(V, np.eye(3))  # rows a,b,c per shape fn
        dNdx, dNdy = G[1], G[2]
        ux, uy = u[t, 0], u[t, 1]
        eps[m] = (
            dNdx @ ux,
            dNdy @ uy,
            dNdy @ ux + dNdx @ uy,  # engineering shear 2*e_xy
        )
    return eps, eps @ D.T


def test_cantilever_strain_stress_golden():
    coords, tris, res = _solve_cantilever()
    u = np.asarray(res.displacements[-1], dtype=np.float64)
    eps_ref, sig_ref = _independent_strain_stress(coords, tris, u)

    eps = np.asarray(res.strain[-1], dtype=np.float64)
    sig = np.asarray(res.stress[-1], dtype=np.float64)
    assert eps.shape == (len(tris), 3)
    eps_scale = np.abs(eps_ref).max()
    sig_scale = np.abs(sig_ref).max()
    assert np.abs(eps - eps_ref).max() / eps_scale < 1e-9
    assert np.abs(sig - sig_ref).max() / sig_scale < 1e-9

    # load stepping: fields scale linearly with t (linear elasticity;
    # the reference re-solves per step, fea_analysis.py:314-322)
    t_half = np.asarray(res.strain[1], dtype=np.float64)
    assert np.allclose(t_half, 0.5 * eps, rtol=0, atol=1e-12 * eps_scale)
    assert np.abs(np.asarray(res.strain[0])).max() == 0.0


def test_cell_field_image_end_to_end():
    coords, tris, res = _solve_cantilever()
    eps_xx = np.asarray(res.strain[-1], dtype=np.float64)[:, 0]
    pm = build_pixel_map(coords, tris, 64)
    img = cell_field_image(pm, eps_xx)
    lo, hi = scalar_range(eps_xx)
    assert img.shape == (64, 64)
    assert img.dtype == np.uint8
    assert (img[~pm.inside] == 255).all()

    # brute-force point location of inside pixel centers. Barycentric
    # coordinates are affine-invariant, so locate in pixel space: pixel
    # (r, c)'s center sits at (c + 0.5, r + 0.5) (raster/locate.py).
    vpix = pm.frame.pixel_of_world(np.asarray(coords, np.float64))
    rows, cols = np.nonzero(pm.inside)
    rng = np.random.default_rng(0)
    pick = rng.choice(len(rows), size=min(200, len(rows)), replace=False)
    checked = 0
    for r, c in zip(rows[pick], cols[pick]):
        p = np.array([c + 0.5, r + 0.5])
        hit = None
        ambiguous = False
        for m, t in enumerate(tris):
            a, b, cc = vpix[t[0]], vpix[t[1]], vpix[t[2]]
            T = np.column_stack([b - a, cc - a])
            try:
                lmb = np.linalg.solve(T, p - a)
            except np.linalg.LinAlgError:
                continue
            l0, l1, l2 = 1 - lmb.sum(), lmb[0], lmb[1]
            if min(l0, l1, l2) > 1e-3:
                hit = m
                break
            if min(l0, l1, l2) > -1e-3:
                ambiguous = True  # on/near an edge: location is tie-broken
        if hit is None:
            assert ambiguous, f"inside pixel ({r},{c}) outside every triangle"
            continue
        span = hi - lo
        expected = round((1.0 - np.clip((eps_xx[hit] - lo) / span, 0, 1)) * 255)
        assert img[r, c] == expected, (r, c, hit, img[r, c], expected)
        checked += 1
    assert checked > 100
