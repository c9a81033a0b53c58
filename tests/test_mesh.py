import numpy as np
import pytest

from fea_tpu.geometry import GeometrySampler, Polygon
from fea_tpu.mesh import (
    Mesh,
    read_medit_mesh,
    read_vtk,
    triangulate,
    triangulate_polygon,
    write_medit_mesh,
    write_vtk,
)

UNIT_SQUARE = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])


def tri_areas(coords, tris):
    a = coords[tris[:, 0]]
    b = coords[tris[:, 1]]
    c = coords[tris[:, 2]]
    return 0.5 * ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))


def test_unit_square_coarse():
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.1)
    assert mesh.num_nodes > 50
    areas = tri_areas(mesh.coords, mesh.triangles)
    assert (areas > 0).all()  # CCW
    assert areas.sum() == pytest.approx(1.0, abs=1e-9)
    # corner contract: first 4 nodes are the polygon corners in order
    np.testing.assert_allclose(mesh.coords[:4], UNIT_SQUARE)
    assert [tuple(e) for e in mesh.ring_edges[0]] == [(0, 1), (1, 2), (2, 3), (3, 0)]


def test_unit_square_fine_target_size():
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.02)
    areas = tri_areas(mesh.coords, mesh.triangles)
    assert areas.sum() == pytest.approx(1.0, abs=1e-9)
    # edge lengths concentrated near mesh_size
    e = np.concatenate(
        [
            mesh.coords[mesh.triangles[:, i]] - mesh.coords[mesh.triangles[:, (i + 1) % 3]]
            for i in range(3)
        ]
    )
    lengths = np.linalg.norm(e, axis=1)
    assert np.median(lengths) == pytest.approx(0.02, rel=0.35)
    assert lengths.max() < 0.08


def test_square_with_hole():
    hole = np.array([[0.4, 0.4], [0.4, 0.6], [0.6, 0.6], [0.6, 0.4]])  # CW
    mesh = triangulate(UNIT_SQUARE, [hole], mesh_size=0.05)
    areas = tri_areas(mesh.coords, mesh.triangles)
    assert areas.sum() == pytest.approx(1.0 - 0.04, abs=1e-9)
    # no node strictly inside the hole
    inside = (
        (mesh.coords[:, 0] > 0.41)
        & (mesh.coords[:, 0] < 0.59)
        & (mesh.coords[:, 1] > 0.41)
        & (mesh.coords[:, 1] < 0.59)
    )
    assert not inside.any()
    # hole corners follow the exterior corners in node numbering
    np.testing.assert_allclose(mesh.coords[4:8], hole)


def test_nodes_on_edge_predicate():
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.1)
    bottom = mesh.nodes_on_edge((0, 1))
    ys = mesh.coords[bottom][:, 1]
    assert (np.abs(ys) < 1e-9).all()
    assert len(bottom) >= 11


def test_random_plates_mesh():
    sampler = GeometrySampler(random_seed=3)
    for _ in range(3):
        poly = sampler.generate()
        mesh = triangulate_polygon(poly, mesh_size=0.05)
        areas = tri_areas(mesh.coords, mesh.triangles)
        assert (areas > 0).all()
        assert mesh.num_triangles > 10


def test_medit_roundtrip(tmp_path):
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.2)
    p = str(tmp_path / "part.mesh")
    write_medit_mesh(p, mesh.coords, mesh.triangles)
    coords, tris = read_medit_mesh(p)
    np.testing.assert_allclose(coords, mesh.coords, atol=1e-12)
    np.testing.assert_array_equal(tris, mesh.triangles)


def test_vtk_roundtrip(tmp_path):
    mesh = triangulate(UNIT_SQUARE, mesh_size=0.2)
    u = np.random.default_rng(0).normal(size=(mesh.num_nodes, 2))
    p = str(tmp_path / "domain.0.vtk")
    write_vtk(p, mesh.coords, mesh.triangles, point_data={"u": u})
    data = read_vtk(p)
    np.testing.assert_allclose(data["points"][:, :2], mesh.coords, atol=1e-12)
    np.testing.assert_array_equal(data["cells"], mesh.triangles)
    np.testing.assert_allclose(data["u"][:, :2], u, atol=1e-12)


def test_read_reference_cantilever_fixture():
    coords, tris = read_medit_mesh(
        "/root/reference/applications/cantilever/cantilever.mesh"
    )
    assert coords.shape == (2464, 2)
    assert tris.shape[0] > 4000
    data = read_vtk("/root/reference/applications/cantilever/cantilever.vtk")
    assert data["points"].shape == (2464, 3)
    assert "u" in data
    assert data["u"].shape == (2464, 3)
    # sanity: tip deflection is downward
    assert data["u"][:, 1].min() < -1e-4


def test_mesher_soak_production_scale():
    """Soak the native CDT mesher at the production mesh size (1e-2,
    generate_data_GT.sh:5) over many seeded random plates: every produced
    mesh must be conforming (boundary-edge midpoints recovered), CCW,
    degenerate-free, and bounded in size; the geometry->mesh failure rate
    must stay low enough that datagen's redraw loop is cheap.

    Kept to 120 plates so the suite stays fast; bump SOAK_PLATES locally
    for a deeper soak."""
    SOAK_PLATES = 120
    sampler = GeometrySampler(random_seed=20260816)
    failures = 0
    meshed = 0
    area_rel_err_max = 0.0
    while meshed < SOAK_PLATES:
        polygon = sampler.generate()
        try:
            mesh = triangulate_polygon(polygon, mesh_size=1e-2)
        except Exception:
            failures += 1
            assert failures < SOAK_PLATES, "mesh failure rate ~50%+"
            continue
        meshed += 1
        areas = tri_areas(mesh.coords, mesh.triangles)
        assert (areas > 1e-12).all(), "degenerate/CW triangle"
        # node indices in range, no isolated nodes
        assert mesh.triangles.min() >= 0
        assert mesh.triangles.max() < mesh.num_nodes
        used = np.zeros(mesh.num_nodes, bool)
        used[mesh.triangles.reshape(-1)] = True
        assert used.all(), "isolated node"
        # mesh area == polygon area (conforming cover, no overlap/holes)
        def ring_area(ring):
            nxt = np.roll(ring, -1, 0)
            return abs(
                0.5
                * np.sum(ring[:, 0] * nxt[:, 1] - ring[:, 1] * nxt[:, 0])
            )

        poly_area = ring_area(polygon.exterior)
        for hole in polygon.holes:
            poly_area -= ring_area(hole)
        rel = abs(areas.sum() - poly_area) / poly_area
        area_rel_err_max = max(area_rel_err_max, rel)
        assert rel < 1e-6, f"area mismatch {rel:.2e}"
        # bounded size: production plates stay within the largest bucket
        assert mesh.num_nodes < 131072
        assert mesh.num_triangles < 131072
        # manifold interior: every edge shared by at most 2 triangles
        e = np.concatenate(
            [mesh.triangles[:, [0, 1]], mesh.triangles[:, [1, 2]],
             mesh.triangles[:, [2, 0]]]
        )
        e.sort(axis=1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert counts.max() <= 2, "non-manifold edge"
    # recorded failure rate: geometry redraws are part of the datagen
    # loop's budget; keep them rare
    rate = failures / (failures + meshed)
    assert rate < 0.2, f"mesh failure rate {rate:.1%}"
