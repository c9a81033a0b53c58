"""Deterministic framing + pixel->triangle point location.

Replaces the reference's render->pixel-scan->re-render->crop loop
(datagen/generate.py:129-145, datagen/utils.py:18-56) with direct math:
the geometry's long axis spans the image, the short axis is centered —
which is exactly what the VTK camera + autoscale dance converges to.

The pixel map (containing triangle + barycentric weights per pixel) is
computed once per plate and reused for every condition/step/field image,
eliminating the per-image VTK render of the reference
(fea_analysis.py:463-613).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Frame(NamedTuple):
    """World <-> pixel transform for a square image_size x image_size image.

    World x maps to image columns; world y maps to rows bottom-up (row 0 is
    the top of the image, matching the reference's view_xy renders)."""

    image_size: int
    scale: float  # pixels per world unit
    offset_x: float  # pixel offset of world minx
    offset_y: float  # pixel offset of world miny
    minx: float
    miny: float

    def world_of_pixels(self) -> np.ndarray:
        """(S, S, 2) world coordinates of pixel centers."""
        S = self.image_size
        cols = np.arange(S) + 0.5
        rows = np.arange(S) + 0.5
        x = (cols - self.offset_x) / self.scale + self.minx
        y = ((S - rows) - self.offset_y) / self.scale + self.miny
        return np.stack(np.meshgrid(x, y, indexing="xy"), axis=-1)

    def pixel_of_world(self, pts: np.ndarray) -> np.ndarray:
        """(N, 2) world points -> (N, 2) (col, row) pixel coordinates."""
        col = (pts[:, 0] - self.minx) * self.scale + self.offset_x
        row = self.image_size - ((pts[:, 1] - self.miny) * self.scale + self.offset_y)
        return np.stack([col, row], axis=-1)


def make_frame(coords: np.ndarray, image_size: int) -> Frame:
    """Frame a node cloud: long axis spans the full image, short axis
    centered (reference generate.py:129-145 semantics)."""
    minx, miny = coords.min(axis=0)
    maxx, maxy = coords.max(axis=0)
    w, h = maxx - minx, maxy - miny
    extent = max(w, h)
    scale = image_size / max(extent, 1e-12)
    offset_x = (image_size - w * scale) / 2.0
    offset_y = (image_size - h * scale) / 2.0
    return Frame(
        image_size=image_size,
        scale=float(scale),
        offset_x=float(offset_x),
        offset_y=float(offset_y),
        minx=float(minx),
        miny=float(miny),
    )


class PixelMap(NamedTuple):
    tri_idx: np.ndarray  # (S, S) int32, -1 where outside the mesh
    bary: np.ndarray  # (S, S, 3) float32 barycentric weights
    inside: np.ndarray  # (S, S) bool
    frame: Frame


def _bin_triangles(coords, triangles, frame: Frame, cell_px: int, pad_to: int = 0):
    """Host-side uniform grid: per grid cell, the triangles overlapping it.
    Fully vectorized (group-by over (cell, triangle) pairs)."""
    S = frame.image_size
    n_cells = (S + cell_px - 1) // cell_px
    pix = frame.pixel_of_world(coords)  # (N,2) col,row
    tri_pix = pix[triangles]  # (M,3,2)
    lo = np.clip(
        np.floor(tri_pix.min(axis=1) / cell_px).astype(np.int64), 0, n_cells - 1
    )
    hi = np.clip(
        np.floor(tri_pix.max(axis=1) / cell_px).astype(np.int64), 0, n_cells - 1
    )
    span = hi - lo + 1  # (M,2)
    M = len(triangles)

    cell_ids = []
    tri_ids = []
    max_sx = int(span[:, 0].max()) if M else 1
    max_sy = int(span[:, 1].max()) if M else 1
    for dy in range(max_sy):
        for dx in range(max_sx):
            mask = (dx < span[:, 0]) & (dy < span[:, 1])
            if not mask.any():
                continue
            t = np.nonzero(mask)[0]
            cell_ids.append((lo[t, 1] + dy) * n_cells + (lo[t, 0] + dx))
            tri_ids.append(t)
    cell_ids = np.concatenate(cell_ids) if cell_ids else np.zeros(0, np.int64)
    tri_ids = np.concatenate(tri_ids) if tri_ids else np.zeros(0, np.int64)

    order = np.argsort(cell_ids, kind="stable")
    cell_s = cell_ids[order]
    tri_s = tri_ids[order]
    counts = np.bincount(cell_ids, minlength=n_cells * n_cells)
    max_per_cell = int(counts.max()) if len(cell_ids) else 1
    width = max(max_per_cell, pad_to)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(len(cell_s)) - np.repeat(starts, counts)

    table = np.full((n_cells * n_cells, width), -1, dtype=np.int32)
    table[cell_s, within] = tri_s
    return table, n_cells


def build_pixel_map(
    coords: np.ndarray,
    triangles: np.ndarray,
    image_size: int,
    frame: Optional[Frame] = None,
    cell_px: int = 8,
    pad_candidates: int = 0,
    pad_shapes: Optional[Tuple[int, int]] = None,
) -> PixelMap:
    """Locate every pixel center in the mesh. O(pixels * candidates).

    `pad_candidates` fixes the per-cell candidate width and `pad_shapes`
    (node_bucket, tri_bucket) pads the mesh arrays, so different plates
    share one compiled locate kernel (the per-mesh recompile otherwise
    costs ~1 s/plate on a single-core host). Padding is inert: the
    candidate table only lists real triangles, ghost entries are -1."""
    frame = frame or make_frame(coords, image_size)
    table, n_cells = _bin_triangles(
        coords, triangles, frame, cell_px, pad_to=pad_candidates
    )

    world = frame.world_of_pixels().reshape(-1, 2)  # (P, 2)
    S = image_size
    rows = np.repeat(np.arange(S), S)
    cols = np.tile(np.arange(S), S)
    cell_id = (rows // cell_px) * n_cells + (cols // cell_px)
    cand = table[cell_id]  # (P, K)

    coords_in = np.asarray(coords, np.float32)
    tris_in = np.asarray(triangles, np.int32)
    if pad_shapes is not None:
        nb = max(pad_shapes[0], len(coords_in))
        mb = max(pad_shapes[1], len(tris_in))
        coords_in = np.concatenate(
            [coords_in, np.zeros((nb - len(coords_in), 2), np.float32)]
        )
        tris_in = np.concatenate(
            [tris_in, np.zeros((mb - len(tris_in), 3), np.int32)]
        )

    from ..utils.device import raster_device

    with jax.default_device(raster_device()):
        tri_idx, bary = _locate_kernel(
            jnp.asarray(coords_in),
            jnp.asarray(tris_in),
            jnp.asarray(world, jnp.float32),
            jnp.asarray(cand, jnp.int32),
        )
    tri_idx = np.asarray(tri_idx).reshape(S, S)
    bary = np.asarray(bary).reshape(S, S, 3)
    return PixelMap(
        tri_idx=tri_idx, bary=bary, inside=tri_idx >= 0, frame=frame
    )


@jax.jit
def _locate_kernel(coords, triangles, pts, cand):
    """Per point, test its candidate triangles; return (tri_idx, bary).

    tri_idx = -1 when no candidate contains the point. Containment uses a
    small negative tolerance so pixels on shared edges land in exactly one
    triangle and boundary pixels are kept."""
    tri = jnp.where(cand[..., None] >= 0, triangles[cand], 0)  # (P,K,3)
    p0 = coords[tri[..., 0]]  # (P,K,2)
    p1 = coords[tri[..., 1]]
    p2 = coords[tri[..., 2]]
    p = pts[:, None, :]

    d = (p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1]) - (
        p1[..., 1] - p0[..., 1]
    ) * (p2[..., 0] - p0[..., 0])
    inv = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, 0.0)
    w1 = (
        (p[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1])
        - (p[..., 1] - p0[..., 1]) * (p2[..., 0] - p0[..., 0])
    ) * inv
    w2 = (
        (p1[..., 0] - p0[..., 0]) * (p[..., 1] - p0[..., 1])
        - (p1[..., 1] - p0[..., 1]) * (p[..., 0] - p0[..., 0])
    ) * inv
    w0 = 1.0 - w1 - w2
    tol = -1e-5
    inside = (w0 >= tol) & (w1 >= tol) & (w2 >= tol) & (cand >= 0)

    score = jnp.where(inside, jnp.minimum(jnp.minimum(w0, w1), w2), -jnp.inf)
    best = jnp.argmax(score, axis=1)  # (P,)
    has = jnp.any(inside, axis=1)
    sel = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
    tri_idx = jnp.where(has, sel, -1)
    bsel = lambda w: jnp.take_along_axis(w, best[:, None], axis=1)[:, 0]
    bary = jnp.stack([bsel(w0), bsel(w1), bsel(w2)], axis=-1)
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-12)
    return tri_idx, bary
