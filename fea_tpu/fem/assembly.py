"""Matrix-free stiffness application for batched TPU solves.

Instead of materializing a sparse K (the reference hands a SciPy CSR to
SuperLU — fea_analysis.py:371-375), we keep per-element 6x6 blocks and
apply K via gather -> small batched matmul -> incidence gather-sum. The
incidence form (node dof <- fixed-width list of (element, local-dof)
slots) avoids data-dependent scatters entirely, which XLA maps far better
onto the VPU/MXU than scatter-add.
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class IncidenceOp(NamedTuple):
    """Static gather plan: for each global dof, the flat indices into the
    (M*6,) element-result vector that accumulate into it, padded with a
    sentinel slot pointing at a zeroed entry."""

    slots: jnp.ndarray  # (ndof, max_deg) int32 indices into padded (M*6+1,)
    n_nodes: int
    n_elements: int


def build_incidence(triangles: np.ndarray, n_nodes: int) -> IncidenceOp:
    """Host-side construction of the incidence plan (once per mesh/bucket)."""
    triangles = np.asarray(triangles)
    M = len(triangles)
    ndof = 2 * n_nodes
    lists: list = [[] for _ in range(ndof)]
    for e in range(M):
        for a in range(3):
            node = triangles[e, a]
            for comp in range(2):
                lists[2 * node + comp].append(e * 6 + 2 * a + comp)
    max_deg = max((len(l) for l in lists), default=1)
    sentinel = M * 6  # extra zero slot
    slots = np.full((ndof, max_deg), sentinel, dtype=np.int32)
    for d, l in enumerate(lists):
        slots[d, : len(l)] = l
    return IncidenceOp(slots=jnp.asarray(slots), n_nodes=n_nodes, n_elements=M)


@partial(jax.jit, static_argnames=())
def apply_element_stiffness(Ke, triangles, incidence_slots, u):
    """y = K u for u of shape (n_nodes, 2). All shapes static.

    Ke: (M,6,6); triangles: (M,3) int; incidence_slots: (2*n_nodes, max_deg).
    """
    n_nodes = u.shape[0]
    ue = u[triangles].reshape(-1, 6)  # (M, 6)
    fe = jnp.einsum("mij,mj->mi", Ke, ue)  # (M, 6)
    fe_flat = jnp.concatenate([fe.reshape(-1), jnp.zeros((1,), fe.dtype)])
    y = fe_flat[incidence_slots].sum(axis=1)
    return y.reshape(n_nodes, 2)


def assemble_dense(Ke, triangles, n_nodes):
    """Dense K for small test meshes only."""
    K = jnp.zeros((2 * n_nodes, 2 * n_nodes), Ke.dtype)
    dofs = jnp.stack(
        [triangles * 2 + 0, triangles * 2 + 1], axis=-1
    ).reshape(-1, 6)  # (M,6): interleaved (x0,y0,x1,y1,x2,y2)
    rows = dofs[:, :, None].repeat(6, axis=2)
    cols = dofs[:, None, :].repeat(6, axis=1)
    return K.at[rows.reshape(-1), cols.reshape(-1)].add(Ke.reshape(-1))


def assemble_scipy_csr(Ke, triangles, n_nodes):
    """SciPy CSR assembly — host-side reference/direct-solve path for tests."""
    import scipy.sparse as sp

    Ke = np.asarray(Ke)
    triangles = np.asarray(triangles)
    dofs = np.stack([triangles * 2, triangles * 2 + 1], axis=-1).reshape(-1, 6)
    rows = np.repeat(dofs, 6, axis=1).reshape(-1)
    cols = np.tile(dofs, (1, 6)).reshape(-1)
    return sp.coo_matrix(
        (Ke.reshape(-1), (rows, cols)), shape=(2 * n_nodes, 2 * n_nodes)
    ).tocsr()
