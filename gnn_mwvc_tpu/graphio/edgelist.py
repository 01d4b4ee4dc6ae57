"""Edge-list ("E N") format, MatrixMarket ingestion, and weight generation.

Covers the reference's legacy data-prep chain (SURVEY.md §3.5):

* ``read_edge_graph`` / ``write_edge_graph`` — the training-data format
  ``E N / weights / one edge per line`` with 1-indexed vertices
  (reference: old_files/src/apps/gnn_train.cpp:14-30).
* ``read_mtx_edges`` — MatrixMarket coordinate pattern files (replaces the
  vendored NIST ``mmio`` C library, reference: old_files/src/lib/mtx/mmio.c).
* ``gen_weights`` — MTX edge list -> weighted instance with U[min,max] integer
  weights, seed = N when seed == -1, dedup + self-loop removal
  (reference: old_files/src/apps/gen_weights.cpp:39-66).
* ``mtx_to_metis`` — "E N" file -> METIS file
  (reference: old_files/src/apps/mtx_to_graph.cpp:26-52).
"""

from __future__ import annotations

import numpy as np

from gnn_mwvc_tpu.graph import Graph
from gnn_mwvc_tpu.graphio.metis import write_metis

__all__ = [
    "read_edge_graph",
    "write_edge_graph",
    "read_mtx_edges",
    "gen_weights",
    "mtx_to_metis",
]


def _read_bytes(path_or_buf) -> bytes:
    if hasattr(path_or_buf, "read"):
        data = path_or_buf.read()
        return data.encode() if isinstance(data, str) else data
    with open(path_or_buf, "rb") as f:
        return f.read()


def read_edge_graph(path_or_buf) -> Graph:
    """Parse ``E N / weights / edges`` (1-indexed endpoints, u<->v normalized)."""
    tokens = np.array(_read_bytes(path_or_buf).split(), dtype=np.int64)
    e, n = int(tokens[0]), int(tokens[1])
    weights = tokens[2 : 2 + n]
    uv = tokens[2 + n : 2 + n + 2 * e].reshape(e, 2) - 1
    u = np.minimum(uv[:, 0], uv[:, 1])
    v = np.maximum(uv[:, 0], uv[:, 1])
    keep = u != v
    edges = np.stack([u[keep], v[keep]], axis=1)
    if len(edges):
        edges = np.unique(edges, axis=0)
    return Graph(weights, edges)


def write_edge_graph(path_or_buf, g: Graph) -> None:
    own = not hasattr(path_or_buf, "write")
    f = open(path_or_buf, "w") if own else path_or_buf
    try:
        f.write(f"{g.m} {g.n}\n")
        f.write(" ".join(map(str, g.weights.tolist())) + " \n")
        for u, v in g.edge_array() + 1:
            f.write(f"{u} {v}\n")
    finally:
        if own:
            f.close()


def read_mtx_edges(path_or_buf):
    """Parse a MatrixMarket coordinate file -> (n, edges 1-indexed, as read).

    Header after ``%`` comment lines is ``N M E`` with n = max(N, M)
    (reference: gen_weights.cpp:33-37).  Only the first two fields of each of
    the E data lines are used (pattern entries).
    """
    data = _read_bytes(path_or_buf)
    lines = data.split(b"\n")
    i = 0
    while i < len(lines) and lines[i].lstrip().startswith(b"%"):
        i += 1
    header = lines[i].split()
    n_rows, n_cols, e = int(header[0]), int(header[1]), int(header[2])
    n = max(n_rows, n_cols)
    body_lines = lines[i + 1 : i + 1 + e]
    # Keep only the first two tokens per line (MTX may carry values).
    us = np.empty(len(body_lines), dtype=np.int64)
    vs = np.empty(len(body_lines), dtype=np.int64)
    k = 0
    for ln in body_lines:
        parts = ln.split(None, 2)
        if len(parts) < 2:
            continue
        us[k] = int(parts[0])
        vs[k] = int(parts[1])
        k += 1
    return n, np.stack([us[:k], vs[:k]], axis=1)


def gen_weights(n: int, edges_1idx: np.ndarray, wmin: int, wmax: int, seed: int) -> Graph:
    """Assign U[wmin, wmax] integer weights; seed == -1 means seed = N.

    Dedup + self-loop removal match the reference
    (reference: gen_weights.cpp:45-55).  Uses numpy MT19937 so the
    distribution family matches; exact stream parity with std::mt19937 +
    uniform_int_distribution is not guaranteed by either standard and is not a
    compatibility surface.
    """
    u = np.minimum(edges_1idx[:, 0], edges_1idx[:, 1]) - 1
    v = np.maximum(edges_1idx[:, 0], edges_1idx[:, 1]) - 1
    keep = u != v
    edges = np.stack([u[keep], v[keep]], axis=1)
    if len(edges):
        edges = np.unique(edges, axis=0)
    rng = np.random.Generator(np.random.MT19937(n if seed == -1 else seed))
    weights = rng.integers(wmin, wmax, size=n, endpoint=True, dtype=np.int64)
    return Graph(weights, edges)


def mtx_to_metis(in_path, out_path) -> None:
    """Convert an ``E N`` edge-graph file to METIS (mtx_to_graph equivalent)."""
    g = read_edge_graph(in_path)
    write_metis(out_path, g)
