"""Distributed connected-components clustering over duplicate-pair edges.

The reference's only cross-file mutable state is the refcounted segment
store (ST2, lib/dbManager.cpp:549-554); the rebuild's analog for near-dup
clustering is union-find over verified candidate edges (SURVEY.md §7.2).
Two implementations, identical deterministic output (cluster id = minimum
member file_id):

- ``cluster_label_propagation``: the cluster-scale path. Iterative
  min-label propagation expressed purely in Ray Data (join + groupby-min
  per round, materialized between rounds). Converges in O(log diameter)
  rounds; duplicate clusters are near-cliques from LSH buckets, so
  diameter is tiny. Every round is a bounded shuffle over the *label*
  table (nodes-with-edges only — never the corpus).
- ``cluster_unionfind_stream``: the small-side path. Streams edge batches
  to a single in-process union-find (edges ≪ corpus after verification).
  Used when the edge set fits one process; the propagation path is the
  default for bench/scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from data_deduplication_service_ray.config import gate
from ray.data.aggregate import Min


def _symmetrize(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(a,b) edge list -> (src,dst) with both directions."""

    def both(batch: pa.Table) -> pa.Table:
        a = batch["a"].cast(pa.int64())
        b = batch["b"].cast(pa.int64())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(),
                                     b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(),
                                     a.combine_chunks()]),
        })

    return edges.map_batches(both, batch_format="pyarrow")


def cluster_label_propagation(edges: ray.data.Dataset,
                              max_rounds: int = 20,
                              num_partitions: int = 8) -> ray.data.Dataset:
    """Edges (a:int64, b:int64) -> labels (file_id, cluster_id).

    Min-label propagation: every node repeatedly adopts the minimum label
    among itself and its neighbors; fixpoint = connected components with
    the min member id as the component label. Only nodes that appear in
    at least one edge are returned — singletons are attached by
    ``attach_singletons`` (keeps the label table proportional to the
    duplicate population, not the corpus).
    """
    sym = _symmetrize(edges).materialize()
    labels = (sym.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
              .map_batches(
                  lambda t: pa.table({
                      "node": t["src"],
                      "label": pa.compute.min_element_wise(
                          t["src"], t["nbr_min"])}),
                  batch_format="pyarrow")
              .materialize())

    for _ in range(max_rounds):
        # neighbor labels: edges ⋈ labels on dst, propagate to src
        lab_dst = labels.rename_columns({"node": "dst"})
        prop = (sym.join(lab_dst, join_type="inner",
                         num_partitions=num_partitions, on=("dst",))
                .select_columns(["src", "label"])
                .rename_columns({"src": "node"}))
        new_labels = (prop.union(labels)
                      .groupby("node")
                      .aggregate(Min("label", alias_name="label"))
                      .materialize())
        # labels are monotonically non-increasing; fixpoint when no change
        diff = (new_labels.rename_columns({"label": "new_label"})
                .join(labels, join_type="inner",
                      num_partitions=num_partitions, on=("node",)))
        changed = diff.filter(expr="new_label != label").count()
        labels = new_labels
        if changed == 0:
            break

    return labels.rename_columns({"node": "file_id",
                                  "label": "cluster_id"})


def cluster_unionfind_stream(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Edges -> labels via one vectorized connected-components pass
    (small-edge-set path).

    Streams edge batches into numpy arrays, then runs min-label hooking
    + pointer jumping over a dense index remap (Shiloach–Vishkin shape:
    O(E · log diameter) vectorized rounds — duplicate clusters are
    near-cliques, so the diameter is tiny). Replaces the per-edge Python
    ``UnionFind`` loop (~µs/edge of interpreter time on the driver; the
    :class:`~...functions.unionfind.UnionFind` class remains the
    reference implementation the equivalence test checks against).
    Valid when the post-verification edge set fits one process — the
    common case, since verified duplicate pairs are a tiny fraction of
    the corpus; for larger edge sets use ``cluster_label_propagation``.
    """
    a_l, b_l = [], []
    for batch in edges.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
        a_l.append(np.asarray(batch["a"].to_numpy(zero_copy_only=False),
                              dtype=np.int64))
        b_l.append(np.asarray(batch["b"].to_numpy(zero_copy_only=False),
                              dtype=np.int64))
    a = (np.concatenate(a_l) if a_l else np.empty(0, dtype=np.int64))
    b = (np.concatenate(b_l) if b_l else np.empty(0, dtype=np.int64))
    return ray.data.from_arrow(cc_min_labels(a, b))


def cc_min_labels(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Edge arrays -> (file_id, cluster_id) table, cluster_id = min
    member id (the deterministic label contract); vectorized hooking +
    pointer jumping core shared by the streamed and raw-task paths."""
    if len(a) == 0:
        return pa.table({"file_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[:len(a)], inv[len(a):]
    # parent[i] = current min-known component member index; nodes are
    # sorted, so index order == id order and the fixpoint parent is the
    # component's min member
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        pa_, pb_ = parent[ea], parent[eb]
        lo = np.minimum(pa_, pb_)
        hi = np.maximum(pa_, pb_)
        hook = lo < parent[hi]
        if not hook.any():
            break
        np.minimum.at(parent, hi[hook], lo[hook])
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
    return pa.table({"file_id": pa.array(nodes),
                     "cluster_id": pa.array(nodes[parent])})


#: Broadcast the label table into the attach step below this row count
#: (labels cover only nodes with >=1 duplicate edge, a small fraction of
#: any real corpus); past it, fall back to a left-outer hash join.
BROADCAST_LABEL_LIMIT = gate(5_000_000, "broadcast_label_limit")


def attach_singletons(labels: ray.data.Dataset,
                      all_nodes: ray.data.Dataset,
                      num_partitions: int = 8) -> ray.data.Dataset:
    """Left-attach cluster ids to the full corpus: nodes without an edge
    become their own singleton cluster (cluster_id = file_id).

    The label table is the small side — broadcast it once and map over
    the corpus (one streaming pass, no shuffle) unless it exceeds
    ``BROADCAST_LABEL_LIMIT``."""
    import ray as _ray

    from ray.data.dataset import MaterializedDataset

    n_labels = (labels.count()
                if isinstance(labels, MaterializedDataset) else None)
    if n_labels is None:
        labels = labels.materialize()
        n_labels = labels.count()

    if n_labels <= BROADCAST_LABEL_LIMIT:
        nodes_arr: list[np.ndarray] = []
        labs_arr: list[np.ndarray] = []
        for b in labels.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
            nodes_arr.append(np.asarray(
                b["file_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64))
            labs_arr.append(np.asarray(
                b["cluster_id"].to_numpy(zero_copy_only=False),
                dtype=np.int64))
        nodes = (np.concatenate(nodes_arr) if nodes_arr
                 else np.empty(0, dtype=np.int64))
        labs = (np.concatenate(labs_arr) if labs_arr
                else np.empty(0, dtype=np.int64))
        order = np.argsort(nodes)
        handle = _ray.put((nodes[order], labs[order]))

        def attach(batch: pa.Table) -> pa.Table:
            snodes, slabs = _ray.get(handle)
            fid = np.asarray(batch["file_id"].to_numpy(
                zero_copy_only=False), dtype=np.int64)
            cid = fid.copy()
            if len(snodes):
                pos = np.searchsorted(snodes, fid)
                pos_c = np.minimum(pos, len(snodes) - 1)
                hit = snodes[pos_c] == fid
                cid[hit] = slabs[pos_c[hit]]
            return pa.table({"file_id": pa.array(fid),
                             "cluster_id": pa.array(cid)})

        return all_nodes.select_columns(["file_id"]).map_batches(
            attach, batch_format="pyarrow")

    joined = all_nodes.select_columns(["file_id"]).join(
        labels, join_type="left_outer", num_partitions=num_partitions,
        on=("file_id",))

    def fill(batch: pa.Table) -> pa.Table:
        cid = pa.compute.coalesce(batch["cluster_id"], batch["file_id"])
        return pa.table({"file_id": batch["file_id"],
                         "cluster_id": cid.cast(pa.int64())})

    return joined.map_batches(fill, batch_format="pyarrow")


def cluster_sizes(labels: ray.data.Dataset) -> ray.data.Dataset:
    """(cluster_id, size) report, duplicate clusters only (size > 1)."""
    from ray.data.aggregate import Count

    return (labels.groupby("cluster_id")
            .aggregate(Count(alias_name="size"))
            .filter(expr="size > 1"))
