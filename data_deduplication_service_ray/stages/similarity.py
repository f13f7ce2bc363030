"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and every ``map_batches`` task computes a vectorized
float64 matmul against its batch, emitting only batch-local top-k
candidates; a single small ``groupby(query_id)`` reduce finishes the
global top-k. Nothing ever materializes the full similarity matrix.

Scale path: IVF (inverted-file) — centroids trained once on a bounded
sample (driver-side numpy k-means, deterministic seed), broadcast to an
assignment stage; search probes only the ``nprobe`` nearest centroid
partitions. At 100 TB the assignment column doubles as the Parquet
partition key so probes prune at the read
(``read_parquet(filter=centroid_id ∈ probes)``).

Near-dup over embeddings: random-hyperplane SimHash LSH (Charikar 2002)
— sign-bit fingerprints bucketed by 16-bit bands, candidates verified by
exact cosine. Reuses the MinHash-LSH pair machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from data_deduplication_service_ray.config import gate
from data_deduplication_service_ray.functions.aggregates import CollectList


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column -> float64 (n, dim) matrix (one copy)."""
    arr = batch[col].combine_chunks()
    flat = np.asarray(arr.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, len(flat) // n) if n else flat.reshape(0, 0)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return mat / norms


def _cosine_parity(qraw: np.ndarray, braw: np.ndarray) -> np.ndarray:
    """Cosine matrix (Q, n) with DuckDB ``list_cosine_similarity`` bit
    parity: per-pair strictly sequential accumulation (np.cumsum) of
    products/squares, final ``num / (sqrt(na) * sqrt(nb))``. Used by the
    oracle-checked queries; the fast paths use BLAS."""
    if len(qraw) == 0 or len(braw) == 0:
        return np.zeros((len(qraw), len(braw)))
    na = np.sqrt(np.cumsum(qraw * qraw, axis=1)[:, -1])     # (Q,)
    nb = np.sqrt(np.cumsum(braw * braw, axis=1)[:, -1])     # (n,)
    out = np.empty((len(qraw), len(braw)))
    for qi in range(len(qraw)):
        prod = qraw[qi][None, :] * braw                     # (n, dim)
        num = np.cumsum(prod, axis=1)[:, -1]
        out[qi] = num / (na[qi] * nb)
    return out


def _take_rows_by_id(ds: ray.data.Dataset, ids: list[int],
                     id_col: str) -> list[dict]:
    """Collect the (driver-small) rows whose id is in ``ids`` with ONE
    vectorized ``pc.is_in`` filter pass — never a per-row Python lambda
    over the corpus."""
    id_arr = pa.array(sorted(set(ids)), pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[id_col], value_set=id_arr))

    return ds.map_batches(keep, batch_format="pyarrow").take_all()


def knn_brute(embeddings: ray.data.Dataset, query_ids: list[int],
              k: int = 10, id_col: str = "vec_id",
              emb_col: str = "embedding",
              exact_parity: bool = False) -> ray.data.Dataset:
    """Exact cosine top-k: (query_id, vec_id, rank, cosine), rank 1-based,
    ties broken by ascending vec_id, self-matches excluded.

    ``exact_parity=True`` scores with sequential-accumulation cosine
    (bit-identical to the DuckDB oracle) instead of BLAS."""
    qrows = _take_rows_by_id(embeddings, query_ids, id_col)
    qrows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qraw = np.array([r[emb_col] for r in qrows], dtype=np.float64)
    qmat = qraw if exact_parity else _normalize(qraw)
    handle = ray.put((qids, qmat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(handle)
        raw = _batch_matrix(batch, emb_col)
        bmat = raw if exact_parity else _normalize(raw)
        bids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        if len(bids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = (_cosine_parity(mat_q, bmat) if exact_parity
                else mat_q @ bmat.T)               # (Q, batch)
        out_q, out_v, out_c = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(len(ids_q)):
            row = sims[qi]
            mask = bids != ids_q[qi]
            cand = np.flatnonzero(mask)
            if len(cand) == 0:
                continue
            # batch-local top-k by the FULL total order (-cosine, vec_id)
            # — an argpartition on cosine alone picks an arbitrary subset
            # among ties (duplicate embeddings), which can disagree with
            # the oracle's ORDER BY cosine DESC, vec_id and vary with
            # block layout
            order = np.lexsort((bids[cand], -row[cand]))
            take = cand[order[:min(kk, len(cand))]]
            out_q.append(np.full(len(take), ids_q[qi], dtype=np.int64))
            out_v.append(bids[take])
            out_c.append(row[take])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cosine": pa.array(np.concatenate(out_c)),
        }) if out_q else pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())})

    partials = embeddings.map_batches(partial_topk, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        # vectorized merge of per-block partial top-k lists: flatten the
        # CollectList columns, lexsort by (query row, -cosine, vec_id)
        # — the oracle's full total order — and keep rank <= k per row.
        # No Python per row/pair (house style; the per-row sorted() loop
        # this replaces was bounded but unvectorized).
        cos_l = batch["collect(cosine)"].combine_chunks()
        vec_l = batch["collect(vec_id)"].combine_chunks()
        flat_c = np.asarray(cos_l.flatten().to_numpy(
            zero_copy_only=False), dtype=np.float64)
        flat_v = np.asarray(vec_l.flatten().to_numpy(
            zero_copy_only=False), dtype=np.int64)
        offs = np.asarray(cos_l.offsets.to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        offs = offs - offs[0]   # flatten() slices to the logical values
        lens = np.diff(offs)
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        order = np.lexsort((flat_v, -flat_c, row_of))
        # rank within each row segment = position - segment start
        seg_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ranks = (np.arange(len(order), dtype=np.int64)
                 - seg_starts[row_of[order]] + 1)
        keep = ranks <= k
        sel = order[keep]
        qids_b = np.asarray(batch["query_id"].to_numpy(
            zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "query_id": pa.array(qids_b[row_of[sel]]),
            "vec_id": pa.array(flat_v[sel]),
            "rank": pa.array(ranks[keep]),
            "cosine": pa.array(flat_c[sel], pa.float64())})

    return (partials.groupby("query_id")
            .aggregate(CollectList("vec_id"), CollectList("cosine"))
            .map_batches(finish, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# IVF: coarse-quantized ANN (the scale path)
# ---------------------------------------------------------------------------

def train_centroids(embeddings: ray.data.Dataset, n_centroids: int = 16,
                    iters: int = 10, sample_size: int = 4096,
                    seed: int = 42, emb_col: str = "embedding"
                    ) -> np.ndarray:
    """Deterministic numpy k-means on a bounded sample (driver-side; the
    sample, not the corpus, bounds memory). Returns (n_centroids, dim)."""
    sample = embeddings.limit(sample_size).take_all()
    mat = _normalize(np.array([r[emb_col] for r in sample],
                              dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)),
                          replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def assign_centroids(embeddings: ray.data.Dataset, centroids: np.ndarray,
                     emb_col: str = "embedding") -> ray.data.Dataset:
    """Append ``centroid_id`` — the IVF partition key (broadcast once)."""
    handle = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(handle)
        mat = _normalize(_batch_matrix(batch, emb_col))
        cid = (mat @ cent.T).argmax(axis=1).astype(np.int64) \
            if len(mat) else np.empty(0, dtype=np.int64)
        return batch.append_column("centroid_id", pa.array(cid))

    return embeddings.map_batches(assign, batch_format="pyarrow")


def ivf_search(assigned: ray.data.Dataset, centroids: np.ndarray,
               query_ids: list[int], k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id", emb_col: str = "embedding",
               exact_parity: bool = False) -> ray.data.Dataset:
    """ANN top-k probing only the ``nprobe`` nearest centroid partitions
    per query. Recall < 1 by design; tested against ``knn_brute``.

    With ``nprobe >= len(centroids)`` every partition is probed and the
    result is EXACTLY brute-force kNN — the limit the DuckDB oracle
    checks bit-for-bit (``exact_parity=True`` scores with the
    sequential-accumulation cosine for double parity)."""
    qrows = _take_rows_by_id(assigned, query_ids, id_col)
    qrows.sort(key=lambda r: r[id_col])
    qmat = _normalize(np.array([r[emb_col] for r in qrows],
                               dtype=np.float64))
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_set = {int(c) for row in probes for c in row}
    pruned = assigned.filter(
        expr=f"centroid_id in {sorted(probe_set)}")
    return knn_brute(pruned, query_ids, k=k, id_col=id_col,
                     emb_col=emb_col, exact_parity=exact_parity)


def ivf_build(embeddings: ray.data.Dataset, index_dir: str,
              n_centroids: int = 16, seed: int = 42,
              emb_col: str = "embedding") -> np.ndarray:
    """Build an on-disk IVF index: train centroids, assign, and write the
    table PARTITIONED by ``centroid_id`` (hive layout + sealed manifest).

    At 100 TB the partition column IS the pruning mechanism: a query
    with ``nprobe`` probes reads only those partition directories —
    nothing else leaves storage (``ivf_search_pruned``). Returns the
    centroid matrix (also persisted as ``_centroids.npy`` — the underscore keeps parquet readers from walking it)."""
    import os

    from data_deduplication_service_ray.sources.writers import (
        write_dataset)

    cents = train_centroids(embeddings, n_centroids=n_centroids,
                            seed=seed, emb_col=emb_col)
    assigned = assign_centroids(embeddings, cents, emb_col=emb_col)
    write_dataset(assigned, index_dir, partition_col="centroid_id")
    np.save(os.path.join(index_dir, "_centroids.npy"), cents)
    return cents


def _fs_and_path(uri: str):
    """(pyarrow FileSystem, scheme-less path) for a local path or any
    fs URI (file://, s3://, gs://, ...) — at 100 TB the index lives in
    an object store, so every listing/open below goes through the
    pyarrow.fs abstraction, never ``os``."""
    from pyarrow import fs as pafs

    if "://" in uri:
        return pafs.FileSystem.from_uri(uri)
    return pafs.LocalFileSystem(), uri


def ivf_search_pruned(index_dir: str, query_ids: list[int],
                      k: int = 10, nprobe: int = 4,
                      id_col: str = "vec_id",
                      emb_col: str = "embedding") -> ray.data.Dataset:
    """ANN top-k over an ``ivf_build`` index, pruning AT THE READ: only
    the ``nprobe`` nearest centroid partitions' files are opened. The
    query rows live in their own centroid's partition (a query's top
    probe is its own centroid), so they are always present in the pruned
    read. Same results as ``ivf_search`` at equal (centroids, nprobe).
    ``index_dir`` may be a local path or a filesystem URI (file://,
    s3://, ...) — listing and reads go through ``pyarrow.fs``."""
    import io

    from pyarrow import fs as pafs

    fsys, root = _fs_and_path(index_dir)
    with fsys.open_input_file(f"{root}/_centroids.npy") as f:
        cents = np.load(io.BytesIO(f.read()))
    # one tiny read to fetch the query vectors: probe every partition the
    # queries could live in — cheap because the searched set below is
    # what matters; queries are few
    full = ray.data.read_parquet(root, filesystem=fsys)
    qrows = _take_rows_by_id(full, query_ids, id_col)
    qrows.sort(key=lambda r: r[id_col])
    qmat = _normalize(np.array([r[emb_col] for r in qrows],
                               dtype=np.float64))
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probe_set = sorted({int(c) for row in probes for c in row})
    # Ray's read_parquet wants FILES when given a list — expand each
    # probe partition directory via the filesystem abstraction (only
    # these files are ever opened)
    paths = []
    for c in probe_set:
        sel = pafs.FileSelector(f"{root}/centroid_id={c}")
        paths.extend(sorted(
            info.path for info in fsys.get_file_info(sel)
            if info.path.endswith(".parquet")))
    pruned = ray.data.read_parquet(paths, filesystem=fsys)
    return knn_brute(pruned, query_ids, k=k, id_col=id_col,
                     emb_col=emb_col)


# ---------------------------------------------------------------------------
# embedding near-dup via random-hyperplane LSH
# ---------------------------------------------------------------------------

def embedding_simhash(embeddings: ray.data.Dataset, dim: int,
                      n_bits: int = 64, seed: int = 42,
                      id_col: str = "vec_id",
                      emb_col: str = "embedding") -> ray.data.Dataset:
    """Append a sign-bit fingerprint: bit i = (v · r_i) > 0."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    handle = ray.put(planes)

    def fp(batch: pa.Table) -> pa.Table:
        r = ray.get(handle)
        mat = _batch_matrix(batch, emb_col)
        bits = (mat @ r) > 0 if len(mat) else np.zeros((0, n_bits))
        weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
        sim = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1,
                                                              dtype=np.uint64)
        return pa.table({
            id_col: batch[id_col],
            "simhash": pa.array(sim.view(np.int64)),
        })

    return embeddings.map_batches(fp, batch_format="pyarrow")


#: ``cosine_pairs_brute``'s DRIVER PULL (take_all of every embedding to
#: build the broadcast matrix) is allowed only up to this many rows;
#: past it (or under GRAFT_FORCE_DISTRIBUTED=1) the same O(n²) scoring
#: runs as block-pair tasks over the materialized blocks — the driver
#: never holds the matrix and per-pair values are identical (cosine of
#: a pair depends only on its two vectors). The quadratic COMPUTE is the
#: documented semantics of this labeled baseline either way; the real
#: scale path is ``embedding_neardup_pairs``.
BRUTE_PAIR_ROW_LIMIT = gate(200_000, "brute_pair_row_limit")


@ray.remote
def _cosine_block_pair_task(ta: pa.Table, tb: pa.Table, tau: float,
                            same: bool, id_col: str, emb_col: str,
                            inner_chunk: int) -> pa.Table:
    """Parity-cosine pairs >= tau between two embedding blocks (every
    unordered cross-block pair is evaluated exactly once; ``same=True``
    restricts to the upper triangle). Output normalized to a < b."""
    all_ids_a = np.asarray(ta[id_col].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
    ids_b = np.asarray(tb[id_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    all_mat_a = _batch_matrix(ta, emb_col)
    mat_b = _batch_matrix(tb, emb_col)
    outs_a, outs_b, outs_c = [], [], []
    # chunk BOTH sides: a materialized block can be ~100k rows, and an
    # unchunked A side makes the sims/cmp temporaries n_a x inner_chunk
    # (hundreds of MB) — the documented mmap page-zeroing trap across
    # concurrent workers. Bounding both keeps each temporary
    # inner_chunk² doubles (~0.5 MB).
    for aoff in range(0, len(all_ids_a), inner_chunk):
        ids_a = all_ids_a[aoff:aoff + inner_chunk]
        mat_a = all_mat_a[aoff:aoff + inner_chunk]
        for off in range(0, len(ids_b), inner_chunk):
            jids = ids_b[off:off + inner_chunk]
            sims = _cosine_parity(mat_a, mat_b[off:off + inner_chunk])
            cmp = (ids_a[:, None] < jids[None, :] if same
                   else ids_a[:, None] != jids[None, :])
            ii, jj = np.nonzero((sims >= tau) & cmp)
            outs_a.append(np.minimum(ids_a[ii], jids[jj]))
            outs_b.append(np.maximum(ids_a[ii], jids[jj]))
            outs_c.append(sims[ii, jj])
    return pa.table({
        "a": pa.array(np.concatenate(outs_a) if outs_a
                      else np.empty(0, dtype=np.int64)),
        "b": pa.array(np.concatenate(outs_b) if outs_b
                      else np.empty(0, dtype=np.int64)),
        "cosine": pa.array(np.concatenate(outs_c) if outs_c
                           else np.empty(0), pa.float64())})


def _cosine_pairs_block_tasks(emb2: ray.data.Dataset, tau: float,
                              id_col: str, emb_col: str,
                              inner_chunk: int) -> ray.data.Dataset:
    """Past-the-gate brute path: one task per unordered block pair over
    the MATERIALIZED slim embedding table (zero driver bytes)."""
    refs = list(emb2.to_arrow_refs())
    tasks = [_cosine_block_pair_task.remote(refs[i], refs[j], tau,
                                            i == j, id_col, emb_col,
                                            inner_chunk)
             for i in range(len(refs)) for j in range(i, len(refs))]
    return ray.data.from_arrow_refs(tasks)


def cosine_pairs_brute(embeddings: ray.data.Dataset, tau: float,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       inner_chunk: int = 256) -> ray.data.Dataset:
    """All pairs (a < b) with parity-cosine >= tau — the brute-force
    similarity self-join baseline (O(n²) scoring; broadcast matrix once,
    blocked inner loop bounds memory). The LSH path
    (``embedding_neardup_pairs``) is the scale alternative; past
    ``BRUTE_PAIR_ROW_LIMIT`` rows the driver pull is replaced by
    block-pair tasks (identical pair set and values)."""
    # select + materialize ONCE: counting a lazy input and then pulling
    # it would execute the upstream pipeline twice (same fix as
    # writers.export_files' retrieval path)
    emb2 = embeddings.select_columns([id_col, emb_col]).materialize()
    if emb2.count() > BRUTE_PAIR_ROW_LIMIT:
        return _cosine_pairs_block_tasks(emb2, tau, id_col,
                                         emb_col, inner_chunk)
    all_rows = emb2.take_all()
    all_rows.sort(key=lambda r: r[id_col])
    ids_all = np.array([r[id_col] for r in all_rows], dtype=np.int64)
    mat_all = np.array([r[emb_col] for r in all_rows], dtype=np.float64)
    handle = ray.put((ids_all, mat_all))

    def block(batch: pa.Table) -> pa.Table:
        ids_g, mat_g = ray.get(handle)
        bids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        braw = _batch_matrix(batch, emb_col)
        outs_a, outs_b, outs_c = [], [], []
        for off in range(0, len(ids_g), inner_chunk):
            jids = ids_g[off:off + inner_chunk]
            sims = _cosine_parity(braw, mat_g[off:off + inner_chunk])
            ii, jj = np.nonzero((sims >= tau)
                                & (bids[:, None] < jids[None, :]))
            outs_a.append(bids[ii])
            outs_b.append(jids[jj])
            outs_c.append(sims[ii, jj])
        return pa.table({
            "a": pa.array(np.concatenate(outs_a) if outs_a
                          else np.empty(0, dtype=np.int64)),
            "b": pa.array(np.concatenate(outs_b) if outs_b
                          else np.empty(0, dtype=np.int64)),
            "cosine": pa.array(np.concatenate(outs_c) if outs_c
                               else np.empty(0), pa.float64()),
        })

    return emb2.map_batches(block, batch_format="pyarrow")


def embedding_neardup_pairs(embeddings: ray.data.Dataset, dim: int,
                            tau: float = 0.9, band_bits: int = 16,
                            n_bits: int = 1024, seed: int = 42,
                            num_partitions: int = 4,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding"
                            ) -> ray.data.Dataset:
    """Candidate pairs from random-hyperplane bands, verified by exact
    cosine >= tau. Output: (a, b, cosine) with a < b.

    Defaults (1024 planes, 16-bit bands => 64 bands) give candidate
    probability 1-(1-(1-θ/π)^16)^64 ≈ 0.996 at cos 0.9 while a random
    pair (cos≈0) collides with p ≈ 1e-3 — the recall-vs-blowup tradeoff
    asserted in tests against the brute-force oracle.
    """
    n_bands = n_bits // band_bits
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    phandle = ray.put(planes)
    weights = (np.uint64(1) << np.arange(band_bits, dtype=np.uint64))

    def to_bands(batch: pa.Table) -> pa.Table:
        r = ray.get(phandle)
        mat = _batch_matrix(batch, emb_col)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        if len(mat) == 0:
            return pa.table({
                "band_hash": pa.array([], pa.int64()),
                "file_id": pa.array([], pa.int64())})
        bits = ((mat @ r) > 0).astype(np.uint64)       # (n, n_bits)
        vals = (bits.reshape(len(mat), n_bands, band_bits)
                * weights[None, None, :]).sum(axis=2).astype(np.uint64)
        # mix the band index into the bucket key (single-key shuffle);
        # the index is SHIFTED above the value bits — xor'ing it into the
        # small value range merges buckets across bands (see
        # neardup.simhash_pairs)
        from data_deduplication_service_ray.functions.hashing import (
            splitmix64)

        idx = np.arange(n_bands, dtype=np.uint64)
        mixed = splitmix64((idx[None, :] << np.uint64(band_bits)) | vals)
        return pa.table({
            "band_hash": pa.array(mixed.reshape(-1).view(np.int64)),
            "file_id": pa.array(np.repeat(ids, n_bands)),
        })

    from data_deduplication_service_ray.config import PipelineConfig
    from data_deduplication_service_ray.stages.neardup import candidate_pairs

    bands = embeddings.map_batches(to_bands, batch_format="pyarrow")
    pairs = candidate_pairs(bands, PipelineConfig())

    # Arrow hash joins reject list-typed payload columns — ship vectors
    # through the join as fixed-width binary (zero semantic loss: float64
    # little-endian bytes), packed from the matrix buffer in one shot
    # (no per-row Python), unpacked zero-copy in the verifier.
    from data_deduplication_service_ray.stages.neardup import (
        fsb_from_matrix, fsb_to_matrix)

    def pack(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, emb_col)
        return pa.table({id_col: batch[id_col],
                         "emb_bytes": fsb_from_matrix(mat)})

    slim = embeddings.select_columns([id_col, emb_col]).map_batches(
        pack, batch_format="pyarrow")

    def rename_for(side: str):
        return {id_col: side, "emb_bytes": f"emb_{side}"}

    left = (pairs.rename_columns({"a": id_col})
            .join(slim, join_type="inner", num_partitions=num_partitions,
                  on=(id_col,))
            .rename_columns(rename_for("a")))
    both = (left.rename_columns({"b": id_col})
            .join(slim, join_type="inner", num_partitions=num_partitions,
                  on=(id_col,))
            .rename_columns(rename_for("b")))

    def _unpack(col: pa.ChunkedArray) -> np.ndarray:
        return fsb_to_matrix(col, np.float64)

    def verify(batch: pa.Table) -> pa.Table:
        ma = _normalize(_unpack(batch["emb_a"]))
        mb = _normalize(_unpack(batch["emb_b"]))
        cos = (ma * mb).sum(axis=1) if len(ma) else np.empty(0)
        keep = cos >= tau
        return pa.table({
            "a": batch["a"].filter(pa.array(keep)),
            "b": batch["b"].filter(pa.array(keep)),
            "cosine": pa.array(cos[keep], pa.float64()),
        })

    return both.map_batches(verify, batch_format="pyarrow")
