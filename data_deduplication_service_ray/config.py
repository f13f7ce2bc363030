"""Pipeline configuration + hash-function registry.

The reference carries per-database config (segment size 2-4096, one of six
OpenSSL digests) as columns on the ``files`` catalog and a compile-time
registry of hash functions (reference: include/HashUtils.h:21-69 — four
parallel constexpr arrays ``funcs``/sizes/names, documented as the plugin
surface in doc/implementationDetails.md:49-101). Here both become plain
Python: a frozen dataclass of knobs and a dict registry.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field, replace


def _hashlib_digest(name: str):
    def digest(data: bytes) -> bytes:
        return hashlib.new(name, data).digest()

    return digest


#: name -> (digest callable bytes->bytes, digest size in bytes).
#: The reference ships SHA224/SHA256/MD5/SHA384/SHA512/MD4
#: (include/HashUtils.h:48-56). MD4 is not provided by modern OpenSSL/hashlib
#: builds; blake2b-16 is registered in its slot as a modern fast digest.
HASH_REGISTRY: dict[str, tuple] = {
    "sha224": (_hashlib_digest("sha224"), 28),
    "sha256": (_hashlib_digest("sha256"), 32),
    "md5": (_hashlib_digest("md5"), 16),
    "sha384": (_hashlib_digest("sha384"), 48),
    "sha512": (_hashlib_digest("sha512"), 64),
    "blake2b16": (lambda b: hashlib.blake2b(b, digest_size=16).digest(), 16),
}


@dataclass(frozen=True)
class PipelineConfig:
    """All knobs of the dedup + near-dup pipeline.

    Mirrors the reference's free parameters (segment size / hash function,
    src/MainWindow.cpp:10-11, test/bencmark.cpp:18-19) and adds the
    near-duplicate config mandated by BASELINE.json's north_star:
    MinHash(128) banded LSH + SimHash-64 + containment + clustering.
    """

    # --- exact segment dedup (reference parity) -------------------------
    segment_size: int = 64          # bytes/chars per fixed segment (2..4096)
    segment_hash: str = "sha256"    # key into HASH_REGISTRY

    # --- shingling for near-dup -----------------------------------------
    shingle_k: int = 8              # char k-gram width
    shingle_mode: str = "char"      # "char" | "token" | "cdc"
    shingle_token_k: int = 5        # token k-gram width for mode="token"
                                    # (whitespace-insensitive source-code
                                    # shingles; 5 tokens ≈ one statement)
    cdc_min: int = 32               # content-defined chunking bounds
    cdc_avg_bits: int = 6           # avg chunk = 2**bits
    cdc_max: int = 256

    # --- MinHash / LSH ---------------------------------------------------
    num_perms: int = 128
    minhash_scheme: str = "oph"     # "oph" (one-permutation hashing,
                                    # O(n) per doc) | "kperm" (classic
                                    # 128 independent permutations)
    lsh_bands: int = 32             # bands * rows_per_band == num_perms
    seed: int = 42
    bucket_cap: int = 64            # max ids fully pair-expanded per
                                    # bucket; beyond it only a sorted
                                    # neighbor window of edges is emitted.
                                    # Low on purpose: a >64-member LSH
                                    # bucket is a quasi-clique (license-
                                    # only files, generated code) whose
                                    # O(k²) pairs all land in one cluster
                                    # anyway — the window keeps the
                                    # component connected at O(k·w)
    bucket_window: int = 8          # neighbor window for capped hot buckets

    # --- scoring / verification -----------------------------------------
    jaccard_threshold: float = 0.7  # exact-verify acceptance; the
                                    # (lsh_bands, rows_per_band) defaults
                                    # are sized so P(candidate) >= 0.995
                                    # at exactly this threshold (recall
                                    # gate math in tests/test_neardup)
    est_prefilter_margin: float = 0.2
                                    # signature-estimate prefilter keeps
                                    # pairs with est >= threshold-margin;
                                    # at 128 perms the estimate σ is
                                    # ≤0.045, so a 0.2 margin (>4σ) loses
                                    # <1e-5 of true pairs while dropping
                                    # the low-J candidate bulk before the
                                    # content join
    simhash_bits: int = 64
    simhash_max_hamming: int = 8

    # --- clustering ------------------------------------------------------
    max_label_rounds: int = 20      # min-label propagation cap (O(log diam))

    # --- execution -------------------------------------------------------
    batch_size: int = 1024
    sig_batch_size: int = 256       # smaller batches for the CPU-heavy
                                    # signature stage: corpus_size/batch
                                    # tasks must exceed the worker count
                                    # or cores idle
    minhash_concurrency: int | None = None
                                    # actor-pool max for signature/verify
                                    # stages; None = all cluster CPUs at
                                    # stage-launch time (pools autoscale
                                    # from 1, so idle actors cost nothing)
    join_num_partitions: int | None = None
                                    # hash-join/shuffle partition count;
                                    # None = max(8, cluster CPUs). Join
                                    # output partitions also bound the
                                    # downstream map parallelism, so too
                                    # few partitions serializes the next
                                    # actor-pool stage
    unionfind_edge_limit: int = 5_000_000
                                    # clusters(method="auto"): below this
                                    # edge count the streamed union-find
                                    # wins (one process, no per-round
                                    # shuffles); above it, distributed
                                    # label propagation
    write_mode: str = "overwrite"   # "overwrite" | "skip_existing" (D5 analog:
                                    # ReplaceWithNew / PreserveOld,
                                    # include/fileUtils.h:35-40)

    @property
    def rows_per_band(self) -> int:
        assert self.num_perms % self.lsh_bands == 0
        return self.num_perms // self.lsh_bands

    def with_(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)


def gate(value: int, name: str | None = None) -> int:
    """Count-gate limit helper. The house pattern is "count-gated driver
    fast paths with parity-tested distributed fallbacks": every limit
    below which a single-process shortcut runs is declared through this
    function, so ``GRAFT_FORCE_DISTRIBUTED=1`` zeroes them all at import
    time and the whole pipeline runs the code paths a real multi-node
    cluster would — the benchmark for those paths is recorded in
    BASELINE.md.

    ``name`` additionally exposes the gate as ``GRAFT_GATE_<NAME>`` so a
    deployment can retune ONE limit without a code edit (e.g. lowering
    ``GRAFT_GATE_DRIVER_PAIR_EXPAND_LIMIT`` on a multi-node cluster,
    where each range-expansion task maps every sorted block and the
    single-box zero-copy rationale no longer holds). The per-gate
    override wins over the default; FORCE_DISTRIBUTED zeroes even
    overridden gates (it is the "run every fallback" switch)."""
    import os

    if os.environ.get("GRAFT_FORCE_DISTRIBUTED") == "1":
        return 0
    if name is not None:
        env = os.environ.get(f"GRAFT_GATE_{name.upper()}")
        if env is not None:
            return int(env)
    return value


def join_parts(cfg: PipelineConfig) -> int:
    """Resolved join/shuffle partition count for this cluster.

    Each partition is an aggregator ACTOR holding a CPU + memory
    reservation for the whole join; chaining several joins in one lazy
    graph multiplies that, so the default stays at cpus/2 (capped) —
    enough partitions that join outputs don't serialize downstream maps,
    few enough that two chained joins still fit a small machine. Large
    clusters set ``join_num_partitions`` explicitly.
    """
    if cfg.join_num_partitions is not None:
        return cfg.join_num_partitions
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, min(16, cpus // 2))


DEFAULT_CONFIG = PipelineConfig()
