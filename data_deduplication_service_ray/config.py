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
    cdc_min: int = 32               # content-defined chunking bounds
    cdc_avg_bits: int = 6           # avg chunk = 2**bits
    cdc_max: int = 256

    # --- MinHash / LSH ---------------------------------------------------
    num_perms: int = 128
    lsh_bands: int = 32             # bands * rows_per_band == num_perms
    seed: int = 42
    bucket_cap: int = 512           # max ids fully pair-expanded per bucket
    bucket_window: int = 8          # neighbor window for capped hot buckets

    # --- scoring / verification -----------------------------------------
    jaccard_threshold: float = 0.5  # exact-verify acceptance
    est_prefilter: float = 0.30     # signature-estimate prefilter
    simhash_bits: int = 64
    simhash_max_hamming: int = 8

    # --- clustering ------------------------------------------------------
    max_label_rounds: int = 20      # min-label propagation cap (O(log diam))

    # --- execution -------------------------------------------------------
    batch_size: int = 1024
    minhash_concurrency: int = 4    # actor-pool size for MinHash stage
    join_num_partitions: int = 4   # scale with data volume: each join
                                    # partition is an aggregator actor
                                    # (~0.5s fixed startup cost observed)
    write_mode: str = "overwrite"   # "overwrite" | "skip_existing" (D5 analog:
                                    # ReplaceWithNew / PreserveOld,
                                    # include/fileUtils.h:35-40)

    @property
    def rows_per_band(self) -> int:
        assert self.num_perms % self.lsh_bands == 0
        return self.num_perms // self.lsh_bands

    def with_(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
