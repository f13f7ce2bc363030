"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates a Parquet table with exactly the BASELINE.json ``input_hint``
schema — ``(repo:string, path:string, commit:string, lang:string,
content:string)`` — plus a sidecar ``truth`` table carrying ground-truth
duplicate structure for the recall/precision gates.

Planted row classes (FIXTURES.md §1.1-1.6), mirroring the reference's
fixture design (test/test_data/fixture/block_size/: ½/1/1½/32-block files at
segment 64, intra-file repeated segments in ``1block.txt``):

- ``unique``       independent random content (precision guard)
- ``exact``        identical content under different (repo, path, commit)
- ``near``         seeded token edits at rates 1% / 5% / 20%
- ``contain``      file A embedded verbatim inside a larger file B
- ``boiler``       many files sharing one hot header (LSH hot-bucket driver)
- ``edge``         0.5x / 1x / 1.5x / 32x segment-size contents,
                   an intra-file repeated-segment file, and empty content

Everything is a pure function of (n_rows, seed); no external data.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

_LANGS = ["py", "cpp", "java", "txt"]

_VOCAB = [
    "def", "return", "class", "self", "import", "from", "for", "while",
    "if", "else", "elif", "try", "except", "raise", "with", "lambda",
    "int", "float", "str", "list", "dict", "set", "tuple", "None",
    "True", "False", "assert", "yield", "async", "await", "print",
    "value", "result", "index", "count", "total", "buffer", "stream",
    "hash", "digest", "segment", "block", "batch", "table", "column",
    "row", "key", "node", "edge", "graph", "queue", "stack", "cache",
    "read", "write", "open", "close", "parse", "encode", "decode",
    "merge", "split", "filter", "reduce", "map", "sort", "join",
    "config", "option", "param", "arg", "kwargs", "context", "state",
]

_BOILER_HEADER = (
    "# Licensed under the Apache License, Version 2.0 (the 'License');\n"
    "# you may not use this file except in compliance with the License.\n"
    "# You may obtain a copy of the License at\n"
    "#     http://www.apache.org/licenses/LICENSE-2.0\n"
    "# Unless required by applicable law or agreed to in writing, software\n"
    "# distributed under the License is distributed on an 'AS IS' BASIS.\n"
)


def _commit(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(40))


def _content(rng: random.Random, n_tokens: int) -> str:
    lines, line = [], []
    for _ in range(n_tokens):
        line.append(rng.choice(_VOCAB))
        if len(line) >= rng.randint(4, 9):
            lines.append(" ".join(line))
            line = []
    if line:
        lines.append(" ".join(line))
    return "\n".join(lines)


def _edit(rng: random.Random, text: str, rate: float) -> str:
    """Replace ~rate of tokens with random vocab tokens (seeded)."""
    toks = text.split(" ")
    n_edit = max(1, int(len(toks) * rate))
    for _ in range(n_edit):
        i = rng.randrange(len(toks))
        tail = "\n" + toks[i].split("\n", 1)[1] if "\n" in toks[i] else ""
        toks[i] = rng.choice(_VOCAB) + tail
    return " ".join(toks)


def generate_corpus(n_rows: int, seed: int = 42,
                    segment_size: int = 64) -> tuple[pa.Table, pa.Table]:
    """Return (corpus, truth) Arrow tables; pure function of arguments.

    truth schema: file_idx:int64 (row position), kind:string,
    group_id:int64 (generation group; -1 for singletons),
    edit_rate:double (near-dup edit rate, 0 otherwise).
    """
    rng = random.Random(seed)
    rows: list[tuple[str, str, str, str]] = []  # (repo,path,commit,lang)
    contents: list[str] = []
    kinds: list[str] = []
    groups: list[int] = []
    rates: list[float] = []
    gid = 0

    def emit(content: str, kind: str, group: int, rate: float = 0.0) -> None:
        i = len(contents)
        lang = rng.choice(_LANGS)
        repo = f"org{rng.randrange(20)}/proj{rng.randrange(50)}"
        # include >57-char paths (reference edge case:
        # test/files_service_IT/dbFile_load_delete_tests.cpp:119-145)
        depth = rng.randint(1, 4) if i % 37 else 7
        path = "/".join(f"pkg{rng.randrange(30)}" for _ in range(depth))
        path += f"/file{i}.{lang}"
        rows.append((repo, path, _commit(rng), lang))
        contents.append(content)
        kinds.append(kind)
        groups.append(group)
        rates.append(rate)

    # --- fixed edge-case rows (always present, independent of n_rows) ----
    s = segment_size
    emit("a" * (s // 2), "edge", -1)                   # ½ block
    emit("0123456789abcdef" * (s // 16), "edge", -1)   # 1 block, 4x16 repeat
    emit("b" * s + "c" * (s // 2), "edge", -1)         # 1½ blocks
    emit(_content(random.Random(seed + 1), 32 * s // 6), "edge", -1)  # ~32 blocks
    emit("", "edge", -1)                               # empty (must be filtered)
    emit("", "edge", -1)

    budget = max(n_rows - len(contents), 0)
    n_unique = int(budget * 0.45)
    n_exact_groups = max(1, int(budget * 0.05) // 2)
    n_near_groups = max(1, int(budget * 0.20) // 2)
    n_contain = max(1, int(budget * 0.05) // 2)
    n_boiler = max(2, int(budget * 0.10))

    # Token budgets sized so the mean file lands near real-world source
    # file sizes (~3-6 KB): the scaling benchmark must be dominated by
    # the per-byte compute (shingling/MinHash/verify) the way a real
    # corpus is, not by per-row shuffle overhead on toy snippets.
    for _ in range(n_unique):
        emit(_content(rng, rng.randint(240, 1600)), "unique", -1)

    for _ in range(n_exact_groups):
        text = _content(rng, rng.randint(240, 1600))
        k = rng.choice([2, 2, 3])
        for _ in range(k):
            emit(text, "exact", gid)
        gid += 1

    edit_cycle = [0.01, 0.05, 0.20]
    for j in range(n_near_groups):
        text = _content(rng, rng.randint(480, 1600))
        rate = edit_cycle[j % 3]
        emit(text, "near", gid, rate)
        emit(_edit(rng, text, rate), "near", gid, rate)
        gid += 1

    for _ in range(n_contain):
        inner = _content(rng, rng.randint(160, 480))
        outer = (_content(rng, rng.randint(160, 600)) + "\n" + inner
                 + "\n" + _content(rng, rng.randint(160, 600)))
        emit(inner, "contain", gid)
        emit(outer, "contain", gid)
        gid += 1

    for _ in range(n_boiler):
        emit(_BOILER_HEADER + _content(rng, rng.randint(120, 480)),
             "boiler", -1)

    while len(contents) < n_rows:
        emit(_content(rng, rng.randint(240, 1600)), "unique", -1)

    corpus = pa.table({
        "repo": pa.array([r[0] for r in rows], pa.string()),
        "path": pa.array([r[1] for r in rows], pa.string()),
        "commit": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
        "content": pa.array(contents, pa.string()),
    })
    truth = pa.table({
        "file_idx": pa.array(range(len(contents)), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "group_id": pa.array(groups, pa.int64()),
        "edit_rate": pa.array(rates, pa.float64()),
    })
    return corpus, truth


#: rows per corpus shard file. A single-file single-row-group corpus
#: makes the initial parquet scan SERIAL (Ray cannot split one row
#:  group), which caps read parallelism identically at 8 and 32 CPUs and
#: drags the measured scaling efficiency; ~5k-row shards give the reader
#: one task per shard. v2 in the cache key invalidates the old layout.
_SHARD_ROWS = 5_000


def corpus_path(n_rows: int, seed: int = 42,
                root: str = "/tmp/dedup_corpus") -> str:
    """Generate-once cache: write corpus+truth parquet under a keyed dir.

    ``corpus.parquet`` is a DIRECTORY of ~5k-row shard files (resumable-
    output discipline + splittable scan); ``read_corpus`` accepts it
    unchanged."""
    d = os.path.join(root, f"n{n_rows}_s{seed}_v3")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        corpus, truth = generate_corpus(n_rows, seed)
        shard_dir = os.path.join(d, "corpus.parquet")
        os.makedirs(shard_dir, exist_ok=True)
        n_shards = max(1, (corpus.num_rows + _SHARD_ROWS - 1)
                       // _SHARD_ROWS)
        for s in range(n_shards):
            part = corpus.slice(s * _SHARD_ROWS, _SHARD_ROWS)
            pq.write_table(
                part, os.path.join(shard_dir, f"part-{s:05d}.parquet"))
        pq.write_table(truth, os.path.join(d, "truth.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return d
