"""Segmenter unit tests — the reference's block-size edge cases.

Mirrors test/files_service_IT/dbFile_load_delete_tests.cpp:65-117 fixtures:
½ / 1 / 1½ / 32 blocks at segment 64, intra-file duplicate segments, empty
content rejected.
"""

import hashlib

import numpy as np

import pyarrow as pa
import pytest

from data_deduplication_service_ray.config import PipelineConfig
from data_deduplication_service_ray.stages.segment import (
    Segmenter, _cdc_segments, _fixed_segments)

CFG = PipelineConfig(segment_size=64)


def seg_table(texts, cfg=CFG, mode=None):
    batch = pa.table({"file_id": pa.array(range(len(texts)), pa.int64()),
                      "content": pa.array(texts, pa.string())})
    return Segmenter(cfg, mode)(batch)


def test_half_block():
    out = seg_table(["a" * 32])
    assert out["pos"].to_pylist() == [1]
    assert out["segment"].to_pylist() == ["a" * 32]  # partial kept at length


def test_one_block():
    out = seg_table(["b" * 64])
    assert out["pos"].to_pylist() == [1]
    assert out["segment"].to_pylist() == ["b" * 64]


def test_one_and_half_blocks():
    out = seg_table(["b" * 64 + "c" * 32])
    assert out["pos"].to_pylist() == [1, 2]
    assert out["segment"].to_pylist() == ["b" * 64, "c" * 32]


def test_32_blocks():
    text = "x" * (64 * 32)
    out = seg_table([text])
    assert out.num_rows == 32
    assert "".join(out["segment"].to_pylist()) == text


def test_intra_file_duplicate_segments():
    # reference fixture 1block.txt = 4x16 repeated digits => duplicate
    # segments at segment_size=16
    text = "0123456789abcdef" * 4
    out = seg_table([text], CFG.with_(segment_size=16))
    hashes = out["segment_hash"].to_pylist()
    assert len(hashes) == 4 and len(set(hashes)) == 1


def test_empty_content_rejected():
    out = seg_table(["", "ab"])
    assert out["file_id"].to_pylist() == [1]  # empty row 0 dropped


def test_positions_one_based_and_hash_matches_sha256():
    out = seg_table(["hello world " * 10])
    assert out["pos"].to_pylist()[0] == 1
    seg0 = out["segment"].to_pylist()[0]
    # internal representation is RAW digest bytes (hex only at the
    # oracle boundary, api.hexify_col)
    assert out["segment_hash"].to_pylist()[0] == \
        hashlib.sha256(seg0.encode()).digest()


def test_unicode_segments_split_on_chars():
    text = "é" * 100  # 2 bytes per char; split must be char-based
    out = seg_table([text])
    segs = out["segment"].to_pylist()
    assert [len(s) for s in segs] == [64, 36]
    assert "".join(segs) == text


@pytest.mark.parametrize("hash_name,fn", [
    ("md5", hashlib.md5), ("sha512", hashlib.sha512)])
def test_hash_registry_variants(hash_name, fn):
    out = seg_table(["payload"], CFG.with_(segment_hash=hash_name))
    assert out["segment_hash"].to_pylist()[0] == \
        fn(b"payload").digest()


def test_cdc_roundtrip_and_determinism():
    cfg = CFG.with_(shingle_mode="cdc")
    text = "the quick brown fox jumps over the lazy dog " * 40
    segs = _cdc_segments(text, cfg)
    assert "".join(segs) == text
    assert segs == _cdc_segments(text, cfg)
    assert all(len(s.encode()) <= cfg.cdc_max for s in segs)


def test_cdc_shift_resilience():
    """A prefix insertion must not re-chunk the whole tail (the property
    that motivates CDC over fixed-size segmentation)."""
    import random

    rng = random.Random(7)
    cfg = CFG.with_(shingle_mode="cdc")
    base = " ".join(
        "".join(rng.choice("abcdefghij") for _ in range(rng.randint(3, 9)))
        for _ in range(600))
    shifted = "INSERTED-PREFIX " + base
    a = set(_cdc_segments(base, cfg))
    b = set(_cdc_segments(shifted, cfg))
    assert len(a & b) >= 0.8 * len(a)


def test_fixed_segments_match_python_slicing():
    text = "abcdefghij"
    assert _fixed_segments(text, 3) == ["abc", "def", "ghi", "j"]


def test_token_shingles_whitespace_invariant():
    """Token-mode shingles must be identical under re-indentation /
    re-flowing (the property char k-grams lack on source code), and
    must change when a token changes."""
    from data_deduplication_service_ray.stages.segment import shingle_array

    cfg = CFG.with_(shingle_mode="token")
    code = "def f(x):\n    return x + 1\n"
    reflowed = "def f(x):\n\n\treturn x   + 1"
    edited = "def f(y):\n    return y + 1\n"
    a = shingle_array(code, cfg)
    b = shingle_array(reflowed, cfg)
    c = shingle_array(edited, cfg)
    assert np.array_equal(np.sort(a), np.sort(b))
    assert not np.array_equal(np.sort(a), np.sort(c))
    # distinct from char-mode shingles
    char = shingle_array(code, CFG.with_(shingle_mode="char"))
    assert not np.array_equal(np.sort(a), np.sort(char))


def test_token_shingles_partial_and_empty():
    from data_deduplication_service_ray.stages.segment import shingle_array

    cfg = CFG.with_(shingle_mode="token")
    assert len(shingle_array("", cfg)) == 0
    assert len(shingle_array("   \n\t ", cfg)) == 0       # whitespace only
    one = shingle_array("x", cfg)                          # < k tokens
    assert len(one) == 1
    # deterministic across calls (memo must not perturb values)
    again = shingle_array("x", cfg)
    assert np.array_equal(one, again)


def test_cdc_vectorized_matches_naive_loop():
    """The vectorized CDC kernel (prefix identity + candidate walk) and
    the batch variant must reproduce the per-byte reference loop's cut
    positions bit-for-bit, including multi-byte utf-8 deferrals and
    degenerate min/max configs."""
    import random

    from data_deduplication_service_ray.stages.segment import (
        _cdc_cuts, _cdc_cuts_naive, cdc_cuts_batch)

    rng = random.Random(13)
    alphabet = "abcdef ghij\nklmno 测试数据éü😀"
    for _ in range(150):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 700)))
        cfg = CFG.with_(cdc_min=rng.choice([1, 4, 32, 100]),
                        cdc_avg_bits=rng.choice([1, 3, 6, 8]),
                        cdc_max=rng.choice([3, 16, 64, 256]))
        d = s.encode()
        assert _cdc_cuts(d, cfg) == _cdc_cuts_naive(d, cfg)
    # batch == per-doc across doc boundaries + empty docs
    docs = [("".join(rng.choice(alphabet)
                     for _ in range(rng.randint(0, 500)))).encode()
            for _ in range(40)]
    cfg = CFG.with_(shingle_mode="cdc")
    got = cdc_cuts_batch(docs, cfg)
    for d, cuts in zip(docs, got):
        want = _cdc_cuts_naive(d, cfg) if d else [0]
        if d:
            assert cuts == want
