"""Distributed Bloom filters for semi-join reduction.

The 100-TB shape this serves: the incremental content-hash dedup index
(functions/dedup.py ``content_index_specs``) grows with every ingested
partition, and each new batch anti-joins against it. That anti-join
shuffles the batch's distinct hashes AND the index every day — yet on a
fresh crawl the overwhelming majority of batch rows match NOTHING in the
index. A Bloom filter over the index's hashes, broadcast to the batch
scan, answers "definitely not in the index" map-side: those rows skip
the join entirely, and only probable hits (true duplicates + an
``fpp``-bounded sliver of false positives) enter the exact anti-join.
Exactness is unconditional — a Bloom "no" is never wrong, and every
"maybe" is re-checked by the exact join — so the filter only removes
join traffic, never changes the answer (the classic Bloom semi-join
reduction, e.g. the runtime row-level filters Spark's own
InjectRuntimeFilter rule builds for shuffle joins).

Build is fully distributed and shuffle-sparse: each row map-side emits
its k bit positions, positions aggregate into 64-bit words with
map-side-partial ``bit_or`` (the shuffle carries at most one partial per
(word, task), bounded by the filter's nonzero words, never by row
count), and only the nonzero words are collected. Driver/executor
memory is the word array itself: m/8 bytes, so ~1.2 GB at n=10^9 keys
and fpp=1% — the practical band for a single broadcast filter. Beyond
that, shard the index by a hash prefix and build one filter per shard
(each batch partition probes only its shard's filter); this module
provides the mergeable word-array representation (``bloom_merge``) that
sharding and incremental maintenance both need: Bloom filters over the
same (m, k, seed) are unioned by OR-ing words, so the index's filter is
maintained incrementally next to the index rollup instead of rebuilt
from history.

Hashing is Spark's ``xxhash64`` (JVM-side, codegen'd) with double
hashing h_i = h1 + i*h2 (Kirsch–Mitzenmacher): the probe's only Python
is a vectorized numpy bit-test over Arrow batches. NULL inputs hash as
one constant group (xxhash64 skips NULL args), matching the
NULL-content-sentinel semantics of ``dedup_against_index``.

No reference analog (the reference validates one in-memory dataset,
checks/ *.py); this is scale infrastructure for the incremental-dedup
story.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BloomFilter",
    "bloom_params",
    "bloom_build",
    "bloom_merge",
    "bloom_to_bytes",
    "bloom_from_bytes",
    "with_bloom_flag",
]

#: hard cap on filter size: 2^41 bits = 256 GiB of words — far past what
#: one broadcast can carry; a request beyond it is a sharding problem,
#: not a bigger-filter problem, so fail loudly instead of OOMing the
#: driver
_MAX_M_BITS = 1 << 41
_MAX_K = 16


@dataclass
class BloomFilter:
    """An immutable built filter: the word array plus the parameters a
    probe must share bit-for-bit (same m, k, seed) to be meaningful."""

    words: np.ndarray  # uint64, length m // 64
    m: int  # number of bits (multiple of 64)
    k: int  # number of hash functions
    seed: int
    n_items: int  # build-time item estimate (for fpp bookkeeping)

    def fpp_estimate(self) -> float:
        """Observed false-positive probability: (fraction of set bits)^k
        — tighter than the design fpp when the build saw fewer items
        than ``n_items``."""
        if self.m == 0:
            return 1.0
        load = float(np.sum(_popcount64(self.words))) / self.m
        return load**self.k


def _popcount64(words: np.ndarray) -> np.ndarray:
    # numpy<2 has no popcount ufunc; byte-view + unpackbits is exact
    return np.unpackbits(words.view(np.uint8)).reshape(len(words), 8, 8).sum(
        axis=(1, 2)
    ) if len(words) else np.zeros(0, dtype=np.int64)


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` keys at false-positive rate
    ``fpp``; m is rounded up to a multiple of 64."""
    if n_items <= 0:
        return 64, 1
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    if m > _MAX_M_BITS:
        raise ValueError(
            f"bloom of {m} bits for n_items={n_items} exceeds the "
            f"single-filter cap ({_MAX_M_BITS}); shard the keys by hash "
            "prefix and build one filter per shard"
        )
    k = max(1, min(_MAX_K, round(m / n_items * math.log(2))))
    return m, k


def _hash_ab(col: Column, m: int, seed: int) -> tuple[Column, Column]:
    """Double-hashing bases as JVM Columns: a in [0, m), b in [1, m).

    Both already reduced mod m so ``a + i*b`` (i < k <= 16) stays far
    below int64 even under ANSI arithmetic (m <= 2^41)."""
    h1 = F.xxhash64(F.lit(seed), col)
    h2 = F.xxhash64(F.lit(seed + 1), col)
    a = F.pmod(h1, F.lit(m))
    b = F.pmod(h2, F.lit(m - 1)) + F.lit(1)
    return a, b


def _positions(col: Column, m: int, k: int, seed: int) -> Column:
    a, b = _hash_ab(col, m, seed)
    return F.array(*[F.pmod(a + F.lit(i) * b, F.lit(m)) for i in range(k)])


def bloom_build(
    df: DataFrame,
    col: str,
    n_items: int | None = None,
    fpp: float = 0.01,
    seed: int = 0,
) -> BloomFilter:
    """Build a Bloom filter over ``df[col]`` distributed.

    Plan: one scan emitting each row's k bit positions (map-side
    expressions), explode, ``groupBy(word).agg(bit_or(bit))`` with
    map-side partial combine, collect ONLY the nonzero words. Shuffle
    and collect are bounded by the filter's word count (m/64), never by
    the row count.

    ``n_items``: sizing estimate. Pass the known index cardinality (the
    rollup store carries it) — ``None`` runs a count() first, an extra
    job callers at scale should avoid. Undersizing degrades fpp, never
    correctness.
    """
    if n_items is None:
        n_items = df.count()
    m, k = bloom_params(n_items, fpp)
    pos = F.explode(_positions(F.col(col), m, k, seed)).alias("_pos")
    words = (
        df.select(pos)
        .select(
            F.expr("_pos div 64").alias("_w"),
            F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_word"))
        .collect()
    )
    arr = np.zeros(m // 64, dtype=np.uint64)
    if words:
        idx = np.array([r["_w"] for r in words], dtype=np.int64)
        val = np.array([r["_word"] for r in words], dtype=np.int64)
        arr[idx] = val.astype(np.uint64)  # astype keeps the bit pattern
    return BloomFilter(words=arr, m=m, k=k, seed=seed, n_items=n_items)


def bloom_merge(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """Union two filters built with identical (m, k, seed): bitwise OR.

    This is what makes the filter maintainable next to an incremental
    index: build a small filter over each new delta's keys and OR it in
    — no rebuild over history."""
    if (a.m, a.k, a.seed) != (b.m, b.k, b.seed):
        raise ValueError(
            f"cannot merge blooms with different params: "
            f"{(a.m, a.k, a.seed)} vs {(b.m, b.k, b.seed)}"
        )
    return BloomFilter(
        words=a.words | b.words,
        m=a.m,
        k=a.k,
        seed=a.seed,
        n_items=a.n_items + b.n_items,
    )


_HEADER = struct.Struct("<4sQIIQ")  # magic, m, k, seed, n_items
_MAGIC = b"BLM1"


def bloom_to_bytes(bf: BloomFilter) -> bytes:
    """Serialize for storage next to the index rollup (one small binary
    sidecar per committed delta; resume re-reads and ORs them)."""
    return _HEADER.pack(_MAGIC, bf.m, bf.k, bf.seed, bf.n_items) + \
        bf.words.tobytes()


def bloom_from_bytes(data: bytes) -> BloomFilter:
    magic, m, k, seed, n_items = _HEADER.unpack_from(data)
    if magic != _MAGIC:
        raise ValueError("not a serialized BloomFilter")
    words = np.frombuffer(data, dtype=np.uint64, offset=_HEADER.size).copy()
    if len(words) != m // 64:
        raise ValueError(
            f"corrupt BloomFilter: {len(words)} words for m={m}")
    return BloomFilter(words=words, m=m, k=k, seed=seed, n_items=n_items)


def with_bloom_flag(
    df: DataFrame, col: str, bf: BloomFilter, flag_col: str = "_bloom_hit"
) -> DataFrame:
    """Append boolean ``flag_col``: True = the filter MIGHT contain the
    value (false positives at the filter's fpp), False = it definitely
    does not.

    Hashing stays JVM-side (two xxhash64 columns); the word array ships
    once per executor as a broadcast and the bit test is one vectorized
    numpy gather per Arrow batch — no per-row Python.
    """
    from pyspark.sql import SparkSession

    m, k = bf.m, bf.k
    spark = df.sparkSession or SparkSession.getActiveSession()
    words_bc = spark.sparkContext.broadcast(bf.words)

    @F.pandas_udf("boolean")
    def _probe(a: pd.Series, b: pd.Series) -> pd.Series:
        w = words_bc.value
        A = a.to_numpy(dtype=np.int64)
        B = b.to_numpy(dtype=np.int64)
        if len(A) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        ks = np.arange(k, dtype=np.int64)[None, :]
        pos = (A[:, None] + ks * B[:, None]) % m
        shifts = (pos & 63).astype(np.uint64)
        hit = ((w[pos >> 6] >> shifts) & np.uint64(1)).astype(bool)
        return pd.Series(hit.all(axis=1))

    a, b = _hash_ab(F.col(col), m, bf.seed)
    return df.withColumn(flag_col, _probe(a, b))
