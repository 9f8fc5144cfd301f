"""Engine-portable deterministic hashing for dedup/fingerprinting.

Spark's ``xxhash64``/``hash`` have no DuckDB equivalent, so every hash the
DuckDB oracle must reproduce is built from arithmetic both engines compute
identically on int64:

- ``enc4``: a 4-char shingle packs into an int via base-256 of its ASCII
  codes, reduced mod the Mersenne prime ``P = 2^31 - 1``.
- universal hashes ``h_j(x) = (A_j * x + B_j) mod P`` with fixed small
  coefficients — ``A_j * x < 2^20 * 2^31 = 2^51`` so int64 never overflows
  in either engine.

The same formulas are emitted as ANSI SQL by the ``*_sql`` helpers so the
Spark implementation and the DuckDB oracle are generated from one spec
(single source of truth for the correctness gate in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1
SHINGLE_K = 4

#: (A_j, B_j) for 16 universal hashes -> 4 LSH bands of 4 rows
MINHASH_COEFFS = [
    (824393, 93202), (482263, 93859), (433993, 77641), (993319, 28657),
    (786433, 908933), (655357, 131071), (524287, 287117), (919393, 333667),
    (876257, 786449), (604171, 402653), (746773, 536879), (362717, 196613),
    (590921, 649657), (433531, 274177), (918869, 180511), (680567, 462829),
]
N_BANDS = 4
BAND_SIZE = 4


def enc4(s: Column) -> Column:
    """Pack the first 4 chars of ``s`` into an int64, mod P.

    Each ``ascii()`` (really: code point — both engines return it for
    non-ASCII chars) is cast to LONG *before* the base-256 multiply:
    ``ascii()`` is INT32 and any code point >= 128 (é = 233, every
    non-Latin script, non-BMP) overflows ``233 * 16777216`` in 32 bits,
    which under Spark's default ANSI mode aborts the whole job — found
    by the hypothesis cross-engine kernel test, mirroring the explicit
    ``::BIGINT`` casts :func:`enc4_sql` always had."""
    def cp(i: int) -> Column:
        return F.ascii(F.substring(s, i, 1)).cast("long")

    x = (cp(1) * F.lit(16777216) + cp(2) * F.lit(65536)
         + cp(3) * F.lit(256) + cp(4))
    return F.pmod(x, F.lit(P))


def enc4_sql(s: str) -> str:
    # explicit BIGINT casts: DuckDB's ascii() returns INT32 and the base-256
    # products overflow 32 bits
    return (
        f"((ascii(substr({s},1,1))::BIGINT*16777216 "
        f"+ ascii(substr({s},2,1))::BIGINT*65536 "
        f"+ ascii(substr({s},3,1))::BIGINT*256 "
        f"+ ascii(substr({s},4,1))::BIGINT) % {P})"
    )


def uhash(x: Column, j: int) -> Column:
    a, b = MINHASH_COEFFS[j]
    return F.pmod(x * F.lit(a) + F.lit(b), F.lit(P))


def uhash_sql(x: str, j: int) -> str:
    a, b = MINHASH_COEFFS[j]
    return f"(({x} * {a}::BIGINT + {b}) % {P})"


def char_shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Array of k-char shingles (JVM-side: sequence+transform+substring)."""
    n = F.greatest(F.length(text) - (k - 1), F.lit(0))
    return F.when(n > 0, F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(text, i, F.lit(k))
    )).otherwise(F.array().cast("array<string>"))


def char_shingles_sql(text: str, k: int = SHINGLE_K) -> str:
    """DuckDB list comprehension mirroring :func:`char_shingles`."""
    return (
        f"[substr({text}, i, {k}) for i in "
        f"generate_series(1, greatest(length({text}) - {k - 1}, 0))]"
    )


SHINGLE_PAD = "____________"  # pad to >=12 chars so all 3 enc4 chunks exist


def encw(s: Column) -> Column:
    """Portable encoding of a (word-)shingle string: three enc4 chunks of
    the underscore-padded first 12 chars, rolling-combined mod P. Spans
    enough of the shingle that multi-word shingles differing beyond char 4
    (where plain enc4 stops reading) still hash apart."""
    p = F.concat(s, F.lit(SHINGLE_PAD))
    h = enc4(p)
    for off in (5, 9):
        h = F.pmod(h * F.lit(65599) + enc4(F.substring(p, off, 4)), F.lit(P))
    return h


def encw_sql(s: str) -> str:
    p = f"({s} || '{SHINGLE_PAD}')"
    h = enc4_sql(p)
    for off in (5, 9):
        h = f"(({h} * 65599 + {enc4_sql(f'substr({p}, {off}, 4)')}) % {P})"
    return h


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-word shingles over whitespace tokens.

    The token array is bound ONCE per row as a lambda variable (the
    single-element outer ``transform``): referencing ``F.split(text)``
    directly inside the per-shingle lambda would re-split the whole text
    for every ``element_at`` — measured ~19 us/shingle (3 full splits per
    shingle) vs sub-us with the binding."""
    def _shingle(toks: Column) -> Column:
        cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        return F.when(cnt > 0, F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        )).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(F.split(text, " ")), _shingle), 1)


def word_shingles_sql(tokens: str, n: int = 3) -> str:
    """DuckDB list comprehension over a token-list expression ``tokens``
    (e.g. a CTE column holding ``string_split(text, ' ')``); 1-based list
    indexing matches Spark's element_at."""
    parts = " || ' ' || ".join(f"{tokens}[i+{j}]" for j in range(n))
    return (
        f"[{parts} for i in "
        f"generate_series(1, greatest(len({tokens}) - {n - 1}, 0))]"
    )
