"""Property tests: the SPDX fallback parser against generated expression
trees, and connected components against a pure-python union-find."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from mlcast_sourcedata_validator_spark.functions.dedup import (
    connected_components,
)
from mlcast_sourcedata_validator_spark.operators.licensing import (
    KNOWN_EXCEPTIONS,
    KNOWN_SPDX,
    _normalize_fallback,
)


# --- SPDX expression generator ----------------------------------------------

def _expr_tree(rng: random.Random, depth: int) -> tuple[str, str]:
    """(scrambled_rendering, canonical_rendering) of a random valid SPDX
    expression."""
    if depth == 0 or rng.random() < 0.4:
        lic = rng.choice(KNOWN_SPDX)
        plus = "+" if rng.random() < 0.2 else ""
        out = lic + plus
        if rng.random() < 0.2:
            exc = rng.choice(KNOWN_EXCEPTIONS)
            scrambled = f"{_scramble(rng, lic)}{plus} " \
                        f"{_rand_case(rng, 'WITH')} {_scramble(rng, exc)}"
            return scrambled, f"{out} WITH {exc}"
        return _scramble(rng, lic) + plus, out
    op = rng.choice(["AND", "OR"])
    ls, lc = _expr_tree(rng, depth - 1)
    rs, rc = _expr_tree(rng, depth - 1)
    if rng.random() < 0.5:
        return (f"({ls} {_rand_case(rng, op)} {rs})",
                f"({lc} {op} {rc})")
    return f"{ls} {_rand_case(rng, op)} {rs}", f"{lc} {op} {rc}"


def _scramble(rng: random.Random, ident: str) -> str:
    return "".join(
        c.upper() if rng.random() < 0.5 else c.lower() for c in ident
    )


def _rand_case(rng: random.Random, word: str) -> str:
    return word.upper() if rng.random() < 0.5 else word.lower()


@given(st.integers(min_value=0, max_value=2 ** 32 - 1),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=200, deadline=None)
def test_spdx_fallback_normalizes_generated_expressions(seed, depth):
    rng = random.Random(seed)
    scrambled, canonical = _expr_tree(rng, depth)
    assert _normalize_fallback(scrambled) == canonical
    # canonical input is a fixed point
    assert _normalize_fallback(canonical) == canonical


@given(st.integers(min_value=0, max_value=2 ** 32 - 1))
@settings(max_examples=100, deadline=None)
def test_spdx_fallback_rejects_mutations(seed):
    rng = random.Random(seed)
    _, canonical = _expr_tree(rng, 2)
    toks = canonical.replace("(", " ( ").replace(")", " ) ").split()
    mutation = rng.choice(["junk_id", "drop_tail", "unbalance"])
    if mutation == "junk_id":
        idx = [i for i, t in enumerate(toks)
               if t not in ("(", ")", "AND", "OR", "WITH")]
        toks[rng.choice(idx)] = "Not-A-License-9.9"
        bad = " ".join(toks)
    elif mutation == "drop_tail":
        bad = " ".join(toks) + " OR"
    else:
        bad = "(" + " ".join(toks)
    assert _normalize_fallback(bad) is None


# --- connected components vs union-find -------------------------------------

def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_connected_components_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = sorted({
        tuple(sorted(rng.sample(range(n), 2)))
        for _ in range(rng.randint(5, 60))
    })
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {r.node: r.cluster_id
           for r in connected_components(pairs, max_iter=50).collect()}
    assert got == _uf_components(edges)


@given(st.floats(min_value=0.05, max_value=0.99))
@settings(max_examples=200, deadline=None)
def test_bands_for_threshold_invariants(t):
    """For any threshold: the banding fits the signature, achieves the
    promised pair recall AT the threshold, and is the MOST selective
    (largest band) that does so."""
    from mlcast_sourcedata_validator_spark.functions.dedup import (
        bands_for_threshold,
    )
    from mlcast_sourcedata_validator_spark.functions.hashing import (
        MINHASH_COEFFS,
    )

    n_hashes = len(MINHASH_COEFFS)
    b, r = bands_for_threshold(t)
    assert 1 <= r <= n_hashes and 1 <= b and b * r <= n_hashes
    recall = 1 - (1 - t ** r) ** b
    assert recall >= 0.98 or r == 1  # r=1 is the fallback floor
    # maximality: no larger band size also meets the bar
    for r2 in range(r + 1, n_hashes + 1):
        b2 = n_hashes // r2
        assert 1 - (1 - t ** r2) ** b2 < 0.98


# --- categorical drift statistics invariants --------------------------------

@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=2,
                max_size=12),
       st.lists(st.integers(min_value=0, max_value=10_000), min_size=2,
                max_size=12))
@settings(max_examples=200, deadline=None)
def test_tvd_psi_invariants(a, b):
    """TVD ∈ [0,1] and symmetric; PSI >= 0 and symmetric; V >= 0.
    Histograms are truncated to equal length (zip semantics)."""
    from mlcast_sourcedata_validator_spark.operators.drift import (
        tvd_psi_cramers,
    )

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    tvd, psi, v = tvd_psi_cramers(a, b)
    if sum(a) == 0 or sum(b) == 0:
        assert tvd != tvd  # NaN contract for an empty side
        return
    assert -1e-12 <= tvd <= 1.0 + 1e-12
    assert psi >= -1e-12
    assert v >= 0.0
    tvd2, psi2, _ = tvd_psi_cramers(b, a)
    assert abs(tvd - tvd2) < 1e-12
    assert abs(psi - psi2) < 1e-9
    # identical histograms: all three vanish
    t0, p0, v0 = tvd_psi_cramers(a, a)
    assert abs(t0) < 1e-12 and abs(p0) < 1e-12 and abs(v0) < 1e-12
