"""Ordering / uniqueness / timestep checks over one shared window pass.

The reference derives consecutive-element diffs of the time axis once and
shares the analysis between two checks via a memo cache
(checks/coords/variable_timestep.py:12-57, reused by
checks/global_attributes/conditional.py:13-24). The Spark-native
re-expression: ONE ``Window.partitionBy(conv_id).orderBy(turn_idx)``
enrichment computing ``lag(ts)``, ``lag(turn_idx)`` and ``row_number``,
shared by every check below — a single shuffle on conv_id covers:

- uniqueness of (conv_id, turn_idx)        [north_rule primary key]
- turn_idx contiguity (gaps) + first-turn-is-0
- ts monotonicity within a conversation    (lag diff < 0, cf. FIXTURES
  ts_regress)
- variable-timestep detection per conversation (distinct consecutive
  diffs > 1 — semantics of variable_timestep.py:49-54, per conversation)

The enrichment columns are provided by the compiler (see compiler.py:
``_LAG_TS``/``_LAG_TURN``/``_RN``); each check here is a predicate over
them, so adding checks adds zero extra shuffles.

This window sort is also what fixes the stable (conv_id, turn_idx) order
required by the per-turn text-equality invariant (BASELINE.json
input_hint).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..report import FAIL, PASS, WARNING, ValidationReport, stamp
from ..suite import CheckSpec, CheckSuite, RowCheck

_MOD = __name__

# helper column names injected by the compiler's window enrichment
LAG_TS = "_lag_ts"
LAG_TURN = "_lag_turn"
RN = "_rn"
N_DISTINCT_DT = "_n_distinct_dt"  # per-conv distinct consecutive ts diffs
IS_LAST = "_is_last"


def compile_unique_key(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """(conv_id, turn_idx) must be unique: duplicate = turn_idx == lag(turn_idx)."""
    turn = F.col(suite.turn_col)
    pred = F.col(LAG_TURN).isNotNull() & (turn == F.col(LAG_TURN))
    detail = F.concat(F.lit("duplicate key (conv_id, turn_idx=") ,
                      turn.cast("string"), F.lit(")"))

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} duplicate (conv_id, turn_idx) keys")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       "(conv_id, turn_idx) is unique")
        return stamp(report, _MOD, "compile_unique_key")

    return [RowCheck(spec.check_id, pred, detail, verdict, needs_window=True)]


def compile_turn_contiguity(
    spec: CheckSpec, suite: CheckSuite, partition_scoped: bool = False
) -> list[RowCheck]:
    """turn_idx must start at 0 and increase without gaps.

    Gap = turn_idx > lag(turn_idx) + 1 (strictly greater, so duplicates are
    attributed to the uniqueness check, not double-counted here).
    params: require_zero_start: bool (default: True for whole-table runs,
    False for partition-scoped runs).

    Partition-scoped batches check INTERNAL gaps only: a conversation
    legitimately continues across date partitions, so "first turn in this
    batch is 0" is not a locally decidable property — enforcing it would
    FAIL every boundary-spanning conversation. The global start-at-0 and
    cross-boundary continuity are decided from the merged rollup
    (functions/rollup.py `contiguity_audit`, O(#convs), no raw re-scan).
    An explicit ``require_zero_start`` in params overrides either default.
    """
    turn = F.col(suite.turn_col)
    require_zero = spec.params.get("require_zero_start", not partition_scoped)

    gap = F.col(LAG_TURN).isNotNull() & (turn > F.col(LAG_TURN) + 1)
    first_bad = (F.col(RN) == 1) & (turn != 0) if require_zero else F.lit(False)
    pred = gap | first_bad
    detail = F.when(
        gap,
        F.concat(F.lit("turn gap: "), F.col(LAG_TURN).cast("string"),
                 F.lit(" -> "), turn.cast("string")),
    ).otherwise(F.concat(F.lit("first turn_idx is "), turn.cast("string"),
                         F.lit(", expected 0")))

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} turn-index discontinuities")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       "turn_idx contiguous from 0 in every conversation"
                       if require_zero else
                       "turn_idx internally contiguous (partition-scoped: "
                       "start-at-0 decided by the rollup audit)")
        return stamp(report, _MOD, "compile_turn_contiguity")

    return [RowCheck(spec.check_id, pred, detail, verdict, needs_window=True)]


def compile_ts_monotonic(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """ts must be non-decreasing within a conversation (lag diff >= 0).

    params: strict: bool = False (if True, equal timestamps also violate).
    """
    ts = F.col(suite.ts_col)
    strict = spec.params.get("strict", False)
    regressed = F.col(LAG_TS).isNotNull() & (
        (ts <= F.col(LAG_TS)) if strict else (ts < F.col(LAG_TS))
    )
    detail = F.concat(F.lit("ts regression: "), F.col(LAG_TS).cast("string"),
                      F.lit(" -> "), ts.cast("string"))

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} timestamp regressions within conversations")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       "ts monotonic within every conversation")
        return stamp(report, _MOD, "compile_ts_monotonic")

    return [RowCheck(spec.check_id, regressed, detail, verdict, needs_window=True)]


def compile_max_conv_turns(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """Bound conversation length: > ``max_turns`` turns is a violation.

    This is the suite's OWN skew guard made explicit: the fused plan's
    only shuffle is the per-conversation window, and the compiler's
    scale argument (compiler.py header) is that hot conv_ids cannot
    create a straggler partition because per-key volume is bounded by
    conversation length. This check ENFORCES that bound as a data
    invariant instead of assuming it — a runaway logger stitching
    millions of turns onto one conv_id surfaces as a FAIL with the
    offending conv_id, not as a silent straggler task.

    Zero extra cost: fires on exactly the (max_turns+1)-th row of an
    offending conversation using the row_number the shared window
    already computes — one violation row per overlong conversation, no
    per-conv aggregate, no second window.

    Partition-scoped batches apply the bound to the LOCAL row_number —
    a conversation split across date partitions can only under-count,
    never false-FAIL; the cross-partition total is the conv rollup's
    territory (functions/rollup.py per-conv turn counts).

    params: max_turns: int (required).
    """
    max_turns = int(spec.params["max_turns"])
    pred = F.col(RN) == max_turns + 1
    detail = F.lit(f"conversation exceeds max_turns={max_turns}")

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} conversations longer than "
                       f"{max_turns} turns")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"every conversation within {max_turns} turns")
        return stamp(report, _MOD, "compile_max_conv_turns")

    return [RowCheck(spec.check_id, pred, detail, verdict, needs_window=True)]


def compile_variable_timestep(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """Per-conversation variable-timestep detection.

    Semantics of checks/coords/variable_timestep.py:60-139 applied per
    conversation: a conversation has a variable timestep when it has > 1
    distinct consecutive ts diff. If ``allow_variable_timestep`` (default
    True) the check PASSes unconditionally (like the reference's PASS path
    at variable_timestep.py:100-110); otherwise each variable conversation
    yields one violation row, flagged on the conversation's last turn so the
    check costs no extra aggregation beyond the shared window pass.

    The ``allow`` form is a constant-false predicate that must NOT claim
    the window (``needs_window=False``): in a suite where it would be the
    only window check, ``needs_window=True`` would compel the compiler to
    build the conv_id shuffle + enrichment — the plan's single most
    expensive stage — solely to evaluate ``lit(False)``.
    """
    allow = spec.params.get("allow_variable_timestep", True)
    if allow:
        # no violation rows and no reference to the (unbuilt) conv-stat cols
        pred = F.lit(False)
        detail = F.lit("")
    else:
        pred = F.col(IS_LAST) & (F.col(N_DISTINCT_DT) > 1)
        detail = F.concat(F.lit("conversation has "),
                          F.col(N_DISTINCT_DT).cast("string"),
                          F.lit(" distinct timestep diffs"))

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if allow:
            report.add(spec.section, spec.requirement, PASS,
                       "variable timesteps allowed by suite")
        elif n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} conversations with variable timestep")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       "constant timestep in every conversation")
        return stamp(report, _MOD, "compile_variable_timestep")

    return [RowCheck(spec.check_id, pred, detail, verdict,
                     needs_window=not allow)]


ROLE_CODE = "_rolec"
LAG_ROLE = "_lag_rolec"


def role_code_expr(column: str, roles: list[str]):
    """Map-side tiny-int encoding of the role column (unknown -> -1) —
    what rides the slim projection through the window shuffle instead of
    the full role string (~1 byte vs ~9)."""
    expr = F.lit(-1)
    out = None
    for i, r in enumerate(roles):
        cond = F.col(column) == r
        out = F.when(cond, F.lit(i)) if out is None else out.when(cond, F.lit(i))
    return (out.otherwise(expr) if out is not None else expr).cast("int")


def compile_role_transitions(
    spec: CheckSpec, suite: CheckSuite, partition_scoped: bool = False
) -> list[RowCheck]:
    """Conversation GRAMMAR check: within each conversation (ordered by
    turn), every (previous role -> role) transition must be in the
    allowed set, and the first turn's role must be in ``start_roles``.
    The transcripts-native well-formedness check — e.g. a tool turn only
    after an assistant turn, no double-assistant.

    params: column='role', roles=[...] (the code alphabet; values outside
    it are code -1 and always violate), allowed=[[from, to], ...],
    start_roles=[...].

    Rides the SHARED conversation window: the compiler ships a tiny-int
    role code through the slim projection and lags it next to
    lag(ts)/lag(turn) — no second window, no extra shuffle.

    Partition-scoped batches apply the start-role rule only when the
    batch actually HOLDS the conversation's first turn (turn_idx == 0):
    a conversation continuing from the previous date partition starts
    mid-grammar, exactly the turn_contiguity start-at-0 situation, and
    its boundary transition (lag is NULL here) is owned by the rollup
    boundary audit.
    """
    roles: list[str] = spec.params["roles"]
    allowed = {(f, t) for f, t in
               (tuple(p) for p in spec.params["allowed"])}
    start_roles = set(spec.params.get("start_roles", roles))
    code = {r: i for i, r in enumerate(roles)}

    cur, prev = F.col(ROLE_CODE), F.col(LAG_ROLE)
    ok_pairs = None
    for f, t in sorted(allowed):
        c = (prev == code[f]) & (cur == code[t])
        ok_pairs = c if ok_pairs is None else (ok_pairs | c)
    bad_transition = prev.isNotNull() & ~F.coalesce(ok_pairs, F.lit(False))
    ok_start = None
    for r in sorted(start_roles):
        c = cur == code[r]
        ok_start = c if ok_start is None else (ok_start | c)
    bad_start = (F.col(RN) == 1) & ~F.coalesce(ok_start, F.lit(False))
    if partition_scoped:
        bad_start = bad_start & (F.col(suite.turn_col) == 0)
    pred = bad_transition | bad_start

    def _name(c):
        out = None
        for r, i in code.items():
            cond = c == i
            out = F.when(cond, F.lit(r)) if out is None else out.when(cond, F.lit(r))
        return out.otherwise(F.lit("<unknown>"))

    detail = F.when(
        bad_start,
        F.concat(F.lit("conversation starts with role "), _name(cur)),
    ).otherwise(
        F.concat(F.lit("role transition not allowed: "), _name(prev),
                 F.lit(" -> "), _name(cur)),
    )

    def verdict(n_viol: int, m) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, FAIL,
                       f"{n_viol} turns violate the role-transition grammar")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       "all conversations follow the role-transition grammar")
        return stamp(report, _MOD, "compile_role_transitions")

    return [RowCheck(spec.check_id, pred, detail, verdict, needs_window=True)]


def fd_val_name(check_id: str) -> str:
    """Slim-projection column carrying the declared dependent attribute
    through the window shuffle for one fd_constant check."""
    return f"_fdv_{check_id}"


def fd_lag_name(check_id: str) -> str:
    return f"_fdl_{check_id}"


def fd_change_pred(cur, prev, rn) -> F.Column:
    """The functional-dependency change-point predicate: row rn > 1 whose
    value differs (null-safely) from the previous row's. A key's stream
    has >1 distinct value iff some ADJACENT pair differs, so change
    points detect every FD violation using only the lag the shared
    window already pays for — no count_distinct per key, no second
    aggregate."""
    return (rn > 1) & ~cur.eqNullSafe(prev)


def compile_fd_constant(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """Functional dependency ``conv_id -> column``: the declared column
    must be CONSTANT within each conversation (the Deequ-style FD /
    denormalization-consistency check — a transcript's session metadata,
    model name or user id changing mid-conversation is an ingest bug,
    and it is invisible to every per-row domain check).

    Rides the SHARED conversation window: the compiler ships the column
    (cast to string) through the slim projection and lags it next to
    lag(ts)/lag(turn) — zero extra shuffles; cost is the declared
    column's width through the one existing exchange (FD columns are
    short metadata fields, not payload text). Violations are the change
    points (see :func:`fd_change_pred`), one row per adjacent flip, so
    the detail names both values.

    Partition-scoped batches under-count only flips that straddle a
    partition boundary (lag is NULL on the batch's first row) — same
    policy as ts_monotonic; the rollup boundary audit owns boundaries.

    params: column (required); severity: "FAIL" (default) or "WARNING".
    """
    column = spec.params["column"]
    severity = spec.params.get("severity", FAIL)
    cur = F.col(fd_val_name(spec.check_id))
    prev = F.col(fd_lag_name(spec.check_id))
    pred = fd_change_pred(cur, prev, F.col(RN))
    detail = F.concat(
        F.lit(f"value of '{column}' changed within conversation: "),
        F.coalesce(prev, F.lit("NULL")),
        F.lit(" -> "),
        F.coalesce(cur, F.lit("NULL")),
    )

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, severity,
                       f"{n_viol} within-conversation changes of "
                       f"'{column}' (conv_id -> {column} violated)")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       f"'{column}' constant within every conversation")
        return stamp(report, _MOD, "compile_fd_constant")

    return [RowCheck(spec.check_id, pred, detail, verdict,
                     needs_window=True, severity=severity)]


def cd_hash_name(check_id: str) -> str:
    """Slim-projection column carrying one consecutive_dup check's turn
    identity hash (8 bytes) through the window shuffle."""
    return f"_cdh_{check_id}"


def cd_lag_name(check_id: str) -> str:
    return f"_cdl_{check_id}"


def compile_consecutive_dup(spec: CheckSpec, suite: CheckSuite) -> list[RowCheck]:
    """Within-conversation immediate repetition: a turn whose identity
    columns (default role+text) are identical to the PREVIOUS turn's —
    the signature of a stuck agent loop (same assistant message emitted
    over and over) or a producer that replays its last event. Distinct
    from conv_duplicates (whole conversations duplicated across the
    corpus) and unique_key (key collisions): here the KEYS are fine and
    the PAYLOAD repeats turn-over-turn.

    Rides the SHARED conversation window: the compiler ships one
    xxhash64 of the identity columns (8 B, null-safe via a sentinel
    coalesce) through the slim projection and lags it next to
    lag(ts)/lag(turn) — zero extra shuffles. A hash collision flagging a
    false repeat has probability ~2^-64 per adjacent pair; exactness at
    that tolerance is the same trade every content-hash dedup path in
    this engine makes (functions/dedup.py).

    Partition-scoped batches miss only a repeat straddling the partition
    boundary (lag NULL on the batch's first row) — ts_monotonic policy;
    the rollup boundary audit owns boundaries.

    params: columns (default ['role', 'text']); severity ('FAIL'
    default, or 'WARNING').
    """
    columns = list(spec.params.get("columns", ["role", "text"]))
    severity = spec.params.get("severity", FAIL)
    cur = F.col(cd_hash_name(spec.check_id))
    prev = F.col(cd_lag_name(spec.check_id))
    # turn_idx must ADVANCE: an exact row duplicate (same turn_idx, e.g.
    # a re-appended row) is unique_key's finding — each planted
    # violation class trips exactly one check
    pred = (prev.isNotNull() & (cur == prev)
            & (F.col(suite.turn_col) != F.col(LAG_TURN)))
    detail = F.lit(
        f"turn repeats the previous turn ({', '.join(columns)} identical)")

    def verdict(n_viol: int, m: dict[str, Any]) -> ValidationReport:
        report = ValidationReport()
        if n_viol:
            report.add(spec.section, spec.requirement, severity,
                       f"{n_viol} turns repeat their previous turn "
                       f"verbatim ({', '.join(columns)})")
        else:
            report.add(spec.section, spec.requirement, PASS,
                       "no turn repeats its previous turn "
                       f"({', '.join(columns)})")
        return stamp(report, _MOD, "compile_consecutive_dup")

    return [RowCheck(spec.check_id, pred, detail, verdict,
                     needs_window=True, severity=severity)]


def compile_gap_bounds(spec: CheckSpec, suite: CheckSuite):
    """A quantile of the inter-turn gap (seconds between consecutive
    turns within a conversation) within [lo, hi]; WARNING band like
    ``quantile_bounds``. The latency twin of the text-length tail
    budget: agent loops that stall (p95 gap explodes) or replayed logs
    (p50 gap collapses to 0) move the gap tails long before any
    per-row check fires.

    params: q in (0, 1); lo/hi/warn_lo/warn_hi in SECONDS (all
    optional); accuracy (percentile_approx knob, default 10000).

    Scale: rides the SAME conv_id window enrichment every ordering
    check shares — ``needs=('dt',)`` makes the compiler emit the
    ``_dt`` lag-difference column it already knows how to build — and
    the quantile is a mergeable percentile_approx sketch riding the
    post-window Observation: zero extra shuffles, zero extra jobs.
    Reference analog: the timestep-regularity analysis
    (checks/coords/variable_timestep.py:12-57) which bounds the SAME
    consecutive-diff series, there as exact equality, here as a
    tail budget.
    """
    from ..suite import PostAggCheck

    q = float(spec.params["q"])
    if not 0.0 < q < 1.0:
        raise ValueError(f"{spec.check_id}: q must be in (0, 1), got {q}")
    accuracy = int(spec.params.get("accuracy", 10000))
    lo, hi = spec.params.get("lo"), spec.params.get("hi")
    warn_lo, warn_hi = spec.params.get("warn_lo"), spec.params.get("warn_hi")
    cid = spec.check_id
    # _dt is in microseconds (unix_micros lag difference)
    exprs = {f"{cid}__gq": F.percentile_approx(F.col("_dt"), q, accuracy)}

    def verdict(m: dict[str, Any], ctx) -> ValidationReport:
        report = ValidationReport()
        v = m.get(f"{cid}__gq")
        if v is None:
            report.add(spec.section, spec.requirement, WARNING,
                       "no consecutive-turn pairs — gap quantile undefined")
            return stamp(report, _MOD, "compile_gap_bounds")
        sec = float(v) / 1e6
        detail = f"inter-turn gap p{q * 100:g}={sec:.3f}s"
        if (lo is not None and sec < lo) or (hi is not None and sec > hi):
            report.add(spec.section, spec.requirement, FAIL,
                       f"{detail} outside [{lo}, {hi}]")
        elif (warn_lo is not None and sec < warn_lo) or \
                (warn_hi is not None and sec > warn_hi):
            report.add(spec.section, spec.requirement, WARNING,
                       f"{detail} outside advisory band "
                       f"[{warn_lo}, {warn_hi}]")
        else:
            report.add(spec.section, spec.requirement, PASS, detail)
        return stamp(report, _MOD, "compile_gap_bounds")

    return PostAggCheck(cid, exprs, verdict, needs=("dt",))
