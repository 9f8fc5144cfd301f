"""Sampled validation: run a check suite on a deterministic
conversation-level hash sample and certify a bound on the true
violation rate.

The 100-TB motivation: a full-suite scan of a 10^12-turn table is the
right nightly job, but most operational questions ("did this morning's
ingest regress?") are answerable from a fraction of the data — IF the
sampled verdicts are stated honestly. Two properties make that possible:

1. **FAIL monotonicity.** The sample is a literal subset of the input
   (``functions/sampling.py hash_uniform``: row kept iff
   u(conv_id) < fraction), so every violating row the sampled run finds
   exists in the full table. A sampled FAIL is a true FAIL — no
   statistics needed.
2. **Quantified PASS.** A sampled PASS is evidence, not proof. With C
   sampled conversations and k of them violating, a one-sided
   (1 - delta) upper bound on the true violating-conversation share p:

   - k == 0: exact binomial tail (the generalized "rule of three"):
     (1-p)^C >= delta  =>  p <= -ln(delta)/C
   - k >  0: one-sided Hoeffding: p <= k/C + sqrt(ln(1/delta)/(2C))

   Both are distribution-free. The certified unit is the CONVERSATION —
   the unit the hash-sample includes i.i.d. (Bernoulli over conv_id).
   Turn-level rates within sampled conversations are reported
   descriptively but NOT certified: turns cluster inside conversations,
   so the i.i.d. assumption holds only at the conversation grain.

Why conversation-level sampling (not row-level): the suite's window /
partition-scoped checks (turn_contiguity, ts_monotonic,
role_transitions, max_conv_turns) quantify over whole conversations.
Row-level sampling would manufacture contiguity violations out of the
sampling itself; taking whole conversations keeps every check's
semantics exactly valid within the sample.

Scale shape: the sample predicate is a map-side filter on a
deterministic hash of conv_id — no shuffle, no RNG state, retry- and
partitioning-independent, and the SAME conversations are selected on
every executor count, so sampled runs are comparable across cluster
sizes and across reruns. The only cost beyond the (fraction-sized)
suite run is one column-pruned distinct-count of conv_id over the
sample, needed for C.

Reference analog: the reference validates a bounded sample slice when
the full artifact is too expensive to decode
(/root/reference/mlcast_dataset_validator/checks/tool_compatibility/
cartopy.py:24-43 via ``_prepare_sample_slice``); this module is the
table-scale version with the missing piece — an explicit statistical
statement of what the sampled PASS certifies.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Optional

from pyspark.sql import functions as F

from .compiler import SuiteRunResult, run_suite
from .functions.sampling import hash_uniform
from .report import PASS, WARNING, ValidationReport
from .suite import RunContext

_MOD = __name__


def rate_upper_bound(k: int, n: int, delta: float = 0.05) -> float:
    """One-sided (1 - delta) upper bound on a Bernoulli rate after
    observing ``k`` hits in ``n`` i.i.d. units.

    k == 0 uses the exact binomial tail (generalized rule of three);
    k > 0 uses one-sided Hoeffding. Returns 1.0 when n == 0 (no
    evidence bounds nothing).
    """
    if n <= 0:
        return 1.0
    if not (0.0 < delta < 1.0):
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    if k == 0:
        return min(1.0, -math.log(delta) / n)
    return min(1.0, k / n + math.sqrt(math.log(1.0 / delta) / (2.0 * n)))


def required_sample_units(certify_rate: float, delta: float = 0.05) -> int:
    """Minimum i.i.d. units (conversations) for a zero-violation sample
    to certify rate <= ``certify_rate`` at confidence 1 - delta."""
    if certify_rate <= 0:
        raise ValueError("certify_rate must be positive")
    return math.ceil(-math.log(delta) / certify_rate)


@dataclass
class Certification:
    """Per-row-check statistical statement from one sampled run."""

    check_id: str
    #: sampled conversations (the i.i.d. unit) and how many had >= 1 hit
    n_convs: int
    k_convs: int
    #: (1 - delta) upper bound on the violating-conversation share
    conv_rate_upper: float
    #: descriptive (NOT certified — clustered) turn-level numbers
    n_rows: int
    k_rows: int
    #: True/False vs certify_rate; None when no target was given
    certified: Optional[bool]


@dataclass
class SampledRunResult:
    """A SuiteRunResult plus the statistics that make it honest."""

    result: SuiteRunResult
    fraction: float
    seed: int
    delta: float
    certify_rate: Optional[float]
    n_convs_sampled: int
    certifications: list[Certification] = field(default_factory=list)
    #: unbiased scale-up estimates (hash-inclusion is Bernoulli(fraction)
    #: over conversations, so X_sample / fraction estimates X_total)
    est_total_convs: float = 0.0
    est_total_rows: float = 0.0

    @property
    def report(self) -> ValidationReport:
        """The sampled run's report plus one certificate row per
        row-check: PASS when the bound meets the target (or no target
        was set), WARNING when the sample is too small to decide.
        Base verdicts are NOT weakened — a sampled FAIL stays FAIL."""
        rep = ValidationReport()
        rep += self.result.report
        for c in self.certifications:
            if self.certify_rate is None:
                status, tail = PASS, ""
            elif c.conv_rate_upper <= self.certify_rate:
                status, tail = PASS, f"; target {self.certify_rate:g} met"
            else:
                status = WARNING
                need = required_sample_units(self.certify_rate, self.delta)
                tail = (f"; target {self.certify_rate:g} NOT certifiable at "
                        f"C={c.n_convs} (zero-violation sample needs "
                        f"C >= {need})")
            rep.add(
                "sampling",
                f"{c.check_id}: sampled certificate",
                status,
                (f"fraction={self.fraction:g} seed={self.seed}: "
                 f"{c.k_convs}/{c.n_convs} sampled conversations violate "
                 f"-> true share <= {c.conv_rate_upper:.3g} at confidence "
                 f"{1 - self.delta:g} (turn-level, descriptive: "
                 f"{c.k_rows}/{c.n_rows}){tail}"),
                _MOD,
                "run_suite_sampled",
            )
        return rep

    def has_fails(self) -> bool:
        return self.result.has_fails()


def run_suite_sampled(
    ctx: RunContext,
    fraction: float,
    seed: int = 0,
    delta: float = 0.05,
    certify_rate: Optional[float] = None,
    violations_path: Optional[str] = None,
) -> SampledRunResult:
    """Run ``ctx.suite`` on a deterministic conversation-level sample.

    The sample keeps a conversation iff
    ``hash_uniform(conv_id, seed) < fraction`` — every turn of a kept
    conversation is kept, so window/partition-scoped checks see whole
    units. All fused-plan machinery (single scan, Observation metrics,
    slim shuffle) applies unchanged to the sampled plan; the filter sits
    map-side under the scan, before any exchange.

    Requires ``ctx.violations_limit is None``: the per-conversation hit
    counts come from the violations table, and an example cap would
    silently undercount k_convs (the certificates would overstate
    confidence — fail loudly instead).
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if ctx.violations_limit is not None:
        raise ValueError(
            "run_suite_sampled needs the uncapped violations table to "
            "count violating conversations; pass violations_limit=None")
    conv = ctx.suite.conv_col
    sdf = ctx.df.where(hash_uniform(F.col(conv), seed) < F.lit(fraction))
    sctx = replace(ctx, df=sdf)
    res = run_suite(sctx, violations_path=violations_path)

    # C: sampled conversations — one column-pruned distinct-count job on
    # the (fraction-sized) sample. This is the denominator of every
    # certificate; approx would re-inject error into an exact statement.
    n_convs = sdf.select(conv).distinct().count()

    # k per check: distinct violating conversations, from the (uncapped)
    # violations table. Violations are the exception by construction, so
    # this collect is bounded.
    k_convs: dict[str, int] = {
        r["check_id"]: r["k"]
        for r in res.violations.groupBy("check_id")
        .agg(F.count_distinct("conv_id").alias("k"))
        .collect()
    }

    n_rows = res.n_input_rows
    certs: list[Certification] = []
    for mname, val in sorted(res.metrics.items()):
        if not mname.startswith("__viol_"):
            continue
        cid = mname[len("__viol_"):]
        kc = int(k_convs.get(cid, 0))
        upper = rate_upper_bound(kc, n_convs, delta)
        certs.append(
            Certification(
                check_id=cid,
                n_convs=n_convs,
                k_convs=kc,
                conv_rate_upper=upper,
                n_rows=int(n_rows),
                k_rows=int(val or 0),
                certified=(None if certify_rate is None
                           else upper <= certify_rate),
            )
        )

    return SampledRunResult(
        result=res,
        fraction=fraction,
        seed=seed,
        delta=delta,
        certify_rate=certify_rate,
        n_convs_sampled=n_convs,
        certifications=certs,
        est_total_convs=n_convs / fraction,
        est_total_rows=n_rows / fraction,
    )
