"""transcripts_v1 — the flagship CheckSuite for multi-turn transcript tables.

Declarative analog of the reference's spec module
(/root/reference/mlcast_dataset_validator/specs/source_data/
radar_precipitation.py:38-270): an ordered list of checks with literal
parameters and RFC-2119-style requirement text. Sections mirror the
reference's numbering style (3.x coordinates -> keys/ordering, 4.x data
variables -> payload columns, 5.x global attributes -> table-level).

Every check here compiles into the single fused scan (see compiler.py).
"""

from __future__ import annotations

from ..suite import CheckSpec, CheckSuite, register_suite

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "sql"]


@register_suite("transcripts_v1")
def suite() -> CheckSuite:
    checks = [
        # --- section 3: keys & ordering (ref: coords checks) -------------
        CheckSpec(
            "schema_columns", "required_columns", "3.1 schema",
            "The table MUST have columns (conv_id:string, turn_idx:int, "
            "role:string, text:string, tool:string, ts:timestamp).",
            {
                "required": {
                    "conv_id": "string", "turn_idx": "int", "role": "string",
                    "text": "string", "tool": "string", "ts": "timestamp",
                },
                "expected_order": ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            },
        ),
        CheckSpec(
            "schema_drift", "schema_drift", "3.1 schema",
            "The live schema SHOULD match the signature recorded at table "
            "creation (schema-evolution drift: added/removed/retyped "
            "columns FAIL; no recorded baseline is a WARNING).",
            {"property_key": "schema_signature"},
        ),
        CheckSpec(
            "column_roles", "column_rules", "3.1 schema",
            "The table MUST expose key, ordering and time column roles "
            "(rule-matched by name/type/metadata).",
            {"categories": {
                "key": {"rules": [{"name": "conv_id", "type": "string"},
                                  {"metadata": {"role": "key"}}]},
                "ordering": {"rules": [{"name": "turn_idx", "type": "int"},
                                       {"metadata": {"role": "ordering"}}]},
                "time": {"rules": [{"name": "ts", "type": "timestamp"},
                                   {"metadata": {"standard_name": "time"}}]},
            }},
        ),
        CheckSpec(
            "unique_key", "unique_key", "3.2 keys",
            "(conv_id, turn_idx) MUST be unique.",
        ),
        CheckSpec(
            "turn_contiguity", "turn_contiguity", "3.3 ordering",
            "turn_idx MUST start at 0 and increase without gaps within a "
            "conversation.",
            # no explicit require_zero_start: whole-table runs enforce the
            # start-at-0 half; partition-scoped runs check internal gaps
            # only (a conversation continues across date partitions) and
            # delegate start-at-0 + boundary continuity to the rollup
            # contiguity audit
        ),
        CheckSpec(
            "ts_monotonic", "ts_monotonic", "3.3 ordering",
            "ts MUST be non-decreasing within a conversation.",
            {"strict": False},
        ),
        CheckSpec(
            "role_grammar", "role_transitions", "3.4 grammar",
            "Conversations MUST follow the role grammar: start with "
            "system|user; user speaks to the assistant; tool turns only "
            "follow an assistant turn and return to the assistant.",
            # alphabet + allowed transitions of the well-formed transcript
            # shape (matches the synthetic generator's clean output); a
            # role outside the alphabet violates every transition
            {"column": "role", "roles": ROLES,
             "allowed": [["system", "user"], ["system", "assistant"],
                         ["user", "assistant"], ["assistant", "user"],
                         ["assistant", "tool"], ["tool", "assistant"]],
             "start_roles": ["system", "user"]},
        ),
        CheckSpec(
            "variable_timestep", "variable_timestep", "3.4 timesteps",
            "Conversations MAY have variable time between turns.",
            {"allow_variable_timestep": True},
        ),
        CheckSpec(
            "loop_detection", "consecutive_dup", "3.4 grammar",
            "A turn MUST NOT repeat the previous turn verbatim (same "
            "role and text) — consecutive duplicates are the signature "
            "of a stuck agent loop or a replaying producer.",
            {"columns": ["role", "text"]},
        ),
        CheckSpec(
            "max_conv_turns", "max_conv_turns", "3.4 grammar",
            "A conversation MUST NOT exceed 10000 turns (also the bound "
            "the engine's per-conversation window shuffle relies on for "
            "skew-free execution).",
            {"max_turns": 10000},
        ),
        CheckSpec(
            "temporal_coverage", "temporal_coverage", "3.5 temporal",
            "The table SHOULD span a non-trivial time range.",
            {"min_years": 0.0},
        ),
        # --- section 4: payload columns (ref: data_vars checks) ----------
        CheckSpec(
            "role_domain", "domain", "4.1 domains",
            "role MUST be one of system|user|assistant|tool "
            "(compared lower/trimmed; non-canonical spelling is a WARNING).",
            {"column": "role", "allowed": ROLES, "nullable": False},
        ),
        CheckSpec(
            "tool_domain", "conditional_column", "4.2 domains",
            "tool MUST be set (and one of search|python|browser|sql) iff "
            "role = 'tool'; otherwise NULL.",
            {"column": "tool", "when": "role = 'tool'", "allowed": TOOLS},
        ),
        CheckSpec(
            "text_null_rate", "null_rate", "4.3 nulls",
            "text MUST be non-null in at least 99.9% of turns; key and ts "
            "columns MUST never be null.",
            {"columns": {"text": 0.001, "conv_id": 0.0, "turn_idx": 0.0, "ts": 0.0}},
        ),
        CheckSpec(
            "text_length", "numeric_bounds", "4.4 payload stats",
            "text length SHOULD lie within sane bounds.",
            {"expr": "length(text)", "lo": 0, "hi": 10_000_000,
             "warn_hi": 1_000_000},
        ),
        CheckSpec(
            "text_length_tail", "quantile_bounds", "4.4 payload stats",
            "The p95 of text length SHOULD stay within the tail budget "
            "(tails drift before min/max or mean move).",
            {"expr": "length(text)", "q": 0.95, "warn_hi": 100_000},
        ),
        CheckSpec(
            "gap_tail", "gap_bounds", "4.4 payload stats",
            "The p95 inter-turn gap SHOULD stay within the latency "
            "budget (stalled agent loops blow the gap tail; replayed "
            "logs collapse it) — advisory band, in seconds.",
            {"q": 0.95, "warn_hi": 86_400.0},
        ),
        CheckSpec(
            "conv_cardinality", "cardinality", "4.5 cardinality",
            "The table MUST contain at least 2 distinct conversations "
            "(HyperLogLog estimate).",
            {"column": "conv_id", "min_distinct": 2},
        ),
        CheckSpec(
            "min_rows", "min_rows", "4.6 size",
            "The batch MUST contain at least 1 row.",
            {"min_rows": 1},
        ),
        # --- section 5: cross-table & table-level -------------------------
        CheckSpec(
            "conv_refint", "refint", "5.1 referential integrity",
            "Every conv_id MUST exist in the conversations registry.",
        ),
        CheckSpec(
            "drift_turn_len", "drift", "5.2 drift",
            "The turn-length distribution SHOULD NOT drift from the "
            "baseline snapshot (KS<=0.15 WARN, <=0.30 FAIL; PSI<=0.2 WARN, "
            "<=0.5 FAIL).",
            {"metric": "turn_len_chars", "expr": "length(text)",
             "scale": "log", "lo": 1.0, "hi": 10000.0, "n_bins": 32,
             "warn_ks": 0.15, "max_ks": 0.30, "warn_psi": 0.2, "max_psi": 0.5},
        ),
        CheckSpec(
            "drift_ts_hour", "drift", "5.2 drift",
            "The hour-of-day distribution SHOULD NOT drift from the "
            "baseline snapshot.",
            {"metric": "ts_hour", "expr": "hour(ts) + 1", "scale": "linear",
             "lo": 1.0, "hi": 25.0, "n_bins": 24,
             "warn_ks": 0.15, "max_ks": 0.30, "warn_psi": 0.2, "max_psi": 0.5},
        ),
        CheckSpec(
            "drift_role_dist", "categorical_drift", "5.2 drift",
            "The role mix SHOULD NOT drift from the baseline snapshot "
            "(TVD<=0.10 WARN, <=0.25 FAIL; PSI<=0.2 WARN, <=0.5 FAIL) — "
            "a new agent framework shifts this long before numeric stats.",
            {"metric": "role_dist", "expr": "role", "categories": ROLES,
             "warn_tvd": 0.10, "max_tvd": 0.25,
             "warn_psi": 0.2, "max_psi": 0.5},
        ),
        CheckSpec(
            "drift_tool_dist", "categorical_drift", "5.2 drift",
            "The tool-usage mix (NULL = no tool call) SHOULD NOT drift "
            "from the baseline snapshot.",
            {"metric": "tool_dist", "expr": "coalesce(tool, '<none>')",
             "categories": ["<none>"] + TOOLS,
             "warn_tvd": 0.10, "max_tvd": 0.25,
             "warn_psi": 0.2, "max_psi": 0.5},
        ),
        CheckSpec(
            "drift_role_tool_joint", "categorical_drift", "5.2 drift",
            "The JOINT (role, tool) distribution SHOULD NOT drift from "
            "the baseline — correlation shifts (a framework that starts "
            "routing tool calls differently, tool values leaking onto "
            "non-tool roles) are invisible to the two marginal mixes.",
            {"metric": "role_tool_joint",
             "expr": "concat(role, ':', coalesce(tool, '<none>'))",
             # the well-formed joint cells; any other combination
             # (e.g. a tool value on an assistant row) pools into
             # <other> and shows up as joint mass the marginals miss
             "categories": ["system:<none>", "user:<none>",
                            "assistant:<none>"]
                           + [f"tool:{t}" for t in TOOLS],
             "warn_tvd": 0.10, "max_tvd": 0.25,
             "warn_psi": 0.2, "max_psi": 0.5},
        ),
        CheckSpec(
            "license", "license", "5.3 licensing",
            "The table MUST declare a 'license' property; it SHOULD be a "
            "valid SPDX identifier from the recommended list; NC/ND "
            "licenses trigger a WARNING.",
            {"require_spdx": True, "warn_on_restricted": True,
             "recommended": ["CC0-1.0", "CC-BY-4.0", "CC-BY-SA-4.0",
                             "ODbL-1.0", "ODC-By-1.0", "PDDL-1.0",
                             "MIT", "Apache-2.0"]},
        ),
        CheckSpec(
            "timestep_start_property", "conditional_property", "5.4 conditional",
            "If conversations have variable timesteps, the table MUST "
            "declare a 'consistent_timestep_start' property.",
            {"property": "consistent_timestep_start",
             "condition": "variable_timestep"},
        ),
        CheckSpec(
            "roundtrip", "roundtrip", "5.5 interop",
            "A sample of the batch MUST survive a parquet write/read "
            "roundtrip exactly.",
            {"sample_rows": 100},
        ),
        CheckSpec(
            "text_decode", "sampled_decode", "5.6 interop",
            "Text values MUST survive a utf-8 encode/decode roundtrip.",
            # full mode: rides the fused Observation (total coverage,
            # zero extra jobs) — the sampled probe exists for columns
            # too expensive to double-scan, which text is not
            {"column": "text", "mode": "full"},
        ),
        # --- section 6: storage layout (ref: chunking/compression/format) -
        CheckSpec(
            "storage_partitioning", "storage_partitioning", "6.1 layout",
            "The table SHOULD be hive-partitioned by date "
            "(analog of one-chunk-per-timestep).",
            {"partition_key": "date"},
        ),
        CheckSpec(
            "storage_codec", "storage_codec", "6.2 compression",
            "Files MUST be compressed; zstd is RECOMMENDED.",
            {"require_compression": True, "recommended": "zstd"},
        ),
        CheckSpec(
            "storage_format", "storage_format", "6.3 format",
            "Parquet format version MUST be a known version.",
            {"allowed_versions": ["1.0", "2.4", "2.6"]},
        ),
    ]
    return CheckSuite(suite_id="transcripts_v1", checks=checks)


@register_suite("transcripts_v1_partitioned")
def suite_partitioned() -> CheckSuite:
    """transcripts_v1 + the misrouted-ingest row check — the default for
    date-partitioned tables (``run_partitioned`` / CLI ``--partitioned``
    runs, where every consumer trusts partition == event-day).

    Kept out of the base suite so unpartitioned / in-memory inputs don't
    pay a per-row regexp for a check that can only WARN there.
    """
    base = suite()
    return CheckSuite(
        suite_id="transcripts_v1_partitioned",
        checks=base.checks + [
            CheckSpec(
                "partition_alignment", "partition_alignment", "6.1 layout",
                "Rows MUST be stored in the date partition derived from "
                "their ts (misrouted ingest corrupts every "
                "partition-pruned consumer).",
                {"partition_key": "date", "fmt": "yyyy-MM-dd"},
            ),
        ],
        conv_col=base.conv_col, turn_col=base.turn_col, ts_col=base.ts_col,
    )
