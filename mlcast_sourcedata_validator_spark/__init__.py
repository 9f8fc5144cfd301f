"""mlcast_sourcedata_validator_spark — a PySpark-native schema + constraint
validation engine for web-scale multi-turn transcript tables.

Built from scratch with the *check semantics and report model* of the
reference validator (mlcast-community/mlcast-sourcedata-validator, a
driver-local xarray/Zarr checker), re-expressed as declarative check suites
compiled to Spark SQL expressions and vectorized pandas/Arrow UDFs:

- ``report``    — Result / ValidationReport model (ref: specs/base.py)
- ``suite``     — declarative CheckSpec / CheckSuite + registry
                  (ref: specs/cli.py discovery + spec modules)
- ``compiler``  — CheckSuite -> fused single-scan Spark plan
- ``operators`` — the check implementations (stats, uniqueness, domains,
                  refint, ordering, drift, schema, storage, interop)
- ``functions`` — training-data pipeline ops (dedup, similarity, text,
                  multimodal)
- ``plans``     — concrete suites (transcripts_v1)
- ``sources``   — table readers + storage metadata inspection
- ``streaming`` — foreachBatch streaming validation wrapper
- ``synth``     — deterministic synthetic transcripts generator
- ``checkpoint``— per-partition lineage + resume
"""

__version__ = "0.1.0"
