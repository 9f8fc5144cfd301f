"""Training-data pipeline operations (dedup, similarity, text analysis,
multimodal plumbing) — first-class engine components beyond the reference's
own checks, built Spark-first: JVM Column expressions wherever possible,
Arrow-batched pandas UDFs only where expressions can't reach."""
