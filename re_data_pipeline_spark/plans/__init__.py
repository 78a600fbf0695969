"""Named query plans: the operator-inventory conformance suite (SURVEY §2/§5)
and end-to-end pipelines mirroring the reference DAGs (SURVEY §3)."""
