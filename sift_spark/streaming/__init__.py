"""Incremental processing.

The reference has NO streaming surface (explicit roadmap TODO,
/root/reference/README.md:111; no watermarks/stateful ops anywhere), so
this engine is deliberately batch-first: incremental re-runs are the
checkpoint/lineage anti-join (plans/lineage.py), which at the 10^12-doc
tier is the right model (crawl snapshots arrive as table partitions, not
as a low-latency stream).

For deployments that do land pages continuously, `incremental.py` shows
the Structured Streaming wiring of the same extraction UDF -- the
operator is a stateless narrow map, so it is trivially streamable."""
