"""Scale plans: partitioning policy, skew salting, lineage/checkpoint."""
