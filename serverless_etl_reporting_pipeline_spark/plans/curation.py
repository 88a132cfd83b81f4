"""Round-3 corpus-curation queries (c-group).

Large-scale training-data curation operators beyond the round-2 surface:
PII/URL scrubbing, Bloom-style decontamination, entropy-based quality,
domain-level corpus stats, weighted sampling, char-n-gram LM scoring.
Each query is oracle-checked against DuckDB on the same parquet inputs
(SURVEY.md §2.11 extension surface).
"""

from __future__ import annotations

__all__: list[str] = []
