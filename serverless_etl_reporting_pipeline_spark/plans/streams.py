"""Event-stream corpus: windowed aggregations in batch form (SURVEY.md §2.9).

Filled in by the streaming milestone.
"""

from __future__ import annotations
