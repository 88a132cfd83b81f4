"""Vector similarity corpus over the `embeddings` table (SURVEY.md §2.11).

Filled in by the vector-operators milestone.
"""

from __future__ import annotations
