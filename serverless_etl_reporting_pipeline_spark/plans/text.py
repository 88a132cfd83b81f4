"""Text-analysis / dedup corpus over the `documents` table (SURVEY.md §2.11).

Filled in by the text-operators milestone.
"""

from __future__ import annotations
