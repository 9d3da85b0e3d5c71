"""LLM-training-data pipeline operators (north star, BASELINE.json).

Dedup / similarity / text-analysis queries over the ``documents`` and
``embeddings`` tables. Filled in incrementally — see operators.dedup,
operators.similarity, functions.text.
"""

from __future__ import annotations
