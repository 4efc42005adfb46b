"""Test helper: import the REFERENCE implementation (read-only, at
/root/reference/src) to generate expected values for parity tests.

The engine itself never imports this; it exists so tests can assert
bit-level agreement with the reference on its own corpus instead of
hand-maintained golden files.
"""

from __future__ import annotations

import sys

REF_SRC = "/root/reference/src"

if REF_SRC not in sys.path:
    sys.path.insert(0, REF_SRC)

import beyond_vector_search.answer as ref_answer  # noqa: E402
import beyond_vector_search.data as ref_data  # noqa: E402
import beyond_vector_search.evaluator as ref_evaluator  # noqa: E402
import beyond_vector_search.index as ref_index  # noqa: E402
import beyond_vector_search.retrievers as ref_retrievers  # noqa: E402
import beyond_vector_search.router as ref_router  # noqa: E402
import beyond_vector_search.text as ref_text  # noqa: E402

__all__ = [
    "ref_answer",
    "ref_data",
    "ref_evaluator",
    "ref_index",
    "ref_retrievers",
    "ref_router",
    "ref_text",
]
