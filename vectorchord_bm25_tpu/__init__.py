"""tpu-bm25: TPU-native BM25 index and Block-Max query engine.

A standalone JAX/XLA/Pallas full-text ranking stack with the capabilities
of VectorChord-BM25 (see README.md and PARITY.md).  Public API:

    from vectorchord_bm25_tpu import Bm25Index, Query, Document
    from vectorchord_bm25_tpu import documents_from_texts, tsvector
"""

__version__ = "0.1.0"

from .index.bm25index import Bm25Index, BoundQuery, SearchHit  # noqa: F401
from .text.intern import Document, Query, random_seed  # noqa: F401
from .utils.options import (  # noqa: F401
    IndexOptions,
    SearchOptions,
    SessionConfig,
)

__all__ = [
    "Bm25Index",
    "BoundQuery",
    "SearchHit",
    "Document",
    "Query",
    "random_seed",
    "IndexOptions",
    "SearchOptions",
    "SessionConfig",
    "documents_from_texts",
    "tsvector",
]


def __getattr__(name):
    # Lazy imports for the pieces that pull in heavier dependencies.
    if name == "documents_from_texts":
        from .text.corpus import documents_from_texts

        return documents_from_texts
    if name == "tsvector":
        from .text.tokenizer import tsvector

        return tsvector
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
