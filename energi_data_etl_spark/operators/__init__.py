"""Operator library: the engine pieces that go beyond a single built-in
DataFrame call. Import the modules directly for the full surface:

    joins        as-of join (union+window rewrite)
    windows      (window specs live inline in queries — all built-in)
    dedup        exact / MinHash+LSH / SimHash / blocked Jaccard
    similarity   exact kNN, hyperplane ANN, broadcast matmul near-dup
    text         tokenization, language ID, quality, fingerprints
    multimodal   binary payload columns + Arrow-batched decode plumbing
    graph        connected components (dedup clustering)
    skew         salted two-stage aggregation
    arrays       sorted-set pair expansion (basket/co-occurrence)
"""

from .joins import asof_join  # noqa: F401
from .graph import connected_components  # noqa: F401
from .skew import salted_agg  # noqa: F401
