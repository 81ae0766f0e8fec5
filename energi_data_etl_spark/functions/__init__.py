"""Public expression-function surface of the engine — re-exported from
the operator modules so users can ``from energi_data_etl_spark import
functions as EF`` and compose them like `pyspark.sql.functions`.

All of these return `pyspark.sql.Column` expressions (JVM-side,
codegen-friendly); none are Python UDFs.
"""

from ..operators.dedup import hamming64, minhash_signature, shingles  # noqa: F401
from ..operators.similarity import cosine, dot, l2_norm, unit_vector  # noqa: F401
from ..operators.text import (  # noqa: F401
    bag_fingerprint,
    fingerprint,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
