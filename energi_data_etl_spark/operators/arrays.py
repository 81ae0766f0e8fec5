"""Array-expression helpers shared by the basket/co-occurrence queries.

One home for the i<j pair-expansion idiom so its safety invariant
travels with the expression instead of living in each caller's memory
(ADVICE r17 #4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["sorted_pair_structs"]


def sorted_pair_structs(arr: str | Column, a_name: str, b_name: str) -> Column:
    """All i<j ordered pairs of a SORTED array column, as an array of
    2-field structs ready for ``F.explode``.

    Embeds the size>=2 guard: on arrays of size < 2 the expression is
    NULL and ``explode`` generates no rows. Without the guard,
    ``F.sequence(0, size-2)`` on a singleton yields the DESCENDING
    ``[0, -1]`` and ``F.get`` returns nulls — spurious (null, null)
    pairs at any call site that forgets the ``size > 1`` filter.
    Callers may still filter ``size > 1`` earlier to prune rows before
    the explode; the guard makes that a performance choice, not a
    correctness obligation.
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(c) - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(c) - 1),
                lambda j: F.struct(F.get(c, i).alias(a_name), F.get(c, j).alias(b_name)),
            ),
        )
    )
    return F.when(F.size(c) > 1, pairs)
