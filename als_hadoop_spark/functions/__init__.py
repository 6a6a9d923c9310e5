"""Engine function library — reusable column expressions & operators.

- ``ids``     : scale-safe dense-id assignment (reference A7,
                ``ALS-Hadoop/mapid.py:28-38``).
- ``joins``   : bucketized range/as-of join (reference Part-B gap).
- ``vectors`` : embedding math on ``array<float>`` columns — dot,
                cosine, L2 — as pure built-in higher-order functions.

(Text-analysis expressions — tokens, shingles, quality — live with
their operators in ``operators/text.py`` and ``operators/dedup.py``.)
"""

from .ids import dense_ids
from .joins import range_join_buckets
from .scale import bucketed_join, salted_join, write_bucketed
from .vectors import cosine_sim, dot, l2_norm

__all__ = [
    "dense_ids",
    "range_join_buckets",
    "cosine_sim",
    "dot",
    "l2_norm",
    "write_bucketed",
    "bucketed_join",
    "salted_join",
]
