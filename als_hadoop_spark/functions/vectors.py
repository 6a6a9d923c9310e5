"""Vector math over ``array<float>`` embedding columns.

All pure built-in higher-order functions (``zip_with`` /
``aggregate``) — evaluated JVM-side (HOF lambdas are interpreted, not
codegen'd, but there is zero Python in the row path and no Arrow
transfer). For bulk pairwise scoring, precompute norms per side so the
per-pair cost is a single dot fold (see dedup.q_dedup_embed). This is the engine analog of the reference's
``Vector.dot`` prediction at ``ALS-Hadoop/ALS/ALS.java:461``
(``usersMatrix.get(userID).dot(itemsMatrix.get(itemID))``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ, accumulated in double."""
    prod = F.zip_with(_as_col(a), _as_col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in double."""
    return F.sqrt(
        F.aggregate(
            _as_col(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL-safe via NaN propagation."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
