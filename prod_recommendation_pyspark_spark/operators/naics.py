"""Industry-code (NAICS-style) proximity as a native expression.

The reference's ``getHops`` (search_ranking_peers.py:262-274) walks two
6-character code strings in Python: identical codes → 1.0, an n-char
common prefix → ``1 - 2*(6-n)/10`` style decay, no match → 0.0, and a
-1.0 sentinel for malformed codes.  A ``when`` ladder over
``substring`` comparisons expresses the same decision tree JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CODE_LEN = 6


def naics_hops_score(left: Column, right: Column) -> Column:
    """D6 — prefix-match proximity for fixed-width hierarchy codes.

    Intended semantics adopted (search_ranking_peers.py:263-275): the
    reference's loop returns ``1 - (len(s1)-1)*2/10`` on the first
    mismatch — with 6-char codes that constant-folds to 0.0, collapsing
    the scale to {1, 0, -1} and making the loop pointless.  The loop
    structure plainly intends prefix-depth decay, so we implement:
    both codes must be 6 chars (else -1.0 sentinel); 6 matching chars →
    1.0; a p-char prefix match → 1 - 2*(6-p)/10 (p=5 → 0.8, p=4 → 0.6,
    p=3 → 0.4, p=2 → 0.2, p=1 → 0.0); no common prefix → 0.0.
    """
    malformed = (
        left.isNull()
        | right.isNull()
        | (F.length(left) != CODE_LEN)
        | (F.length(right) != CODE_LEN)
    )
    expr = F.when(malformed, F.lit(-1.0)).when(left == right, F.lit(1.0))
    for p in range(CODE_LEN - 1, 0, -1):
        expr = expr.when(
            F.substring(left, 1, p) == F.substring(right, 1, p),
            F.lit(max(1.0 - 2.0 * (CODE_LEN - p) / 10.0, 0.0)),
        )
    return expr.otherwise(F.lit(0.0))
