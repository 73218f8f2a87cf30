"""The engine-portable derandomization hash, in one place.

``md5_prefix_hash(*cols)`` builds the column expression
``conv(substring(md5(concat_ws(':', cols...)), 1, 8), 16, 10)`` —
a uniform integer on [0, 2^32) computable identically in DuckDB
(``('0x' || substr(md5(a || ':' || b ...), 1, 8))::BIGINT``) and in
Python (``int(hashlib.md5(f"{a}:{b}...".encode()).hexdigest()[:8],
16)``), which is what makes every sampled/derandomized operator
(walks, negative sampling, stratified sampling, stream order, ...)
value-checkable cross-engine. Older modules carry local copies of the
same idiom that predate this helper and are pinned by green driver
gates (pipeline/dedup.py, pipeline/sampling.py, partition/hdrf.py,
algos/linkpred.py); new code should use this helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_hash(*cols) -> Column:
    """int(md5(':'.join(cols))[:8], 16) as a long Column. Arguments
    may be Columns, column names, or literals (ints/strings are
    wrapped with F.lit)."""
    parts = [
        c if isinstance(c, Column) else (F.col(c) if isinstance(c, str) else F.lit(c))
        for c in cols
    ]
    # string literals that name no column are the caller's problem —
    # pass F.lit explicitly for literal strings
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8), 16, 10
    ).cast("long")
