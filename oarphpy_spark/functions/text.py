"""Text primitives shared by the dedup / text-analysis operators.

All JVM-side column expressions; any hash used for bucketing or
fingerprinting is md5-hex (string-comparable and reproducible in every
engine — the oracle can restate it). For throughput-critical paths
``F.xxhash64`` variants exist alongside (not oracle-expressible, same
semantics)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_tokens(text) -> Column:
    """Lowercased whitespace tokens of a text column."""
    return F.split(F.lower(text), " ", -1)


def shingles(tokens, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined). Documents with fewer than
    ``n`` tokens yield a single shingle of the whole token list."""
    count = F.size(tokens) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tokens)))


def md5_str(col) -> Column:
    """Lowercase md5 hex of a string column (engine-portable hash)."""
    return F.md5(col.cast("binary"))


def token_md5s(tokens) -> Column:
    """md5 hex per token (hash once, reuse across bit positions)."""
    return F.transform(tokens, lambda t: md5_str(t))
