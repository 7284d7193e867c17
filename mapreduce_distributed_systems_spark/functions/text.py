"""Text expression helpers shared by the MR-parity and text-analysis
operators.

Tokenization pins the reference's exact semantics: split on runs of
non-letters (`unicode.IsLetter`, mrapps/wc.go:24-27), case preserved,
empty tokens dropped. `\\p{L}` is the Unicode letter class in both
Java regex (Spark) and RE2 (DuckDB), so the oracle uses the same
pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# runs of non-letters; identical meaning in Java regex and RE2
WORD_SPLIT_RE = r"[^\p{L}]+"


def words(text: Column | str) -> Column:
    """Array of non-empty letter-run tokens, case preserved."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, WORD_SPLIT_RE), lambda w: w != F.lit(""))
