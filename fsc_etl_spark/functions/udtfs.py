"""Python user-defined table functions (Spark 4 UDTF API).

The engine's doctrine keeps hot paths in built-in expressions; the
UDTF surface exists for the genuinely row-expanding Python boundary
cases (custom parsers, generators) and is Arrow-batched
(``useArrow=True`` → ``ArrowEvalPythonUDTF`` in the plan — the same
sanctioned columnar boundary as mapInPandas, never row-at-a-time
pickling). Registered functions are usable from SQL as table sources
and LATERAL correlations.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, ngram: string", useArrow=True)
class NgramUDTF:
    """(text, n) -> one row per word n-gram with its position.

    Whitespace tokenization matching functions/text.tokens (split on
    runs of whitespace, empties dropped) so UDTF output lines up with
    the expression-based n-gram operators and their oracles.
    """

    def eval(self, text: str, n: int):  # noqa: D102 — contract above
        if text is None or n is None or n < 1:
            return
        toks = [t for t in text.split() if t]
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's UDTFs on a session (idempotent)."""
    spark.udtf.register("ngrams", NgramUDTF)
