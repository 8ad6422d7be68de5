"""Python UDTF surface (SURVEY §2 I: the reference has no user-extensible
functions; Spark 4's table functions are the §7 extension point for
one-row-to-many transforms that aren't a built-in generator).

UDTFs are constructed lazily (inside a function) because return-type DDL
parsing needs an active session. Register with
``spark.udtf.register("tokenize", tokenize_udtf())`` and use laterally:
``SELECT d.doc_id, t.* FROM documents d, LATERAL tokenize(d.text) t``.
"""

from __future__ import annotations


def tokenize_udtf():
    """(text) -> rows of (pos, token): whitespace tokenizer as a lateral
    table function. The built-in twin is posexplode(split(...)) — which is
    what the hot path should use; the UDTF exists for tokenizers with
    real logic (BPE merges, offsets, byte spans)."""
    from pyspark.sql.functions import udtf

    class Tokenize:
        def eval(self, text: str):
            # Explicit whitespace class shared with the SQL twins: Python's
            # ASCII \s = [ \t\n\r\f\v] but RE2/DuckDB \s excludes \x0b, and
            # plain str.split() adds Unicode whitespace (NBSP etc.) — either
            # would diverge from the oracle on corpora containing them.
            import re

            toks = [t for t in re.split(r"[ \t\n\r\f]+", text or "") if t]
            for i, tok in enumerate(toks):
                yield i, tok

    return udtf(Tokenize, returnType="pos int, token string")
