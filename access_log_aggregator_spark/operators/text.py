"""Text-analysis operators: tokens, quality, language ID, fingerprints.

DataFrame-API surface over the canonical cross-engine formulas
(functions/xsql.py). Everything is built-in Catalyst expressions — no
Python on any path — so these run inside whole-stage codegen and scale as
pure map work (zero shuffles until an aggregation is asked for).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import xsql as x
from .materialize import Materializer, pin

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "et", "des", "un"],
}


def _e(sql: str) -> Column:
    return F.expr(sql)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    toks = x.tokens(text_col, x.SPARK)
    return df.withColumn("n_tokens", _e(x.arr_size(toks, x.SPARK)))


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """GPT-2-style pre-tokenizer count (xsql.BPE_PATTERN) — the token-budget
    estimator a training pipeline runs before real BPE; pure Catalyst
    regexp_extract_all, no Python."""
    return df.withColumn("n_bpe_tokens", _e(x.bpe_token_count(text_col, x.SPARK)))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling-hash document fingerprint (exact both engines)."""
    return df.withColumn("fingerprint", _e(x.polyhash(text_col, x.SPARK)))


def exploded_tokens(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    materializer: Materializer | None = None) -> DataFrame:
    """The pinned (id, token) frame — ONE tokenize pass of the corpus,
    shareable by every token-level aggregate (tf-idf's three aggregates,
    corpus top-tokens, vocabulary stats). Exposed so composite queries
    don't re-tokenize per consumer (review: the merged registry query's
    top_token arm ran its own full tokenize beside the tf-idf arm's)."""
    toks = _e(x.tokens(text_col, x.SPARK))
    return pin(df.select(id_col, F.explode(toks).alias("token")),
               "tfidf_tokens", materializer)


def top_tokens(tok: DataFrame, k: int = 10) -> DataFrame:
    """Corpus top-k tokens by count over an :func:`exploded_tokens`
    frame (total tiebreak order, same semantics as the SQL registry
    formulation)."""
    return (tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("token").asc())
            .limit(k))


def tfidf_top_terms(df: DataFrame, k: int = 20, text_col: str = "text",
                    id_col: str = "doc_id",
                    materializer: Materializer | None = None,
                    tokens: DataFrame | None = None) -> DataFrame:
    """Global top-k (doc, token) pairs by a deterministic tf-idf variant.

    score = tf * N / df — the idf uses the raw N/df ratio rather than a
    logarithm because log() is not guaranteed bit-identical across engines,
    while int-product-then-one-division is a single correctly-rounded double
    op (exact cross-engine match with the DuckDB oracle). The shape is the
    real thing: explode -> two hash aggregates (tf per (doc, token), df per
    token) -> broadcastable df join -> global top-k. At corpus scale the df
    table is the small side (vocabulary-sized): broadcast join, no shuffle
    of the tf table beyond its own aggregation.

    N is count(distinct id) over the SAME checkpointed token frame (docs
    with >= 1 token — identical in the DuckDB oracle), broadcast as a 1-row
    frame: the corpus is scanned exactly once, at tokenization.
    """
    # pin the exploded token frame: all three aggregates (tf, df, n_docs)
    # read it, and Catalyst would otherwise inline + re-tokenize the corpus
    # once per consumer (the dedup modules' shared-subtree lesson); the
    # materializer seam picks localCheckpoint vs durable table. ``tokens``
    # lets a caller pass an already-pinned exploded_tokens frame shared
    # with other aggregates.
    tok = tokens if tokens is not None else \
        exploded_tokens(df, text_col, id_col, materializer)
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    nd = tok.agg(F.countDistinct(id_col).alias("n_docs"))
    score = F.col("tf").cast("double") * F.col("n_docs") / F.col("df")
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(nd))
        .select(id_col, "token", "tf", "df", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc(), F.col("token").asc())
        .limit(k)
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic: token density, damped outside a
    sane token-count band (same formula as the oracle SQL)."""
    toks = x.tokens(text_col, x.SPARK)
    n = x.arr_size(toks, x.SPARK)
    expr = (
        f"(cast({n} as double) / (length({text_col}) + 1)) * "
        f"(case when {n} >= 10 and {n} <= 1000 then cast(1.0 as double) "
        f"else cast(0.5 as double) end)"
    )
    return with_token_count(df, text_col).withColumn("quality_score", _e(expr))


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID; ties break by the fixed language order."""
    toks = x.tokens(text_col, x.SPARK)
    out = df.withColumn("_toks", _e(toks))
    hits = {}
    for lang, words in STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        hits[lang] = f"size(filter(_toks, t -> t in ({inlist})))"
        out = out.withColumn(f"hits_{lang}", _e(hits[lang]))
    order = list(STOPWORDS)
    guess = "case "
    for lang in order:
        cond = " and ".join(
            f"hits_{lang} >= hits_{o}" for o in order if o != lang
        )
        guess += f"when {cond} then '{lang}' "
    guess += "else 'und' end"
    return out.withColumn("guessed_lang", _e(guess)).drop("_toks")
