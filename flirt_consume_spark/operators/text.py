"""Text-analysis operators for the training-data pipeline (L4 + extras).

All pure column expressions (split / higher-order array functions /
regexp) — JVM-side, codegen-friendly, no UDFs. Tokenization is
whitespace-regex based; a BPE-ish regex token count is provided for
token-budget estimation. Language-ID is an n-gram/stopword heuristic
(the honest version of what fastText-style models approximate) —
deterministic and therefore oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny high-frequency English function-word list (public knowledge).
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "with", "by", "is", "are", "was", "be", "at", "as", "it", "that",
)

# BPE-ish lexer: runs of letters, runs of digits, single punctuation.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


#: Unicode Zs (space-separator) codepoints — exactly the set DuckDB's
#: trim() strips (probed: 0x20, 0xA0, 0x1680, 0x2000–0x200A, 0x202F,
#: 0x205F, 0x3000; control whitespace \t\n\r\v\f is NOT trimmed by
#: DuckDB). Java's String.trim strips ASCII <= 0x20 instead — almost
#: the complementary convention — so tokens() uses btrim with this
#: set, making the Spark tokenization byte-equivalent to every
#: oracle's regexp_split_to_array(lower(trim(text)), '\\s+'): an
#: NBSP-padded or tab-prefixed document tokenizes identically on both
#: engines (unicode-mirror regression: NBSP-only text hashed
#: differently in llm_chunk).
_ZS_CHARS = "".join(
    chr(cp)
    for cp in (
        [0x20, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x202F, 0x205F, 0x3000]
    )
)


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.btrim(c, F.lit(_ZS_CHARS))), r"\s+")


def shingles(tok_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (the MinHash/Jaccard unit) over a BOUND
    token-array column. Callers must materialize the token array in a
    prior select and pass the column reference — passing a fresh
    split() expression here gets inlined into every element_at of the
    lambda and re-tokenizes the document per shingle per position
    (measured 25–40× slower at sf0.1). Requires size >= n."""
    tok = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, i + j) for j in range(n)]
        ),
    )


# All three ratios use try_divide: an EMPTY document has length 0
# (punct_ratio's denominator) and under ANSI a plain `/` kills the
# whole job on one empty string — a shape every real corpus contains.
# NULL-on-zero-denominator is also exactly DuckDB's `/` convention
# (0/0 → NULL), so the quality oracles match on empty text for free.


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    tok = tokens(text)
    hits = F.size(F.filter(tok, lambda w: w.isin(*stopwords)))
    return F.try_divide(hits, F.size(tok))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.try_divide(
        F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", "")), F.length(c)
    )


def type_token_ratio(text: Column | str) -> Column:
    tok = tokens(text)
    return F.try_divide(F.size(F.array_distinct(tok)), F.size(tok))


def bpe_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(TOKEN_REGEX)).cast("bigint")


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]: length band +
    stopword presence + low punctuation + lexical diversity — the
    standard cheap pre-filter before expensive pipeline stages."""
    c = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.length(c) / F.lit(400.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 4, F.lit(1.0))
    punct_score = 1 - F.least(punct_ratio(c) * 10, F.lit(1.0))
    diversity = type_token_ratio(c)
    return (len_score + sw_score + punct_score + diversity) / 4


def repetition_signal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition/boilerplate signal (Gopher-style
    quality filter): per doc, the fraction of token-2-gram occurrences
    that are repeats (1 - distinct/total) and the fraction taken by
    the single most frequent 2-gram.

    NARROW on the data path — no shuffle at cluster scale: every
    statistic is a higher-order array expression over the doc's own
    gram array. Per-doc cost is O(n log n): the gram array is sorted
    once and BOTH the distinct-gram count and the max multiplicity
    fall out of a single O(n) fold over the equal-adjacent runs.
    (The previous mode-scan — transform over the distinct array, each
    element filtering the full gram array — was O(n·distinct) per
    doc, quadratic for low-repetition text; the run fold computes the
    identical integer counts. r12, guide §1.2 per-task work.)
    ``fan_out`` floors the stage's parallelism when the input scan is
    an unsplittable file (guide §2.5); at real scale it is a no-op.
    Rational count-ratios are floored to 1e-6 units (exact
    cross-engine; round() would tie-break differently)."""
    from flirt_consume_spark.operators.scale import fan_out

    base = fan_out(docs.select(F.col(id_col), F.col(text_col)))
    step = base.select(
        F.col(id_col), tokens(text_col).alias("_tok")
    ).filter(F.size("_tok") >= 2)
    g = step.select(F.col(id_col), shingles("_tok", 2).alias("_g"))
    # One pass over the sorted grams: run = current equal-adjacent run
    # length, best = max run length (= max multiplicity), nd = number
    # of run starts (= distinct count). Grams are never NULL (split
    # output), so the <=> against the NULL-seeded prev is false only
    # on the first element, as intended.
    runs = F.expr(
        """aggregate(
             array_sort(_g),
             named_struct('prev', CAST(NULL AS STRING),
                          'run', 0L, 'best', 0L, 'nd', 0L),
             (acc, x) -> named_struct(
               'prev', x,
               'run',  IF(acc.prev <=> x, acc.run + 1L, 1L),
               'best', GREATEST(acc.best,
                                IF(acc.prev <=> x, acc.run + 1L, 1L)),
               'nd',   acc.nd + IF(acc.prev <=> x, 0L, 1L)),
             acc -> named_struct('best', acc.best, 'nd', acc.nd))"""
    )
    gd = g.select(F.col(id_col), "_g", runs.alias("_r"))
    total = F.size("_g").cast("double")
    return gd.select(
        F.col(id_col),
        F.size("_g").cast("bigint").alias("n_grams"),
        (
            F.floor((total - F.col("_r.nd").cast("double")) / total * 1e6)
            / F.lit(1e6)
        ).alias("dup_gram_frac"),
        (
            F.floor(F.col("_r.best").cast("double") / total * 1e6)
            / F.lit(1e6)
        ).alias("top_gram_frac"),
    )


def min_fingerprint(doc_shingles: Column) -> Column:
    """Winnowing-style document fingerprint: the minimum md5 over the
    shingle set (k=1 min-sketch). Two documents sharing it almost
    surely share their rarest shingle — a cheap first-pass cluster key."""
    return F.array_min(F.transform(doc_shingles, lambda s: F.md5(s)))
