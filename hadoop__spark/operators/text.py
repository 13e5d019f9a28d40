"""Text-analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All hot-path expressions are Spark built-ins (whole-stage codegen,
no Python in the loop).  Normalization is shared with the dedup
operators so shingle/token semantics line up across the pipeline.

Scale: every operator here is a narrow per-row projection — no
shuffle, fully pipelined with the parquet scan, safe at any data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hadoop__spark.operators.util import ensure_parallelism

#: Marker words for the n-gram/stopword language-ID heuristic.  Chosen
#: to be high-frequency function words that rarely collide across the
#: five fixture languages.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "los", "es", "de"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": [],  # handled by CJK codepoint detection below
}


def normalized(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, squeeze whitespace."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " "), r" +", " "
        )
    )


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (non-empty)."""
    return F.filter(F.split(normalized(col), " "), lambda x: x != F.lit(""))


def exact_key(col: Column) -> Column:
    """The exact-dedup grouping key: the normalized text, falling back
    to the RAW text when normalization yields the empty string.
    :func:`normalized` strips everything outside ``[a-z0-9 ]``, so two
    DISTINCT documents written entirely in characters it strips
    (pure-CJK text, pure punctuation) would otherwise both key as
    ``''`` — and exact/fingerprint dedup would silently delete one.
    ASCII-normalizable documents are unaffected (their key is nonempty
    or their raw text really is empty)."""
    return F.coalesce(F.nullif(normalized(col), F.lit("")), col)


def fingerprint_expr(col: Column) -> Column:
    """md5 digest of :func:`exact_key` — THE document fingerprint, one
    definition shared by every plane that computes it (batch dedup,
    the incremental fingerprints state, accounting sketches, the ts04
    probe), so the fallback rule above cannot drift between them."""
    return F.md5(exact_key(col))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate.

    The subword estimate counts alternating letter/digit runs — a cheap
    deterministic proxy for BPE token counts (~chars/4 for English).

    Two-step projection (tokens materialized, then stats from the
    array): referencing ``tokens(col)`` several times in one projection
    inlines normalize+split at every site, and compiling the inlined
    tree is the measured cold-pass cost (see ``dedup.shingle_frame``).
    """
    base = ensure_parallelism(df).select(
        "doc_id",
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        normalized(F.col(text_col)).alias("_norm"),
        tokens(F.col(text_col)).alias("_w"),
    )
    t = F.col("_w")
    return base.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        "n_chars",
        (F.length(F.col("_norm")) / 4.0).alias("subword_est"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_distinct_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + composite score.

    Features follow the usual web-corpus filters: length, punctuation
    density, stopword ratio, mean word length, type-token ratio.  All
    arithmetic is deterministic double math on integer counts, so the
    operator is oracle-checkable bit-for-bit.
    """
    # tokens materialized once, stats from the array — see token_stats
    base = ensure_parallelism(df).select(
        "doc_id",
        F.col(text_col).alias("_text"),
        tokens(F.col(text_col)).alias("_w"),
    )
    t = F.col("_w")
    n_tok = F.size(t).cast("double")
    n_chars = F.length(F.col("_text")).cast("double")
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(t), stop)).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col("_text"), r"[.!?,;:]", ""))
    )
    mean_word_len = F.when(n_tok > 0, (F.length(F.concat_ws("", t)) / n_tok)).otherwise(0.0)
    ttr = F.when(
        n_tok > 0, F.size(F.array_distinct(t)).cast("double") / n_tok
    ).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = n_stop / F.lit(5.0)
    score = (
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.4
        + ttr * 0.3
        + stop_ratio * 0.2
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.1
    )
    return base.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        ttr.alias("type_token_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID by marker-word frequency (n-gram heuristic).

    Counts word-boundary matches of per-language marker words with
    ``regexp_count`` (JVM regex, no UDF), plus CJK-codepoint counting
    for zh; argmax with a fixed language-order tiebreak.
    """
    df = ensure_parallelism(df)
    cols = [df[c] for c in df.columns]
    scores = []
    for lang, markers in LANG_MARKERS.items():
        if lang == "zh":
            score = F.length(
                F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")
            ).cast("bigint")
        else:
            score = sum(
                F.regexp_count(F.lower(F.col(text_col)), F.lit(rf"\b{m}\b"))
                for m in markers
            ).cast("bigint")
        scores.append(score.alias(f"score_{lang}"))
    scored = df.select(*cols, *scores)
    # argmax with deterministic tiebreak: language order as listed
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cand = F.col(f"score_{lang}")
        best = F.when(cand > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(cand > best_score, cand).otherwise(best_score)
    return scored.select(
        "doc_id",
        best.alias("pred_lang"),
        best_score.alias("marker_hits"),
    )


def top_vocabulary(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus top-k vocabulary: token → count → rank (ties broken by
    token).  Explode + count is map-side combined; only the per-token
    partials shuffle, and the final top-k is a single ordered limit.
    """
    from pyspark.sql import Window

    counted = (
        ensure_parallelism(df)
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject: each
    # partition keeps its own top-k and only those merge — ranking the
    # FULL vocabulary with an unpartitioned window would funnel every
    # distinct token through one task.  The window below only ever
    # sees the k surviving rows.
    topk = counted.orderBy(F.col("n").desc(), "token").limit(k)
    w = Window.orderBy(F.col("n").desc(), "token")
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints.

    * ``fp_md5`` — md5 of the normalized text (cross-engine stable,
      used by the dedup oracle).
    * ``fp_roll`` — polynomial rolling hash of the token stream
      (base-31 over token md5 prefixes, mod 2^61-1), computed with
      ``aggregate`` entirely JVM-side.
    """
    df = ensure_parallelism(df)
    t = tokens(F.col(text_col))
    # modulus small enough that acc*31 + 2^32 stays below 2^63 (ANSI
    # mode makes long overflow a hard error, not a wraparound)
    mod = F.lit(99999999999999997)
    roll = F.aggregate(
        t,
        F.lit(0).cast("bigint"),
        lambda acc, x: (
            acc * 31 + F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("bigint")
        ) % mod,
    )
    return df.select(
        "doc_id",
        fingerprint_expr(F.col(text_col)).alias("fp_md5"),
        roll.alias("fp_roll"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram log-probability (CCNet-style LM quality
    proxy): the corpus itself is the language model — P(t) = count(t) /
    total tokens — and each document scores the sum/mean of
    ``log P(t)`` over its token stream (with multiplicity).  Low mean
    log-prob = rare-token-heavy documents (gibberish, codes, boiler
    fragments); high = stopword-heavy fluff.  Used as a filter feature
    next to :func:`quality_score`.

    Determinism: floating-point addition is order-sensitive, so the
    per-document sum is folded over the tokens in DOCUMENT ORDER
    (posexplode → sort by position → sequential ``aggregate``), never
    via a float ``sum()`` whose shuffle order varies run to run.  The
    output is therefore bit-stable across partitioning and session
    configs (tested), at the price of a per-document ``collect_list``
    buffer — bounded by document length, never corpus size.

    Two passes by construction (frequency estimation, then scoring):
    at 100 TB materialize the frequency table once
    (``freq.write.parquet``) and reuse it — the vocabulary table is
    orders of magnitude smaller than the corpus and usually
    broadcast-joins back onto the token stream.
    """
    base = ensure_parallelism(df)
    toks = base.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t"),
    )
    freq = toks.groupBy("_t").agg(F.count("*").alias("_c"))
    total = freq.agg(F.sum("_c").alias("_total"))
    scored = (
        toks.join(freq, "_t")
        .crossJoin(F.broadcast(total))
        .select(
            "_id",
            "_pos",
            (
                F.log(F.col("_c").cast("double"))
                - F.log(F.col("_total").cast("double"))
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("_pos", "_lp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_lp"],
        ).alias("sum_logprob"),
    )
    # Left-join back to the full id set (same pattern as
    # line_dedup's totals join): zero-token documents produce no
    # posexplode rows, and silently omitting them would make every
    # downstream per-document join drop those docs instead of scoring
    # them — they get n_tokens=0, sum 0.0, and a null average (there
    # is no mean of an empty stream).
    ids = base.select(F.col(id_col).alias("_id")).distinct()
    return ids.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("sum_logprob", F.lit(0.0)).alias("sum_logprob"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("sum_logprob") / F.col("n_tokens"),
        ).alias("avg_logprob"),
    )
