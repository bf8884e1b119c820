"""Text-analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting. All Catalyst expressions (JVM-side)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import reserve_temp_cols

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "los", "las", "es", "una", "de"],
}


def _ratio(words: Column, vocab: list[str]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*vocab))) / \
        F.greatest(F.size(words), F.lit(1))


def language_id(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    """N-gram/stopword-family language ID: argmax of per-language stopword
    hit ratios, deterministic tie-break by language code."""
    words = F.split(F.col(text_col), r"\s+")
    scored = F.array(*[
        F.struct(_ratio(words, vocab).alias("score"),
                 F.lit(lang).alias("lang"))
        for lang, vocab in STOPWORDS.items()
    ])
    best = F.array_max(scored)
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def quality_score(df: DataFrame, text_col: str = "text",
                  out_col: str = "quality") -> DataFrame:
    """Composite quality features + [0,1] score: length band, mean word
    length band, punctuation ratio, stopword ratio, repetition ratio."""
    words = F.split(F.col(text_col), r"\s+")
    n_chars = F.length(text_col)
    n_words = F.greatest(F.size(words), F.lit(1))
    mean_wl = n_chars / n_words
    punct = (n_chars - F.length(F.regexp_replace(
        F.col(text_col), r"[\.,;:!\?'\"]", ""))) / F.greatest(n_chars, F.lit(1))
    stop = _ratio(words, STOPWORDS["en"])
    distinct_ratio = F.size(F.array_distinct(words)) / n_words
    score = (
        F.when((n_chars >= 64) & (n_chars <= 100_000), 0.25).otherwise(0.0)
        + F.when((mean_wl >= 2.5) & (mean_wl <= 12.0), 0.25).otherwise(0.0)
        + F.when(punct <= 0.1, 0.2).otherwise(0.0)
        + F.least(stop * 2.5, F.lit(0.15))
        + F.least(distinct_ratio, F.lit(0.6)) * 0.25
    )
    return (df
            .withColumn("n_chars_q", n_chars)
            .withColumn("n_words_q", F.size(words))
            .withColumn("mean_word_len", F.round(mean_wl, 4))
            .withColumn("punct_ratio", F.round(punct, 4))
            .withColumn("stopword_ratio", F.round(stop, 4))
            .withColumn("distinct_word_ratio", F.round(distinct_ratio, 4))
            .withColumn(out_col, F.round(score, 4)))


#: BPE-ish pre-tokenizer regex: word pieces, numbers, punctuation runs —
#: the whitespace-plus-subword shape GPT-style tokenizers use upstream.
BPE_ISH = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex piece count per row."""
    return (df
            .withColumn("n_ws_tokens", F.size(F.split(F.col(text_col), r"\s+")))
            .withColumn("n_bpe_ish_tokens",
                        F.size(F.expr(
                            f"regexp_extract_all({text_col}, "
                            f"'{BPE_ISH}', 0)"))))


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/shape quality rules (Rae et al. 2021, table
    A1 — the standard web-corpus filter battery), all Catalyst expressions:

    - ``dup_2gram_frac`` / ``dup_3gram_frac``: fraction of n-gram
      occurrences that are repeats (1 - distinct/total) — boilerplate and
      looping text score high;
    - ``symbol_word_ratio``: '#'/'…'-style symbols per word;
    - ``bullet_line_frac`` / ``ellipsis_line_frac``: fraction of lines that
      are bullets / end in ellipsis;
    - ``alpha_word_frac``: fraction of words containing a letter;
    - ``gopher_pass``: the conjunction with the published thresholds.
    """
    # The word/line arrays are projected ONCE into real columns: Catalyst
    # does not hoist loop-invariant subexpressions out of higher-order
    # lambdas, so inlining split() inside the gram transform re-splits the
    # document per gram position — O(words²) regex work per doc (measured
    # 4× wall-clock on the documents table).
    reserve_temp_cols(df, "__w", "__ln")
    d = (df.withColumn("__w", F.split(F.col(text_col), r"\s+"))
         .withColumn("__ln", F.split(F.col(text_col), r"\n")))
    n_words = F.greatest(F.size("__w"), F.lit(1))
    n_lines = F.greatest(F.size("__ln"), F.lit(1))

    def dup_frac(n: int):
        # grams via scalar element_at accesses — per-position slice() +
        # array_join allocate a fresh array per gram; concat_ws over scalar
        # loads codegens flat. CASE guard: Spark's sequence(1, 0) is
        # DESCENDING [1, 0], so a doc with fewer than n words must
        # short-circuit to an empty gram list.
        parts = ", ".join(
            ["element_at(__w, j)"] +
            [f"element_at(__w, j + {i})" for i in range(1, n)])
        grams = F.expr(
            f"CASE WHEN size(__w) < {n} "
            f"THEN cast(array() AS array<string>) "
            f"ELSE transform(sequence(1, size(__w) - {n - 1}), "
            f"j -> concat_ws(' ', {parts})) END")
        total = F.size(grams)
        return F.when(total == 0, F.lit(0.0)).otherwise(
            (total - F.size(F.array_distinct(grams))) / total)

    bullet = F.size(F.filter(
        F.col("__ln"),
        lambda ln: ln.rlike(r"^\s*([-\*•]|\d+[\.\)])\s"))) / n_lines
    ellipsis = F.size(F.filter(
        F.col("__ln"), lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))) / n_lines
    symbols = (F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), r"[#…]", ""))) / n_words
    alpha = F.size(F.filter(
        F.col("__w"), lambda w: w.rlike("[A-Za-z]"))) / n_words

    out = (d
           .withColumn("dup_2gram_frac", F.round(dup_frac(2), 4))
           .withColumn("dup_3gram_frac", F.round(dup_frac(3), 4))
           .withColumn("symbol_word_ratio", F.round(symbols, 4))
           .withColumn("bullet_line_frac", F.round(bullet, 4))
           .withColumn("ellipsis_line_frac", F.round(ellipsis, 4))
           .withColumn("alpha_word_frac", F.round(alpha, 4)))
    return out.withColumn(
        "gopher_pass",
        (F.col("dup_2gram_frac") <= 0.20)
        & (F.col("dup_3gram_frac") <= 0.18)
        & (F.col("symbol_word_ratio") <= 0.10)
        & (F.col("bullet_line_frac") <= 0.90)
        & (F.col("ellipsis_line_frac") <= 0.30)
        & (F.col("alpha_word_frac") >= 0.80)).drop("__w", "__ln")


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Deterministic PII-pattern redaction (the scrub stage of a training
    pipeline): email addresses, international-ish phone numbers, and
    16-digit card-like numbers → typed placeholders. Pure ``regexp_replace``
    chain (JVM, codegen); counts per pattern come out as columns so the
    scrub is auditable."""
    email = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
    phone = r"\+?\d{1,3}[ \-.]?\(?\d{2,4}\)?[ \-.]?\d{3,4}[ \-.]?\d{3,4}"
    card = r"\b(?:\d[ \-]?){15}\d\b"
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(email), F.lit(0)))
    red_ec = F.regexp_replace(
        F.regexp_replace(t, email, "<EMAIL>"), card, "<CARD>")
    n_card = F.size(F.regexp_extract_all(t, F.lit(card), F.lit(0)))
    # phones counted AFTER email/card redaction so their digit runs are not
    # double-claimed by the broader phone pattern
    n_phone = F.size(F.regexp_extract_all(red_ec, F.lit(phone), F.lit(0)))
    red = F.regexp_replace(red_ec, phone, "<PHONE>")
    return (df.withColumn(out_col, red)
            .withColumn("n_emails", n_email)
            .withColumn("n_cards", n_card)
            .withColumn("n_phones", n_phone))


#: 60-bit hash space for the portable selection hash below.
_HASH_SPACE = float(1 << 60)


def _selection_hash(id_col: str, salt: str) -> Column:
    """The engine-portable selection hash shared by deterministic_sample,
    stratified_take and mixture_sample: md5(id || salt), first 15 hex
    digits as a bigint — uniform on [0, 2^60). Oracle twin:
    queries._md5long_sql. Keeping it in ONE place keeps the three
    samplers' selection semantics (and their SQL oracles) in lockstep."""
    from ..functions.registry import md5long

    return md5long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         salt: str = "") -> DataFrame:
    """Reproducible, engine-portable sampling: keep rows whose
    ``md5(id || salt)``-derived 60-bit hash falls under ``fraction`` of the
    hash space. Unlike ``DataFrame.sample`` this is (a) exactly repeatable
    across runs, partitionings and engines (the oracle recomputes the same
    rows in SQL), and (b) stable under data growth — a row's verdict never
    changes when other rows appear, which is what lets incremental
    pipeline runs stay consistent with full reruns."""
    threshold = int(fraction * _HASH_SPACE)
    return df.where(_selection_hash(id_col, salt) < F.lit(threshold))


def stratified_take(df: DataFrame, strata_cols: list[str], n_per_stratum: int,
                    id_col: str = "doc_id", salt: str = "",
                    rank_col: str | None = None) -> DataFrame:
    """Deterministic per-stratum sample of exactly ``n_per_stratum`` rows
    (fewer if the stratum is smaller): the n rows with the smallest
    ``md5(id || salt)`` hash per stratum — the balanced eval-set /
    held-out-split selection op.

    Same portability story as ``deterministic_sample`` (repeatable across
    runs, partitionings, engines; oracle recomputes identical rows in
    SQL), and additionally *quota-exact* per stratum, which a global
    fraction cannot give on skewed strata. Cost: one shuffle on the
    strata columns + a per-stratum top-n window (no global sort). A hot
    stratum serializes into one sorted task — with million-row strata
    prefilter with ``deterministic_sample`` first, then quota here.

    ``rank_col`` optionally exposes the 1-based within-stratum rank."""
    from pyspark.sql.window import Window

    h = _selection_hash(id_col, salt)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(),
                                                F.col(id_col).asc())
    reserve_temp_cols(df, "__rk")
    ranked = df.withColumn("__rk", F.row_number().over(w))
    out = ranked.where(F.col("__rk") <= n_per_stratum)
    if rank_col is None:
        return out.drop("__rk")
    return out.withColumnRenamed("__rk", rank_col)


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    out_col: str = "fingerprint", k: int = 4) -> DataFrame:
    """Rolling-hash document fingerprint: min xxhash64 over k-word windows
    (winnowing-style single-value fingerprint; identical docs ⇒ identical
    fingerprint, near-identical docs ⇒ equal with high probability)."""
    # split projected ONCE (Catalyst does not hoist loop-invariant
    # subexpressions out of lambdas — the inlined form re-split the text
    # per window position, O(words²)); scalar word accesses instead of a
    # slice() allocation per window, and an allocation-free aggregate/
    # least fold instead of materializing the per-window hash array
    # (try_element_at past the end is NULL, which xxhash64 skips — the
    # size<k doc hashes its real words, like the old truncated slice)
    elems = ", ".join(f"try_element_at(__fw, j + {i})" for i in range(k))
    expr = (f"aggregate(sequence(1, greatest(size(__fw) - {k} + 1, 1)), "
            f"9223372036854775807L, "
            f"(acc, j) -> least(acc, xxhash64({elems})))")
    reserve_temp_cols(df, "__fw")
    return (df.withColumn("__fw", F.expr(f"split({text_col}, '\\\\s+')"))
            .withColumn(out_col, F.expr(expr))
            .drop("__fw"))


def tf_idf_terms(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k_top: int = 3,
                 n_docs: int | None = None) -> DataFrame:
    """Top-k distinctive terms per document by tf-idf
    (``tf · ln(N/df)``), exact and engine-portable.

    Plan: explode → groupBy(doc, term) for tf (one shuffle), the
    vocabulary-sized df table aggregated from tf and BROADCAST back (no
    second big shuffle), then a per-doc row_number window. The score is
    emitted as ``score_micro = floor(1e6 · tf · ln(N/df))`` — an integer
    column, so cross-engine float drift (JVM vs libm ``ln`` differ by
    ≤ 1 ulp) cannot flip equality checks except on a floor boundary
    (probability ~2^-45 per row); ranking ties break on the term string.

    At 100 TB: tf shuffles on (doc, term) — well-spread keys; df is
    vocab-sized (≤ a few M rows) and broadcastable; the window shuffles
    once more on doc_id. ``n_docs`` can be passed to skip the count job
    when the caller already knows it.
    """
    from pyspark.sql.window import Window

    n = n_docs if n_docs is not None else df.count()
    w = df.select(F.col(id_col),
                  F.explode(F.split(text_col, " ")).alias("term"))
    tf = w.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .withColumn("score_micro",
                          F.floor(1e6 * F.col("tf")
                                  * F.log(F.lit(float(n)) / F.col("df")))
                          .cast("long")))
    rank = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("score_micro"),
                                           F.asc("term")))
    return (scored.withColumn("rank", rank.cast("int"))
            .where(F.col("rank") <= k_top)
            .select(id_col, "term", "tf", "df", "score_micro", "rank"))


def unigram_logprob_table(df: DataFrame, text_col: str = "text",
                          top_k: int = 65536, alpha: float = 1.0,
                          split_pattern: str = r"\s+",
                          ) -> tuple[DataFrame, float]:
    """CCNet-style corpus unigram LM (Wenzek et al. 2020): lowercased
    ``split_pattern``-separated words → counts → top-``top_k`` vocabulary
    with add-``alpha`` smoothed negative log2 probabilities. Returns
    ``(vocab_df, oov_neg_logp)``: the vocab frame is
    ``(word, n, neg_logp)`` and the float scores any out-of-vocabulary
    word.

    Scale shape: ONE shuffle — the word-key groupBy, whose map-side
    partial aggregate collapses hot stopwords before the exchange (skew-
    safe); the top-k is a TakeOrdered, not a global sort; the totals read
    collects two scalars. The smoothing denominator uses the FULL
    pre-truncation mass, so OOV probability reflects the corpus, not the
    cut."""
    import math

    words = (df.select(F.explode(
        F.split(F.lower(F.col(text_col)), split_pattern)).alias("word"))
        .where(F.col("word") != ""))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"),
                     F.count(F.lit(1)).alias("types")).collect()[0]
    total, types = int(tot.total or 0), int(tot.types)
    denom = float(total) + alpha * (types + 1)      # +1 = the OOV type
    vocab = (counts.orderBy(F.desc("n"), F.asc("word")).limit(top_k)
             .select("word", "n",
                     F.round(-F.log2((F.col("n") + F.lit(float(alpha)))
                                     / F.lit(denom)), 6).alias("neg_logp")))
    return vocab, round(-math.log2(alpha / denom), 6)


def lm_quality_score(df: DataFrame, vocab_df: DataFrame,
                     oov_neg_logp: float, text_col: str = "text",
                     id_col: str = "doc_id",
                     split_pattern: str = r"\s+") -> DataFrame:
    """Per-doc fluency proxy under the broadcast unigram LM: mean
    -log2 p(word) (low = common/fluent, high = rare/gibberish — the
    CCNet head/middle/tail signal) plus the out-of-vocabulary fraction.
    Returns ``(id_col, n_words, avg_neg_logp, oov_frac)``.

    Plan: explode → BROADCAST-join the ≤top_k-row vocab → groupBy(id)
    whose partial aggregate reduces shuffle volume to one partial row per
    doc per input partition — the word stream itself never crosses the
    wire."""
    words = (df.select(F.col(id_col), F.explode(
        F.split(F.lower(F.col(text_col)), split_pattern)).alias("word"))
        .where(F.col("word") != ""))
    j = words.join(F.broadcast(vocab_df.select("word", "neg_logp")),
                   "word", "left")
    nlp = F.coalesce(F.col("neg_logp"), F.lit(float(oov_neg_logp)))
    return (j.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.round(F.avg(nlp), 4).alias("avg_neg_logp"),
                 F.round(F.avg(F.col("neg_logp").isNull().cast("double")),
                         4).alias("oov_frac")))


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   source_col: str = "source", id_col: str = "doc_id",
                   salt: str = "") -> DataFrame:
    """Deterministic domain-mix resampling (downsample-only): per-source
    keep-rates chosen so the output matches the target mixture
    ``weights`` as closely as possible without upsampling (the binding
    source keeps rate 1.0; the output total is the largest achievable),
    selected with the engine-portable md5 hash — the same repeatability
    contract as ``deterministic_sample`` (a row's verdict never changes
    when other rows appear). Sources absent from ``weights`` are dropped.

    All rate arithmetic stays IN-PLAN (per-source counts × the tiny
    weights frame, broadcast back onto the data), so an external engine
    can reproduce the exact selection — and so the only full-data pass
    shuffles nothing: counts have map-side partial agg, the rates join is
    a broadcast. Weights are normalized by their sum; prefer weights
    whose sum is exactly representable (e.g. dyadic fractions) when an
    oracle must reproduce the rates bit-for-bit."""
    spark = df.sparkSession
    total_w = sum(weights.values())
    wdf = spark.createDataFrame(
        [(s, w / total_w) for s, w in weights.items()],
        f"{source_col} string, wt double")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    j = counts.join(wdf, source_col)
    cap = j.select(F.min(F.col("__n") / F.col("wt")).alias("__cap"))
    rates = (j.crossJoin(cap)
             .select(source_col,
                     F.round(F.col("wt") * F.col("__cap") / F.col("__n"),
                             6).alias("__rate")))
    return (df.join(F.broadcast(rates), source_col)
            .where(_selection_hash(id_col, salt)
                   < F.floor(F.col("__rate") * F.lit(_HASH_SPACE))
                   .cast("long"))
            .drop("__rate"))
