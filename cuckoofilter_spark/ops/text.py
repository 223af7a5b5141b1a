"""Text-analysis operators for training-data pipelines.

All hot-path expressions are Spark built-ins (JVM whole-stage codegen,
no Python). Each operator is defined by a rule simple enough to restate
in ANSI SQL, so the driver's DuckDB oracle can verify it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Cross-engine tokenization rule: split on runs of whitespace, drop empties.
_WS = r"\s+"

# Stopword list for the language heuristic and quality scoring — keep in
# sync with the SQL oracle strings in __spark_entry__.py.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def words(col) -> Column:
    """array<string> of whitespace tokens (empty strings removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), _WS), lambda w: w != "")


def token_count(col) -> Column:
    return F.size(words(col))


# BPE-style pre-tokenization rule (GPT-2-ish, ASCII classes so Java
# regex and DuckDB's RE2 agree): letter runs, single digits, single
# non-alnum-non-space marks. Keep in sync with the SQL oracle.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(col) -> Column:
    """Count of BPE-ish pre-tokens (the subword-budget estimate a
    training pipeline uses next to the whitespace word count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0)))


def char_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def avg_word_len(col) -> Column:
    w = words(col)
    return (
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / F.greatest(F.size(w), F.lit(1))
    )


def stopword_ratio(col) -> Column:
    """Fraction of tokens that are English stopwords (lowercased)."""
    w = words(col)
    hits = F.size(F.filter(w, lambda x: F.lower(x).isin(*EN_STOPWORDS)))
    return hits.cast("double") / F.greatest(F.size(w), F.lit(1))


def lang_id(col) -> Column:
    """Heuristic language ID: 'en' when >= 5%% of tokens are English
    stopwords, else 'unknown'. Deliberately simple so the oracle can
    restate it; swap the list per language for a real pipeline."""
    return F.when(stopword_ratio(col) >= 0.05, F.lit("en")).otherwise(F.lit("unknown"))


def quality_score(col) -> Column:
    """Composite quality in [0,1]: length band + word-shape band +
    stopword presence — the classic cheap pre-filter for web corpora.

      0.4 * (20 <= n_tok <= 4000)
    + 0.3 * (2.0 <= avg_word_len <= 12.0)
    + 0.3 * (stopword_ratio >= 0.02)
    """
    n = token_count(col)
    awl = avg_word_len(col)
    swr = stopword_ratio(col)
    return (
        F.when((n >= 20) & (n <= 4000), 0.4).otherwise(0.0)
        + F.when((awl >= 2.0) & (awl <= 12.0), 0.3).otherwise(0.0)
        + F.when(swr >= 0.02, 0.3).otherwise(0.0)
    )


def doc_fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    (whitespace-collapsed, trimmed) text. Cross-engine reproducible."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat_ws(" ", words(c)))


def shingles_from_words(w_col, window: int = 3) -> Column:
    """array<string>: md5 of each ``window``-word shingle — the rolling
    content fingerprint used for near-dup shingling. Built-ins only.

    IMPORTANT: ``w_col`` must be an already-MATERIALIZED array<string>
    column — expressions inside higher-order lambdas are re-evaluated
    per element, so passing ``words(text)`` directly would re-split the
    text once per shingle position (O(n^2) per doc, measured 9s -> 1s
    on 5000 docs)."""
    w = F.col(w_col) if isinstance(w_col, str) else w_col
    n = F.size(w)
    return F.when(n >= window, F.transform(
        F.sequence(F.lit(0), n - window),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i + 1, window))),
    )).otherwise(F.array(F.md5(F.concat_ws(" ", w))))


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 3, w: int = 4) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03) — the canonical rolling-hash document fingerprint: hash
    every k-word gram, keep the minimum hash of each sliding window of
    ``w`` consecutive gram hashes, deduplicate. Guarantee: two documents
    sharing any run of >= w+k-1 words share at least one fingerprint,
    while only ~2/(w+1) of gram hashes are kept — the sub-linear sketch
    a plagiarism/near-dup pipeline stores per document.

    Returns (id_col, fp) exploded, distinct per document. Gram hashes
    are the cross-engine md5-LE64 masked to 62 bits so Spark's signed
    and DuckDB's unsigned orderings agree on every min.

    Precondition: ``id_col`` must be unique (one row per document) —
    the sliding windows partition on it, so duplicate ids would
    interleave words from different rows into the same gram stream.
    Other per-doc text ops process rows independently and don't care;
    this one does.

    Execution shape (the Spark-first linear plan): explode words, build
    each k-gram with ``lead()`` window functions, hash each gram ONCE in
    a plain projection, then take the sliding min with a ROWS-BETWEEN
    window — every stage shares the same (doc, pos) partitioning/sort,
    so the whole operator is one shuffle of the exploded words plus the
    final distinct. Array/higher-order-function forms are a trap here:
    Catalyst's projection collapse inlines the gram-building expression
    into the per-element lambda (and into projections that ride along a
    posexplode), re-evaluating the O(n) chain per element — O(n^2) md5
    passes per document (measured: 50 docs x 2000 words did not finish
    in 300 s; this window form does sf0.1 in seconds).
    """
    from pyspark.sql import Window

    mask = (1 << 62) - 1
    # posexplode_outer keeps empty docs as a single null-word row so the
    # degenerate fingerprint (hash of "") matches the oracle.
    ex = df.select(
        F.col(id_col),
        F.posexplode_outer(words(text_col)).alias("pos", "word"),
    ).withColumn("pos", F.coalesce(F.col("pos"), F.lit(0)))
    byid = Window.partitionBy(id_col).orderBy("pos")
    whole = Window.partitionBy(id_col)
    # concat_ws skips NULL leads, so for docs with n < k the pos-0 row
    # is exactly the whole (short) document — the oracle's else-branch.
    gram = F.concat_ws(
        " ", F.col("word"),
        *[F.lead("word", i).over(byid) for i in range(1, k)])
    n = F.count("word").over(whole)  # counts non-null words
    grams = (ex.select(id_col, "pos", n.alias("n"), gram.alias("gs"))
             .where((F.col("pos") + k <= F.col("n"))
                    | ((F.col("pos") == 0) & (F.col("n") < k))))
    hashed = grams.select(
        id_col, "pos",
        (F.col("n") - k + 1).alias("m"),  # <= 0 means single truncated gram
        md5hex_to_le64(F.md5("gs")).bitwiseAND(F.lit(mask)).alias("h"))
    win = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(Window.currentRow, w - 1))
    # full windows start at pos 0..m-w; when m < w the only (truncated)
    # winnowing window is the whole gram list, i.e. pos 0
    return (hashed.withColumn("wmin", F.min("h").over(win))
            .where((F.col("pos") <= F.col("m") - w) | (F.col("pos") == 0))
            .select(F.col(id_col), F.col("wmin").alias("fp"))
            .distinct())


def md5hex_to_le64(hx) -> Column:
    """int64 whose BITS are the little-endian read of the first 8 md5
    digest bytes (hex chars 1-16 as byte pairs, least-significant
    first). Bit-identical to DuckDB's ``md5_number_upper(s)`` and to
    Python's ``struct.unpack('<Q', md5(s).digest()[:8])`` — the shared
    cross-engine 64-bit string hash used wherever an oracle must
    reproduce our hashing exactly (simhash words, derived token ids)."""
    out = None
    for i in range(8):
        p = F.shiftleft(
            F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long"), 8 * i)
        out = p if out is None else out.bitwiseOR(p)
    return out


def md5_le64(col, salt: str = "") -> Column:
    """``md5hex_to_le64(md5(col || salt))`` as one Column."""
    c = F.col(col) if isinstance(col, str) else col
    return md5hex_to_le64(F.md5(F.concat(c, F.lit(salt)) if salt else c))


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per doc with the full per-document feature set.

    The word array is materialized once (a real column in a sub-select)
    so the six features don't each re-split the text."""
    base = df.select(F.col(id_col), char_count(text_col).alias("n_chars_measured"),
                     words(text_col).alias("W"))
    n = F.size("W")
    wlen_sum = F.aggregate("W", F.lit(0), lambda acc, x: acc + F.length(x))
    awl = wlen_sum.cast("double") / F.greatest(n, F.lit(1))
    hits = F.size(F.filter("W", lambda x: F.lower(x).isin(*EN_STOPWORDS)))
    swr = hits.cast("double") / F.greatest(n, F.lit(1))
    quality = (
        F.when((n >= 20) & (n <= 4000), 0.4).otherwise(0.0)
        + F.when((awl >= 2.0) & (awl <= 12.0), 0.3).otherwise(0.0)
        + F.when(swr >= 0.02, 0.3).otherwise(0.0)
    )
    return base.select(
        F.col(id_col),
        n.alias("n_words"),
        "n_chars_measured",
        F.round(awl, 6).alias("avg_word_len"),
        F.round(swr, 6).alias("stopword_ratio"),
        F.when(swr >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
        F.round(quality, 6).alias("quality"),
        F.md5(F.concat_ws(" ", F.col("W"))).alias("fingerprint"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str,
                     window: int = 3) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText-style
    quality rule "drop docs whose duplicate n-gram fraction is high"):
    per doc, the fraction of whitespace words and of ``window``-word
    grams that are repeats of an earlier occurrence, as exact integer
    micro-rates (``(n - n_distinct) * 1e6 DIV n`` — cross-engine
    bit-exact, no float ambiguity).

    Everything is JVM built-ins over per-row arrays (whole-stage
    codegen, no shuffle, no Python): ``array_distinct`` vs ``size``.
    The word array and the gram array are each materialized in their
    own sub-select before any per-element transform (lambda-captured
    expressions re-evaluate per element — the measured O(n^2) re-split
    trap, see shingle_sets). NULL text is treated as empty (else
    size(NULL) = -1 leaks into the counts)."""
    w = df.select(F.col(id_col),
                  words(F.coalesce(F.col(text_col), F.lit(""))).alias("W"))
    n = F.size("W")
    grams = w.select(
        id_col, "W",
        F.when(n >= window, F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.concat_ws(" ", F.slice("W", i + 1, window)),
        )).otherwise(F.array(F.concat_ws(" ", F.col("W")))).alias("G"))
    # integer DIV (not float / + cast): bit-exact vs the DuckDB oracle
    return grams.select(
        F.col(id_col),
        F.size("W").alias("n_words"),
        F.size("G").alias("n_grams"),
        F.expr("CAST((size(W) - size(array_distinct(W))) * 1000000L "
               "DIV greatest(size(W), 1) AS BIGINT)").alias("dup_word_e6"),
        F.expr("CAST((size(G) - size(array_distinct(G))) * 1000000L "
               "DIV greatest(size(G), 1) AS BIGINT)").alias("dup_gram_e6"),
    )


def unigram_xent(df: DataFrame, id_col: str, text_col: str,
                 vocab_size: int = 10) -> DataFrame:
    """Per-document unigram cross-entropy — the perplexity-style
    quality signal (a doc whose tokens are improbable under the corpus
    unigram model is noise; one whose tokens are all stopwords is
    boilerplate): ``mean over tokens of -ln p(token)``, with p from the
    corpus' top-``vocab_size`` unigram counts and a 1/N floor for
    out-of-vocab tokens.

    Returns ``(doc, n_words, xent_e6)`` with the mean in INTEGER
    micro-nats: each distinct vocab word's -ln(cnt/N) is rounded to
    int64 micro-nats ONCE (only vocab_size + 1 float computations in
    the whole query — both engines hit identical IEEE doubles there),
    then per-doc aggregation is pure integer sum + DIV — bit-exact
    cross-engine, no float accumulation-order sensitivity.

    Scale shape (the vocab_coverage plan): one exploded-word frequency
    shuffle with map-side combine, a driver-free deterministic top-V,
    one BROADCAST join of the tiny scored vocab against the exploded
    stream, and a doc-keyed integer aggregate."""
    from .dedup import _scoped_cache

    toks = df.select(F.col(id_col).alias("doc"),
                     F.explode_outer(words(
                         F.coalesce(F.col(text_col), F.lit("")))).alias("w"))
    # cached (bounded generations): the word-frequency aggregation feeds
    # BOTH the total-count scalar and the top-V vocab — without the
    # cache the corpus-wide groupBy shuffle runs twice
    freq = _scoped_cache("unigram_freq",
                         toks.where(F.col("w").isNotNull()).groupBy("w")
                         .agg(F.count("*").alias("cnt")))
    total = freq.agg(F.sum("cnt").alias("N"))
    vocab = (freq.crossJoin(F.broadcast(total))
             .orderBy(F.col("cnt").desc(), F.col("w").asc())
             .limit(int(vocab_size))
             .select("w", F.expr(
                 "CAST(round(-ln(cnt / CAST(N AS DOUBLE)) * 1000000) "
                 "AS BIGINT)").alias("nats_e6")))
    floor = total.select(F.expr(
        "CAST(round(-ln(1.0 / CAST(N AS DOUBLE)) * 1000000) AS BIGINT)"
    ).alias("floor_e6"))
    return (toks.join(F.broadcast(vocab), "w", "left")
            .crossJoin(F.broadcast(floor))
            .groupBy("doc")
            .agg(F.count("w").alias("n_words"),
                 F.sum(F.when(F.col("w").isNull(), F.lit(0))
                       .otherwise(F.coalesce(F.col("nats_e6"),
                                             F.col("floor_e6"))))
                 .alias("sum_e6"))
            .select("doc", "n_words",
                    F.expr("CAST(coalesce(sum_e6, 0) DIV greatest(n_words, 1)"
                           " AS BIGINT)").alias("xent_e6")))


def vocab_coverage(df: DataFrame, text_col: str, group_col: str,
                   vocab_size: int = 10) -> DataFrame:
    """Tokenizer-vocabulary coverage / OOV rate per group.

    Builds the top-``vocab_size`` words by corpus frequency (ties broken
    by word ascending, so the vocabulary is deterministic — an untied
    ``ORDER BY count DESC LIMIT V`` is engine-dependent at the rank-V
    boundary) and reports, per ``group_col``: total token occurrences,
    occurrences outside the vocabulary, and the OOV rate as an exact
    integer micro-rate (``oov*1e6 DIV total`` — bit-exact cross-engine,
    see q_token_count_total's note on float last-digit ambiguity).

    This is the vocabulary-budget question a tokenizer/training pipeline
    asks of a corpus ("what % of tokens does a V-entry vocab cover, per
    language/source?").

    Scale shape: ONE exploded-word frequency aggregation (map-side
    partial combine, shuffle keyed by word), a driver-free top-V via
    window-free sort-limit (V rows), then a BROADCAST left-anti-ish
    membership join of the tiny vocab against the exploded stream —
    no second wide shuffle on words; the final per-group aggregate is
    keyed by the (small) group column.
    """
    toks = df.select(F.col(group_col).alias("grp"),
                     F.explode(words(text_col)).alias("w"))
    vocab = (toks.groupBy("w").agg(F.count("*").alias("cnt"))
             .orderBy(F.col("cnt").desc(), F.col("w").asc())
             .limit(int(vocab_size))
             .select("w", F.lit(True).alias("in_vocab")))
    return (toks.join(F.broadcast(vocab), "w", "left")
            .groupBy("grp")
            .agg(F.count("*").alias("total_tokens"),
                 F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
                       ).alias("oov_tokens"))
            .withColumn("oov_rate_e6",
                        F.expr("oov_tokens * 1000000 DIV total_tokens"))
            .orderBy("grp"))


def bigram_pmi(df: DataFrame, text_col: str, min_count: int = 5,
               top_k: int = 20) -> DataFrame:
    """Collocation mining: top-``top_k`` word bigrams by pointwise
    mutual information — the phrase-discovery signal a tokenizer /
    vocabulary pipeline runs over a corpus ("which adjacent word pairs
    co-occur far above chance?").

    PMI(x,y) = ln( P(xy) / (P(x)P(y)) )
             = ln( c_xy * N_uni^2 / (N_bi * c_x * c_y) )

    reported in INTEGER micro-nats: the whole ratio is assembled from
    exact 64-bit counts, cast to DOUBLE in a fixed left-to-right
    product/divide order (IEEE ops are deterministic given the same
    order, so both engines see the identical double; see unigram_xent),
    ln'd and rounded ONCE. Rank ties break on (x, y) ascending so the
    top-k cut is deterministic.

    Scale shape: the word arrays are materialized once per doc in a
    sub-select (per-element HOF re-evaluation trap, CLAUDE.md), then
    TWO frequency aggregations (unigrams keyed by word, bigrams keyed
    by pair — both with map-side partial combine) feed the score. The
    ``min_count`` floor is applied BEFORE the two vocabulary joins, so
    only candidate pairs (not the full bigram stream) are joined; the
    corpus totals travel as broadcast 1-row aggregates. Terminal top-k
    is orderBy().limit() = TakeOrderedAndProject (never a global sort).
    """
    from .dedup import _scoped_cache

    w = df.select(words(F.coalesce(F.col(text_col), F.lit(""))).alias("_W"))
    toks = (w.select(F.explode_outer("_W").alias("w"))
            .where(F.col("w").isNotNull()))
    uni = _scoped_cache("pmi_uni",
                        toks.groupBy("w").agg(F.count("*").alias("c")))
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    pairs = (w.select(F.explode_outer(F.expr(
        "CASE WHEN size(_W) >= 2 THEN transform(sequence(1, size(_W) - 1), "
        "i -> struct(element_at(_W, i) AS x, element_at(_W, i + 1) AS y)) "
        "ELSE array() END")).alias("bg"))
        .where(F.col("bg").isNotNull())
        .select("bg.x", "bg.y"))
    bgc = _scoped_cache("pmi_big",
                        pairs.groupBy("x", "y").agg(F.count("*").alias("c_xy")))
    n_bi = bgc.agg(F.sum("c_xy").alias("n_bi"))
    cand = bgc.where(F.col("c_xy") >= int(min_count))
    scored = (cand
              .join(uni.select(F.col("w").alias("x"), F.col("c").alias("c_x")),
                    "x")
              .join(uni.select(F.col("w").alias("y"), F.col("c").alias("c_y")),
                    "y")
              .crossJoin(F.broadcast(n_uni))
              .crossJoin(F.broadcast(n_bi))
              .select(
                  "x", "y", "c_xy",
                  F.expr(
                      "CAST(round(ln((CAST(c_xy AS DOUBLE) * n_uni * n_uni)"
                      " / (CAST(n_bi AS DOUBLE) * c_x * c_y)) * 1000000)"
                      " AS BIGINT)").alias("pmi_e6")))
    return scored.orderBy(F.col("pmi_e6").desc(), F.col("x").asc(),
                          F.col("y").asc()).limit(int(top_k))


def vocab_growth(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """Per-group vocabulary statistics: token count, type count
    (distinct words), hapax count (words seen exactly once in the
    group), type-token ratio and hapax share in integer micro-rates —
    the corpus-health panel a tokenizer/vocab pipeline reads per
    language or source (a collapsing TTR or hapax share flags
    template spam / boilerplate floods).

    Scale shape: explode once, then TWO map-side-combinable
    aggregations keyed (group, word) then (group) — all exact 64-bit
    integers, no floats, no window; output rows = group cardinality.
    """
    toks = (df.select(F.col(group_col).alias("grp"),
                      words(F.coalesce(F.col(text_col), F.lit(""))).alias("_W"))
            .select("grp", F.explode_outer("_W").alias("w"))
            .where(F.col("w").isNotNull()))
    wc = toks.groupBy("grp", "w").agg(F.count("*").alias("c"))
    return (wc.groupBy("grp")
            .agg(F.sum("c").alias("n_tokens"),
                 F.count("*").alias("n_types"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"))
            .withColumn("ttr_e6",
                        F.expr("n_types * 1000000 DIV greatest(n_tokens, 1)"))
            .withColumn("hapax_e6",
                        F.expr("hapax * 1000000 DIV greatest(n_types, 1)"))
            .orderBy("grp"))


def group_keyness(df: DataFrame, text_col: str, group_col: str,
                  top_k: int = 3) -> DataFrame:
    """Source signatures: the ``top_k`` most over-represented words per
    group by keyness = PMI(group; word) = ln((c_gw * T) / (T_g * c_w))
    — "which words does this source/language use far above the corpus
    rate?", the per-source fingerprint a mixing pipeline inspects (and
    the degenerate-template detector: a crawler dump whose signature
    is navigation boilerplate). Plain idf dies when every word occurs
    in every group; the rate ratio does not.

    Reported in integer micro-nats: all four factors are exact 64-bit
    counts, cast to DOUBLE in one fixed left-to-right product/divide
    chain (deterministic cross-engine, see bigram_pmi), ln'd and
    rounded once. Ties break on word ascending.

    Scale shape: one (group, word) aggregation, a broadcastable
    corpus-level word-frequency side (vocabulary-sized), broadcast
    1-row total, then a per-group row_number window over candidates —
    window input is |groups| * |vocab|, never the token stream. For
    hot groups at extreme vocabulary sizes, per_key_topk's salted
    form is the drop-in.
    """
    from .dedup import _scoped_cache

    toks = (df.select(F.col(group_col).alias("grp"),
                      words(F.coalesce(F.col(text_col), F.lit(""))).alias("_W"))
            .select("grp", F.explode_outer("_W").alias("w"))
            .where(F.col("w").isNotNull()))
    # gw is read four ways (itself + both marginals + the total); cache
    # it so the token-stream aggregation runs ONCE — gw is only
    # |groups| x |vocab| rows, corpus-independent in size
    gw = _scoped_cache("keyness_gw",
                       toks.groupBy("grp", "w").agg(F.count("*").alias("c_gw")))
    gtot = gw.groupBy("grp").agg(F.sum("c_gw").alias("t_g"))
    wtot = gw.groupBy("w").agg(F.sum("c_gw").alias("c_w"))
    tot = gtot.agg(F.sum("t_g").alias("t"))
    # gtot is |groups| rows — always broadcastable. wtot is
    # vocabulary-sized (can be 10^8 rows at corpus scale): leave the
    # strategy to Catalyst/AQE, which broadcasts it exactly when small.
    scored = (gw.join(F.broadcast(gtot), "grp")
              .join(wtot, "w")
              .crossJoin(F.broadcast(tot))
              .select("grp", "w", "c_gw",
                      F.expr("CAST(round(ln((CAST(c_gw AS DOUBLE) * t)"
                             " / (CAST(t_g AS DOUBLE) * c_w))"
                             " * 1000000) AS BIGINT)").alias("keyness_e6")))
    rk = Window.partitionBy("grp").orderBy(F.col("keyness_e6").desc(),
                                           F.col("w").asc())
    return (scored.withColumn("_r", F.row_number().over(rk))
            .where(F.col("_r") <= int(top_k)).drop("_r")
            .orderBy("grp", F.col("keyness_e6").desc(), "w"))


def filter_cascade(df: DataFrame, text_col: str, group_col: str,
                   min_words: int = 5, max_words: int = 4000,
                   awl_lo: int = 2, awl_hi: int = 12,
                   stop_div: int = 50, ttr_div: int = 10) -> DataFrame:
    """Gopher-style quality-filter funnel: per group, how many docs
    survive each CUMULATIVE rule, and how many words survive the whole
    cascade (the number a pipeline actually budgets on).

    Rules (applied in order; every threshold is integer-exact, so the
    DuckDB oracle reproduces the booleans bit-for-bit — no double
    ratios cross the engine boundary):

    1. word count in [min_words, max_words]
    2. mean word length in [awl_lo, awl_hi]   (as awl_lo*n <= sum_len <= awl_hi*n)
    3. stopword ratio >= 1/stop_div           (as stop_hits*stop_div >= n)
    4. type-token ratio >= 1/ttr_div          (as n_distinct*ttr_div >= n)

    Output per group: ``n_docs``, ``pass_1``..``pass_4`` (cumulative
    survivor counts) and ``words_kept`` (sum of word counts over docs
    passing all four).

    Plan shape: one projection (the word array materialized once per
    doc in a sub-select — the per-element HOF re-evaluation trap — and
    four linear JVM array ops over it), then ONE hash aggregate on the
    group with map-side partials. No window, no join, no Python; the
    whole cascade is a single pass over the corpus.

    Reference parity: the conditional-survival accounting mirrors the
    reference harness's found_count/total counting loops
    (benchmarks/bulk-insert-and-query.cc:509-542) re-expressed as one
    conditional aggregation instead of per-item branches.
    """
    base = df.select(F.col(group_col).alias("grp"),
                     words(F.coalesce(F.col(text_col), F.lit(""))).alias("W"))
    n = F.size("W").cast("long")
    # fold zero is LONG: an int accumulator would wrap on a >2^31-char
    # document (length() is fine per word; the SUM is what grows)
    sum_len = F.aggregate("W", F.lit(0).cast("long"),
                          lambda acc, x: acc + F.length(x))
    stop_hits = F.size(F.filter("W", lambda x: F.lower(x).isin(*EN_STOPWORDS)))
    n_distinct = F.size(F.array_distinct("W"))
    feats = base.select(
        "grp", n.alias("_n"), sum_len.alias("_sl"),
        stop_hits.cast("long").alias("_sh"),
        n_distinct.cast("long").alias("_nd"))
    r1 = (F.col("_n") >= min_words) & (F.col("_n") <= max_words)
    r2 = ((F.lit(awl_lo) * F.col("_n") <= F.col("_sl"))
          & (F.col("_sl") <= F.lit(awl_hi) * F.col("_n")))
    r3 = F.col("_sh") * stop_div >= F.col("_n")
    r4 = F.col("_nd") * ttr_div >= F.col("_n")
    c1, c2, c3, c4 = r1, r1 & r2, r1 & r2 & r3, r1 & r2 & r3 & r4
    as_n = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (feats.groupBy(F.col("grp").alias(group_col))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 as_n(c1).alias("pass_1"), as_n(c2).alias("pass_2"),
                 as_n(c3).alias("pass_3"), as_n(c4).alias("pass_4"),
                 F.sum(F.when(c4, F.col("_n")).otherwise(0))
                 .cast("long").alias("words_kept")))


def zipf_fit(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """Rank-frequency (Zipf) slope per group: OLS fit of ln(freq) on
    ln(rank) over the group's word-frequency table — the corpus-health
    scalar that flags templated/duplicated text (slope near 0) vs
    natural language (slope near -1).

    Cross-engine determinism (the unigram_xent / bigram_pmi recipe):
    each point's coordinates are quantized ONCE to integer micro-nats
    (x = round(ln(rank)*1e6), y = round(ln(freq)*1e6) — ln of exact
    64-bit integers, one double op each), all OLS moments are then
    EXACT integer sums (order-free), and the slope is assembled from
    the four moments in one fixed double expression rounded once to
    micro-units. Overflow envelope: |x|,|y| <= ln(2^63)*1e6 < 4.4e7,
    so a term x*y < 2e15 — a 10^7-type vocabulary pushes sum(x*y)
    past int64, so the second-order moments accumulate as
    DECIMAL(38,0) (Spark's exact decimal sum; DuckDB's BIGINT sum is
    HUGEINT, also exact) and the cross products of first-order sums
    are computed in decimal too (sx^2 alone can reach 1e33). Groups
    with a single type (denominator 0) report NULL.

    Plan shape: one exchange for the (group, word) frequency aggregate,
    a vocabulary-sized window for the rank (partitioned by group —
    vocab-sized, NOT corpus-sized: the window input is the frequency
    table), and one tiny final aggregate per group.
    """
    toks = (df.select(F.col(group_col).alias("grp"),
                      words(F.coalesce(F.col(text_col),
                                       F.lit(""))).alias("_W"))
            .select("grp", F.explode_outer("_W").alias("w"))
            .where(F.col("w").isNotNull()))
    freq = toks.groupBy("grp", "w").agg(F.count("*").alias("c"))
    rk = Window.partitionBy("grp").orderBy(F.col("c").desc(),
                                           F.col("w").asc())
    pts = (freq.withColumn("_rk", F.row_number().over(rk))
           .select("grp",
                   F.expr("CAST(round(ln(CAST(_rk AS DOUBLE)) * 1000000) "
                          "AS BIGINT)").alias("x"),
                   F.expr("CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) "
                          "AS BIGINT)").alias("y")))
    dec = "decimal(38,0)"
    s = (pts.groupBy(F.col("grp").alias(group_col))
         .agg(F.count(F.lit(1)).alias("n_types"),
              F.sum("x").alias("_sx"), F.sum("y").alias("_sy"),
              F.sum(F.col("x").cast(dec) * F.col("y")).alias("_sxy"),
              F.sum(F.col("x").cast(dec) * F.col("x")).alias("_sxx")))
    nt = F.col("n_types").cast(dec)
    sx, sy = F.col("_sx").cast(dec), F.col("_sy").cast(dec)
    den = nt * F.col("_sxx") - sx * sx
    num = nt * F.col("_sxy") - sx * sy
    return s.select(
        group_col, "n_types",
        F.when(den != 0, F.round(num.cast("double") / den.cast("double")
                                 * 1000000).cast("long")).alias("slope_e6"))
