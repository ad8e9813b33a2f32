"""Text analysis operators over the ``documents`` table.

All JVM-side Catalyst expressions (no Python in the hot path): token
counting, quality scoring, n-gram-free stopword language ID, and
md5-based document fingerprinting. Each is deterministic and
SQL-expressible so the DuckDB oracle can replay it exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from methyl_data_pipeline_spark.functions.scalar import normalize_label

# Tiny per-language stopword sets for the heuristic language scorer.
# Deliberately small + hard-coded: the scorer is a deterministic
# hit-count argmax, not a trained model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "por", "para"],
}


# Boilerplate-relevant confusable map (VERDICT r11 #4): the space
# variants crawled text actually contains (NBSP, figure space, narrow
# NBSP -> plain space) and the zero-width characters that make
# visually-identical lines hash apart (ZWSP, ZWNJ, ZWJ, word joiner,
# BOM -> deleted). One bounded translate, JVM-side; translate deletes
# source chars beyond the replacement string's length — the same
# semantics as DuckDB's translate, so the oracle twin is
# translate(text, <same chars via chr()>, '   ').
_CONFUSABLE_SRC = "\u00a0\u2007\u202f\u200b\u200c\u200d\u2060\ufeff"
_CONFUSABLE_DST = "   "




def normalize_text(text: Column | str, nfc: bool = True) -> Column:
    """Unicode normalization for dedup/quality KEYS (VERDICT r11 #4,
    CCNet/C4 stage-0 hygiene): map the boilerplate-relevant confusable
    set (NBSP/figure-space/narrow-NBSP -> space, zero-widths/BOM ->
    deleted) with one bounded JVM translate, then NFC-compose via an
    Arrow-batched pandas UDF (``nfc=False`` skips it and stays fully
    JVM-side). Without this, a footer differing only by an NBSP or a
    decomposed accent hashes differently and SURVIVES line/shingle
    dedup. Engine-replayable: DuckDB ``nfc_normalize(translate(...))``
    computes the identical string (both sides implement Unicode NFC).
    Unicode-version coupling (ADVICE r12): Python ``unicodedata``
    tracks CPython's bundled UCD while DuckDB's utf8proc tracks its
    own — NFC is stable for assigned codepoints, but a codepoint
    assigned in only one engine's table can normalize differently;
    the oracle-fixture contract therefore plants only codepoints
    whose composition behavior predates both engines' Unicode
    versions (NBSP, zero-widths, combining acute — stable since
    Unicode 3.0).
    NULL text -> NULL. Composes UNDER ``normalize_label`` /
    ``normalize_ws`` (those squeeze the plain spaces this map
    produces)."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.translate(c, _CONFUSABLE_SRC, _CONFUSABLE_DST)
    if not nfc:
        return out
    # udf constructed lazily with a DataType instance: decorating at
    # module level (or with a DDL string) resolves the return type
    # through the ACTIVE session, which breaks plain library imports.
    # The mapper is a LOCAL function so cloudpickle ships it by VALUE
    # — executors need no copy of this package on their PYTHONPATH
    # (the verify drive runs workers from outside the repo).
    from pyspark.sql.types import StringType

    def _nfc_series(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return pandas_udf(_nfc_series, StringType())(out)


# Percent-escapes whose decoded byte is an RFC 3986 UNRESERVED char
# ([A-Za-z0-9._~-]) — matched on the UPPERCASED hex pair so the
# decode step (unhex) only ever sees bytes that are valid single-byte
# UTF-8: 2D(-) 2E(.) 30-39(0-9) 41-5A(A-Z) 5F(_) 61-7A(a-z) 7E(~).
# Matching the hex PATTERN instead of decoding-then-testing keeps the
# oracle replay safe: DuckDB's decode() THROWS on a 0x80+ single-byte
# blob (e.g. '%FF'), so decoding must be gated on this class, never
# attempted first.
_UNRESERVED_HEX = "^(2[DE]|3[0-9]|4[1-9A-F]|5[0-9A]|5F|6[1-9A-F]|7[0-9A]|7E)$"


def _decode_unreserved_escapes(u: Column) -> Column:
    """Decode ``%XX`` escapes of unreserved chars and uppercase the
    hex of every remaining (reserved/non-ASCII) escape — the two
    RFC 3986 §6.2.2 normalizations that never change what a URL
    identifies. Split on ``%``: token 0 is literal; each later token
    starts at an escape site. Engine-neutral by construction: the
    same split/substr/CASE chain replays in DuckDB (string_split +
    list_transform), and unhex/decode run only behind the
    ``_UNRESERVED_HEX`` guard."""
    parts = F.split(u, "%", -1)

    def _tok(t: Column) -> Column:
        up = F.upper(F.substring(t, 1, 2))
        rest = F.substring(t, 3, 2_000_000)
        return (
            F.when(
                up.rlike(_UNRESERVED_HEX),
                F.concat(F.decode(F.unhex(up), "UTF-8"), rest),
            )
            .when(
                up.rlike("^[0-9A-F]{2}$"),
                F.concat(F.lit("%"), up, rest),
            )
            .otherwise(F.concat(F.lit("%"), t))
        )

    tail = F.transform(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))), _tok
    )
    return F.concat(F.element_at(parts, 1), F.array_join(tail, ""))


def canonicalize_url(url: Column | str) -> Column:
    """URL canonicalization for crawl-curation dedup keys (VERDICT
    r11 #5 — CCNet stage 0; r12 #5 closed the SURT-normalization
    gaps): strip ALL whitespace, decode unreserved percent-escapes
    (``%41`` -> ``A``) and uppercase the hex of remaining escapes
    (RFC 3986 §6.2.2), strip fragment, strip http/https scheme,
    lowercase the HOST (path case is preserved — it is significant),
    strip a leading ``www.``, strip a default ``:80``/``:443`` port,
    strip trailing slashes from the path, and sort query parameters
    (binary string order, empty params dropped). Pure JVM expressions
    — regexp peels plus one array_sort and one escape-site transform
    — no UDF; NULL propagates. Every peel regex anchors at ``^``/``$``
    and matches at most once, so Spark's replace-all and DuckDB's
    replace-first semantics agree; the ONE replace-ALL rewrite (the
    whitespace scrub) needs DuckDB's explicit ``'g'`` flag in the
    oracle.
    Whitespace is scrubbed EVERYWHERE, not trimmed (ADVICE r12: Java
    regex ``$`` matches before a trailing newline while RE2 ``$`` is
    end-of-string — scrubbing first means the anchored peels see
    identical strings in both engines).

    ``https://WWW.Example.COM:443/%44ocs/1/?b=2&%61=1#frag`` ->
    ``example.com/Docs/1?a=1&b=2``.
    """
    c = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(c, r"\s", "")
    u = _decode_unreserved_escapes(u)
    u = F.regexp_replace(u, "#.*$", "")
    u = F.regexp_replace(u, "(?i)^https?://", "")
    host = F.regexp_extract(u, "^([^/?]*)", 1)
    rest = F.regexp_replace(u, "^[^/?]*", "")
    host = F.regexp_replace(F.lower(host), r"^www\.", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    path = F.regexp_replace(
        F.regexp_extract(rest, "^([^?]*)", 1), "/+$", ""
    )
    query = F.regexp_replace(rest, r"^[^?]*\??", "")
    q_sorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    return F.concat(
        host,
        path,
        F.when(q_sorted != "", F.concat(F.lit("?"), q_sorted)).otherwise(
            F.lit("")
        ),
    )


def words(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def n_words_nullsafe(text: Column | str) -> Column:
    """NULL-safe whitespace token count: NULL text -> NULL.

    ``F.size`` of a NULL array is **-1** under Spark's legacy
    ``sizeOfNull`` (ANSI off), which silently feeds -1 into SUMs and
    per-row outputs, while SQL engines (DuckDB ``len(string_split(
    NULL, ...))``) propagate NULL and let aggregates skip the row.
    Every token-count site must route through this helper so both
    engines see the same NULL semantics on NULL-bearing corpora.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.when(c.isNotNull(), F.size(words(c)))


# GPT-2-style pre-tokenizer pattern (public: the regex published with
# the GPT-2 BPE), restricted to ASCII classes so Java-regex (Spark) and
# RE2 (external engines) agree on every boundary: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``tokens`` (array) and three token counts: ``n_tokens``
    (whitespace), ``n_tokens_est`` (4 chars ≈ 1 token rule of thumb),
    and ``n_tokens_bpe`` (matches of the BPE-ish pre-tokenizer regex —
    what a GPT-2-family tokenizer would split before merges)."""
    return (
        df.withColumn("tokens", words(text_col))
        .withColumn("n_tokens", n_words_nullsafe(text_col))
        .withColumn(
            "n_tokens_est",
            F.ceil(F.length(F.trim(F.col(text_col))) / F.lit(4.0)).cast("long"),
        )
        .withColumn(
            "n_tokens_bpe",
            F.regexp_count(F.trim(F.col(text_col)), F.lit(BPE_SPLIT_PATTERN)).cast(
                "long"
            ),
        )
    )


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, word count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio.

    Pure column expressions — a 100 TB scan stays in whole-stage
    codegen with the parquet reader pruning to one column.
    """
    t = F.trim(F.col(text_col))
    n_chars = F.length(t)
    ws = words(text_col)
    # NULL-safe counts: F.size(NULL) = -1 under legacy sizeOfNull would
    # turn every NULL-text ratio into a number while SQL engines emit
    # NULL — count columns must be NULL for NULL text on both engines.
    n_words = n_words_nullsafe(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.when(
        F.col(text_col).isNotNull(),
        F.size(F.filter(ws, lambda w: F.array_contains(en, w))),
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            (F.length(F.regexp_replace(t, r"\s+", "")) / n_words).cast("double"),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct / n_chars).cast("double"),
        )
        .withColumn("stopword_ratio", (n_stop / n_words).cast("double"))
        .withColumn(
            "upper_ratio",
            F.when(n_chars > 0, n_upper / n_chars).cast("double"),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword hit counts, ``und``
    (undetermined) when no stopword matches. Deterministic tie-break by
    language code order."""
    ws = words(text_col)

    def stop_count(stoplist: list[str]):
        arr = F.array(*[F.lit(s) for s in stoplist])
        return F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))

    scores = [
        stop_count(sl).alias(f"_score_{lang}") for lang, sl in STOPWORDS.items()
    ]
    out = df.select("*", *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"_score_{lg}") for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties
        expr = F.when((F.col(f"_score_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return out.withColumn("lang_pred", expr).drop(*[f"_score_{lg}" for lg in langs])


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    Classic two-pass shape, all JVM-side: explode words → per-(doc,
    term) counts (one shuffle) → document frequencies (agg over the
    same keys) → idf = ln((N+1)/(df+1)) + 1 (smoothed) → per-doc top-k
    window. The corpus-size N is a broadcast scalar aggregate.
    """
    from pyspark.sql import Window

    w = df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    # The document-frequency branch re-runs the token explode + (doc,
    # term) aggregate; persisting tf to avoid that measured SLOWER at
    # sf0.1 (1.42s vs 0.92s) because tf is DATA-sized — the cache
    # write costs about what the recompute saves. Lazy stays the
    # default (contrast the vocab-/domain-sized caches in
    # unigram_logprob/domain_mix, where the cached frame is tiny
    # relative to its corpus-aggregate lineage).
    tf = w.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    win = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tfidf")
    )


def md5_long(col: Column, salt: str | None = None) -> Column:
    """Deterministic 60-bit integer hash via md5 — chosen because both
    Spark (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
    (`('0x'||substr(md5(x),1,15))::BIGINT`) compute the identical value,
    making every hash-based operator oracle-checkable."""
    if salt is not None:
        col = F.concat(F.lit(salt), F.lit("|"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: 60-bit hash of whitespace-normalized,
    lowercased text — the exact-dedup key that survives formatting
    noise."""
    from methyl_data_pipeline_spark.functions.scalar import normalize_label

    return df.withColumn(
        "fingerprint", md5_long(normalize_label(F.col(text_col)))
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (the MOSS
    algorithm, Schleimer/Wilkerson/Aiken SIGMOD'03): hash every
    character k-gram, then keep the minimum hash of each sliding window
    of ``window`` consecutive k-gram hashes, deduplicated. Matching
    fingerprints between documents witness shared substrings of length
    >= k; every shared substring of length >= k + window - 1 is
    guaranteed to be detected.

    One row out per (doc, distinct selected fingerprint).

    Physical shape: posexplode the k-gram start positions, hash each
    k-gram ONCE per row (whole-stage codegen), then the sliding-window
    minimum is a frame-bounded window function over (doc, pos) — one
    shuffle keyed on the doc id. The tempting all-HOF formulation
    (transform over windows of a transform-built hash array) is a trap:
    CollapseProject inlines the hash-array expression into every window
    lambda, re-hashing the whole document once per window position
    (O(len²) md5 calls — measured 1.2 s/doc vs ~ms here).
    """
    from pyspark.sql import Window

    from methyl_data_pipeline_spark.ext.dedup import _spread

    # NULL text has no k-grams: without the filter, greatest(NULL, 1)
    # = 1 (Spark greatest skips NULLs) fabricates one NULL fingerprint
    # per NULL doc that unnest-based SQL engines never emit.
    df = _spread(df.filter(F.col(text_col).isNotNull()), id_col)
    norm = normalize_label(F.col(text_col))
    t = df.select(F.col(id_col), norm.alias("_t"))
    starts = t.select(
        F.col(id_col),
        F.col("_t"),
        F.posexplode(
            F.expr(f"sequence(1, greatest(length(_t) - {k} + 1, 1))")
        ).alias("_pos", "_start"),
    )
    # hash the k-gram: 60-bit md5 prefix (same basis as ext.dedup)
    hashed = starts.select(
        F.col(id_col),
        F.col("_pos"),
        F.conv(F.substring(F.md5(F.expr(f"substring(_t, _start, {k})")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    w_slide = (
        Window.partitionBy(id_col).orderBy("_pos").rowsBetween(0, window - 1)
    )
    w_doc = Window.partitionBy(id_col)
    return (
        hashed.withColumn("_wmin", F.min("_h").over(w_slide))
        .withColumn("_n", F.count(F.lit(1)).over(w_doc))
        .filter(F.col("_pos") <= F.greatest(F.col("_n") - window, F.lit(0)))
        .select(F.col(id_col), F.col("_wmin").alias("fingerprint"))
        .distinct()
    )


def domain_mix(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Corpus mixture accounting: per-domain document and token counts,
    the domain's share of corpus tokens, and the sampling weight that
    would re-balance it to a target mixture (uniform across observed
    domains when ``target`` is None) — the domain-reweighting step of
    pretraining-data pipelines (Pile/DoReMi-style static mixtures).

    ``weight`` multiplies a domain's natural share up/down to its
    target share; documents sampled with probability proportional to
    ``weight`` yield the target token mixture in expectation.

    One map-side-combined aggregation over the scan (token counting is
    a codegen expression, no explode); the corpus totals come from an
    unpartitioned window over the DOMAIN-sized aggregate — not a
    separate ``per.agg`` branch crossJoined back, which would re-run
    the corpus scan (Catalyst does not share a subplan across
    branches). The single-task window holds one row per domain.
    """
    from pyspark.sql import Window

    n_tok = n_words_nullsafe(text_col)
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    out = per.withColumn("_tot", F.sum("n_tokens").over(w)).withColumn(
        "_k", F.count(F.lit(1)).over(w)
    )
    if target is None:
        tgt = 1.0 / F.col("_k")
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        tgt = F.coalesce(mapping[F.col("domain")], F.lit(0.0))
    share = F.col("n_tokens") / F.col("_tot")
    return out.select(
        "domain",
        "n_docs",
        "n_tokens",
        share.cast("double").alias("token_share"),
        tgt.cast("double").alias("target_share"),
        (tgt / share).cast("double").alias("weight"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document: ``top_word_frac``
    (fraction of tokens that are the single most frequent token),
    ``top_bigram_frac`` (same for word bigrams), and
    ``type_token_ratio`` (distinct tokens / tokens). High top-n-gram
    fractions and low TTR mark boilerplate/spam documents in
    pretraining-corpus filtering (reference semantics: the repetition
    rules of Rae et al.'s Gopher quality pipeline).

    Physical shape: one explode of unigrams+bigrams (bigrams built by a
    linear HOF over the token array, no second pass over the text),
    then a (doc, n, gram) count — ONE data-sized shuffle with map-side
    partial aggregation; the two follow-up aggs run on doc-sized
    (already tiny) intermediates. No O(len²) per-row mode computation.
    """
    ws = words(text_col)
    base = df.select(F.col(id_col), ws.alias("_w")).withColumn(
        "_bg",
        F.expr(
            "CASE WHEN size(_w) >= 2 THEN "
            "transform(sequence(1, size(_w) - 1), i -> concat(_w[i-1], ' ', _w[i])) "
            "ELSE cast(array() AS array<string>) END"
        ),
    )
    grams = base.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform("_w", lambda w: F.struct(F.lit(1).alias("n"), w.alias("g"))),
                F.transform("_bg", lambda b: F.struct(F.lit(2).alias("n"), b.alias("g"))),
            )
        ).alias("_gr"),
    ).select(id_col, F.col("_gr.n").alias("_n"), F.col("_gr.g").alias("_g"))
    counts = grams.groupBy(id_col, "_n", "_g").agg(F.count(F.lit(1)).alias("_cnt"))
    stats = counts.groupBy(id_col, "_n").agg(
        F.max("_cnt").alias("_top"),
        F.sum("_cnt").alias("_tot"),
        F.count(F.lit(1)).alias("_dist"),
    )
    u = F.when(F.col("_n") == 1, F.col("_top"))
    pivoted = stats.groupBy(id_col).agg(
        F.max(u).alias("_u_top"),
        F.max(F.when(F.col("_n") == 1, F.col("_tot"))).alias("_u_tot"),
        F.max(F.when(F.col("_n") == 1, F.col("_dist"))).alias("_u_dist"),
        F.max(F.when(F.col("_n") == 2, F.col("_top"))).alias("_b_top"),
        F.max(F.when(F.col("_n") == 2, F.col("_tot"))).alias("_b_tot"),
    )
    return pivoted.select(
        F.col(id_col),
        F.col("_u_tot").cast("long").alias("n_words"),
        (F.col("_u_top") / F.col("_u_tot")).cast("double").alias("top_word_frac"),
        (F.col("_u_dist") / F.col("_u_tot")).cast("double").alias("type_token_ratio"),
        F.coalesce(F.col("_b_top") / F.col("_b_tot"), F.lit(0.0))
        .cast("double")
        .alias("top_bigram_frac"),
    )


# PII patterns, deliberately restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB oracle): no
# backrefs, no lookaround, ASCII classes only.
PII_PATTERNS = {
    # order matters: emails first (their local part can look like a
    # phone), then IPs (dotted digits would otherwise match phone), then
    # phones.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
}


def pii_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction: replace emails, IPv4 addresses, and phone numbers
    with ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tokens and count each.

    Pure Catalyst ``regexp_replace``/``regexp_count`` chain — a 100 TB
    scan stays in whole-stage codegen, one pass, no shuffle at all.
    Emits per-doc match counts and an md5 witness of the redacted text
    so an oracle can prove transform parity without comparing full
    bodies.
    """
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    red = t
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(
        F.col(id_col),
        *counts,
        F.length(red).cast("long").alias("redacted_len"),
        F.substring(F.md5(red), 1, 16).alias("redacted_sig"),
    )


def _max_run_sorted(arr) -> Column:
    """Longest equal-run in a SORTED array == multiplicity of its mode.
    Linear fold with (prev, run, best) struct state — the per-row trick
    that lets mode-based repetition stats run shuffle-free."""
    return F.aggregate(
        arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(w.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )


def repetition_signals_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shuffle-free twin of :func:`repetition_signals`: identical
    output columns, but the mode multiplicities come from
    :func:`_max_run_sorted` over the sorted unigram/bigram arrays and
    the distinct count from ``array_distinct`` — a pure per-row scan
    (ZERO shuffles, stream-legal). Per-row cost is O(n log n) in
    document tokens vs the explode twin's shuffle of every (doc, gram)
    pair; at 100 TB the scan wins until documents stop fitting in a
    row, which the corpus schema already forbids.

    NULL-text docs are dropped, matching the explode twin (a NULL
    array explodes to zero grams, so the doc never aggregates) and
    NULL-propagating SQL engines."""
    ws = words(text_col)
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), ws.alias("_w")
    ).withColumn(
        "_bg",
        F.expr(
            "CASE WHEN size(_w) >= 2 THEN "
            "transform(sequence(1, size(_w) - 1), i -> concat(_w[i-1], ' ', _w[i])) "
            "ELSE cast(array() AS array<string>) END"
        ),
    )
    nw = F.size("_w")
    nb = F.size("_bg")
    return base.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        (_max_run_sorted(F.array_sort("_w")) / nw).cast("double").alias("top_word_frac"),
        (F.size(F.array_distinct("_w")) / nw).cast("double").alias("type_token_ratio"),
        F.when(nb > 0, _max_run_sorted(F.array_sort("_bg")) / nb)
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("top_bigram_frac"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_top_word_frac: float = 0.30,
    min_type_token_ratio: float = 0.30,
    min_stopword_hits: int = 1,
) -> DataFrame:
    """C4/Gopher-style document quality verdict: evaluates the standard
    repetition + shape rules and emits ``keep`` plus a deterministic
    comma-joined ``reject_reasons`` string (empty when kept).

    Rules (each names its reason token): word count in
    [min_words, max_words] (``too_short``/``too_long``), mean word
    length in [min, max] (``word_len``), top-word fraction <= max
    (``repetitive``), type-token ratio >= min (``low_diversity``),
    at least ``min_stopword_hits`` English stopwords (``no_stopwords``).

    Physical shape: scan-side signals (stopword hits, mean word length)
    are codegen expressions; the repetition stats come from
    :func:`repetition_signals` (one explode shuffle); one doc-keyed
    join marries them. At 100 TB both sides are partitioned by the same
    key and the verdict is a pure projection.
    """
    ws = words(text_col)
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    scan = df.select(
        F.col(id_col),
        F.col(text_col).isNull().alias("_isnull"),
        F.size(ws).alias("_nw"),
        (
            F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
            / F.size(ws)
        ).alias("_mwl"),
        F.size(F.filter(ws, lambda w: F.array_contains(en, w))).alias("_stop"),
    )
    # LEFT join: a NULL-text doc explodes to zero grams and has no
    # repetition row, but it must still receive a verdict (null_text).
    rep = repetition_signals(df, text_col=text_col, id_col=id_col)
    j = scan.join(rep, id_col, "left")
    plain_reasons = F.concat_ws(
        ",",
        F.when(F.col("_nw") < min_words, F.lit("too_short")),
        F.when(F.col("_nw") > max_words, F.lit("too_long")),
        F.when(
            (F.col("_mwl") < min_mean_word_len)
            | (F.col("_mwl") > max_mean_word_len),
            F.lit("word_len"),
        ),
        F.when(F.col("top_word_frac") > max_top_word_frac, F.lit("repetitive")),
        F.when(
            F.col("type_token_ratio") < min_type_token_ratio,
            F.lit("low_diversity"),
        ),
        F.when(F.col("_stop") < min_stopword_hits, F.lit("no_stopwords")),
    )
    reasons = F.when(F.col("_isnull"), F.lit("null_text")).otherwise(
        plain_reasons
    )
    return j.select(
        F.col(id_col),
        F.col("n_words"),
        reasons.alias("reject_reasons"),
        (reasons == "").alias("keep"),
    )


def quality_reject_reasons(
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_top_word_frac: float = 0.30,
    min_type_token_ratio: float = 0.30,
    min_stopword_hits: int = 1,
) -> Column:
    """The scan-side C4/Gopher verdict as a single Column expression
    (empty string = keep). Lets pipelines FILTER on quality inline —
    ``df.filter(quality_reject_reasons() == "")`` — with no self-join
    against a verdict projection; :func:`quality_filter_scan` wraps it
    into the tabular verdict output."""
    ws = words(text_col)
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    top_cnt = _max_run_sorted(F.array_sort(ws))
    nw = F.size(ws)
    mwl = F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")) / nw
    twf = top_cnt / nw
    ttr = F.size(F.array_distinct(ws)) / nw
    stop = F.size(F.filter(ws, lambda w: F.array_contains(en, w)))
    # NULL text gets its own explicit verdict: without this branch,
    # Spark's legacy F.size(NULL)=-1 would synthesize
    # "too_short,no_stopwords" while a NULL-propagating SQL engine
    # omits every CASE — a cross-engine divergence on NULL corpora.
    return F.when(F.col(text_col).isNull(), F.lit("null_text")).otherwise(
        F.concat_ws(
            ",",
            F.when(nw < min_words, F.lit("too_short")),
            F.when(nw > max_words, F.lit("too_long")),
            F.when(
                (mwl < min_mean_word_len) | (mwl > max_mean_word_len),
                F.lit("word_len"),
            ),
            F.when(twf > max_top_word_frac, F.lit("repetitive")),
            F.when(ttr < min_type_token_ratio, F.lit("low_diversity")),
            F.when(stop < min_stopword_hits, F.lit("no_stopwords")),
        )
    )


def quality_filter_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_top_word_frac: float = 0.30,
    min_type_token_ratio: float = 0.30,
    min_stopword_hits: int = 1,
) -> DataFrame:
    """Shuffle-free twin of :func:`quality_filter`: identical rules and
    output, but every signal is a per-row Catalyst expression — the
    top-word count is the longest equal-run in the *sorted* token array
    (one linear ``aggregate`` HOF after an O(n log n) per-row sort),
    and the distinct-token count is ``size(array_distinct(...))``.

    ZERO shuffles and zero state: at 100 TB this is a pure scan, and —
    unlike the explode+groupBy formulation — it is legal on an
    unbounded stream (see ``streaming.events.stream_quality_gate``).
    Prefer this variant when only the verdict is needed; prefer
    :func:`repetition_signals` when the per-gram counts themselves are
    the product.
    """
    reasons = quality_reject_reasons(
        text_col, min_words, max_words, min_mean_word_len,
        max_mean_word_len, max_top_word_frac, min_type_token_ratio,
        min_stopword_hits,
    )
    return df.select(
        F.col(id_col),
        n_words_nullsafe(text_col).cast("long").alias("n_words"),
        reasons.alias("reject_reasons"),
        (reasons == "").alias("keep"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``ngram_n``-gram with an evaluation set (the standard
    train/test-overlap check run before pretraining).

    Scale shape: both sides explode to distinct md5'd shingles, the
    benchmark side (eval sets are small) broadcasts, and a semi-join
    marks contaminated docs — corpus-side cost is one scan + one
    explode, never a doc×doc comparison. Returns the corpus ids with
    ``contaminated`` + the count of distinct overlapping shingles.
    """
    from methyl_data_pipeline_spark.ext.dedup import shingles

    def shingled(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(text_col, ngram_n))).alias("_s"),
        ).select(id_col, md5_long(F.col("_s")).alias(out))

    bench_sh = shingled(benchmark, "_h").select("_h").distinct()
    corpus_sh = shingled(corpus, "_h")
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.countDistinct("_h").alias("n_overlap_shingles"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap_shingles", F.lit(0)).alias("n_overlap_shingles"),
            (F.coalesce("n_overlap_shingles", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Language-model quality proxy: per-document mean token log
    probability under the corpus's OWN unigram model (additively
    smoothed). The cheap stand-in for the KenLM-perplexity filter of
    CCNet-style curation — documents whose tokens are corpus-typical
    score high; gibberish, boilerplate, and wrong-language text score
    low. Self-supervised: no external model artifact to ship.

    Two passes over the exploded tokens, all JVM-side:

    1. model fit: token counts (one shuffle on term) + a 2-cell total
       aggregate; log p(t) = ln((count + s) / (total + s·vocab)).
    2. scoring: re-join the exploded tokens to the model on term, then
       a per-doc mean (shuffle on doc).

    ``broadcast_model=True`` (default) broadcasts the vocab-sized model
    table — right for natural-language vocabularies (10⁵-10⁶ terms).
    At open-vocab web scale (10⁸ shingles), flip it off and the score
    join becomes a term-keyed shuffle that AQE handles.
    """
    from methyl_data_pipeline_spark import cache

    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    # persisted: vocab-sized, but the totals branch and the model join
    # would otherwise each re-run the token-stream explode + aggregate
    counts = cache.track(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.log(
            (F.col("cnt") + F.lit(smoothing))
            / (F.col("total") + F.lit(smoothing) * F.col("vocab"))
        ).alias("logp"),
    )
    if broadcast_model:
        model = F.broadcast(model)
    return (
        toks.join(model, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("logp").alias("mean_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
    interp: float = 0.7,
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated-bigram LM quality score (VERDICT r12 #8 — CCNet's
    actual LM filter is an n-gram LM, Wenzek et al. 2020; this is the
    Jelinek-Mercer-interpolated bigram upgrade of the
    :func:`unigram_logprob` proxy): per-document mean token log
    probability under ``p(w_i | w_{i-1}) = interp * c(prev, w_i) /
    c(prev, .) + (1 - interp) * p_uni(w_i)`` with the additively
    smoothed unigram as both the interpolation floor and the
    first-token model. Self-supervised (fit on the corpus's own
    counts); gibberish and wrong-language text score low, and unlike
    the unigram proxy, scrambled-but-common-word text (the failure
    mode Gopher's repetition signals target) scores low TOO — word
    ORDER now matters.

    Plan shape, all JVM-side: the (prev, cur) token stream is built
    MAP-SIDE from the words array (shifted-self zip — no positional
    self-join), persisted (three consumers: unigram fit, bigram fit,
    scoring). Model fits are one shuffle each on term / (prev, cur) /
    prev — all vocabulary-bounded. Scoring re-joins the stream to the
    three model tables (broadcast for natural-language vocabularies;
    ``broadcast_model=False`` flips to AQE shuffle joins at open-vocab
    web scale) and ends in the per-doc mean. Every scored bigram was
    seen in the fit (self-scoring), so the ML bigram term is never
    0/0; interpolation still smooths rare-context estimates.

    Output: ``(id_col, n_tokens, mean_logprob)`` per non-NULL-text
    doc. Tokenization follows :func:`words` (the ``unigram_logprob``
    contract, including the empty-string token of whitespace-only
    docs). Growth probe (``tools/scale_probe.py --lm-growth``,
    scrambled replicas = worst-case near-unique bigram vocabulary,
    medians of 3, local[32]): 5k docs 1.12 s -> 50k docs 1.64 s —
    **1.5x wall at 10x corpus**.
    """
    from methyl_data_pipeline_spark import cache

    w = words(text_col)
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), w.alias("_w")
    )
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(
            F.col("_w"), 1, F.greatest(F.size("_w") - 1, F.lit(0))
        ),
    )
    stream = cache.track(
        base.select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(prevs.alias("prev"), F.col("_w").alias("cur"))
            ).alias("_pc"),
        ).select(
            id_col,
            F.col("_pc.prev").alias("prev"),
            F.col("_pc.cur").alias("cur"),
        )
    )
    uni = stream.groupBy("cur").agg(F.count(F.lit(1)).alias("_cu"))
    totals = uni.agg(
        F.sum("_cu").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    uni_p = uni.crossJoin(F.broadcast(totals)).select(
        "cur",
        (
            (F.col("_cu") + F.lit(smoothing))
            / (F.col("_total") + F.lit(smoothing) * F.col("_vocab"))
        ).alias("_pu"),
    )
    big = (
        stream.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    ctx = big.groupBy("prev").agg(F.sum("_cb").alias("_cc"))
    if broadcast_model:
        uni_p, big, ctx = F.broadcast(uni_p), F.broadcast(big), F.broadcast(ctx)
    lam = F.lit(float(interp))
    scored = (
        stream.join(uni_p, "cur")
        .join(big, ["prev", "cur"], "left")
        .join(ctx, "prev", "left")
        .select(
            id_col,
            F.log(
                F.when(
                    F.col("prev").isNull(),
                    F.col("_pu"),
                ).otherwise(
                    lam * F.col("_cb") / F.col("_cc")
                    + (F.lit(1.0) - lam) * F.col("_pu")
                )
            ).alias("_logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("_logp").alias("mean_logprob"),
    )


def clean_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Boilerplate scrub for web-crawl ingest: strip HTML/XML tags,
    remove URLs, collapse whitespace runs, trim — with per-doc removal
    counts (``n_tags``, ``n_urls``) for curation telemetry. A pure
    scan-side ``regexp_count`` / ``regexp_replace`` chain: zero
    shuffles, whole-stage-codegen, same cost model as ``pii_redact``.
    """
    t = F.col(text_col)
    tag_re = r"<[^>]*>"
    url_re = r"https?://[^\s<>]+"
    stripped = F.regexp_replace(
        F.regexp_replace(t, tag_re, " "), url_re, " "
    )
    cleaned = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(tag_re)).alias("n_tags"),
        F.regexp_count(t, F.lit(url_re)).alias("n_urls"),
        cleaned.alias("text_clean"),
    )


# Character-trigram profiles: the highest-frequency trigrams of each
# language (space-padded word boundaries included) — the classic
# Cavnar-Trenkle n-gram text-categorization signal, small enough to
# inline as literals in both engines.
TRIGRAM_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", "ng ",
           " of", "of ", "ion", "tio", " to", "to ", "er ", " in",
           "in ", "ent", " is", "is "],
    "de": ["er ", "en ", " de", "der", "ie ", " di", "die", "ch ",
           "sch", "ein", "ne ", "und", " un", "cht", "ich", " ei",
           "ung", "gen", " ge", "ten"],
    "fr": [" de", "de ", "es ", "le ", " le", "ent", "nt ", " la",
           "la ", "et ", " et", "ion", "on ", "que", " qu", "ue ",
           "re ", " re", "ais", "eur"],
}


def language_id_ngram(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character-trigram language ID (Cavnar-Trenkle n-gram heuristic):
    score per language = how many of the text's overlapping character
    trigrams (with multiplicity, over the space-padded lowercased text)
    appear in that language's top-trigram profile; argmax wins,
    ``und`` when nothing matches. Deterministic tie-break by profile
    order.

    Pure Catalyst higher-order functions (sequence → transform →
    filter), zero shuffles, zero UDFs — and byte-for-byte reproducible
    in SQL, unlike model-based language ID. Complements the
    stopword-argmax :func:`language_id` (trigram profiles survive
    texts with few function words)."""
    # coalesce: F.concat is NULL if ANY arg is NULL, which would turn
    # a NULL doc's score into size(NULL)=-1 junk; NULL text instead
    # normalizes to "  " -> zero grams -> ('und', 0) on both engines.
    norm = F.concat(
        F.lit(" "),
        F.coalesce(normalize_label(F.col(text_col)), F.lit("")),
        F.lit(" "),
    )
    out = df.withColumn("_t", norm)
    # Explicit empty-array guard: Spark's sequence(1, 0) yields the
    # DESCENDING [1, 0] (two bogus '  ' grams for empty/whitespace-only
    # text) where SQL generate_series(1, 0) is empty — mirror the
    # empty-series semantics so the engines can't desynchronize.
    grams = F.expr(
        "CASE WHEN length(_t) < 3 THEN CAST(array() AS array<string>) "
        "ELSE transform(sequence(1, length(_t) - 2), i -> substring(_t, i, 3)) END"
    )
    out = out.withColumn("_grams", grams)

    def score(profile: list[str]):
        arr = F.array(*[F.lit(g) for g in sorted(set(profile))])
        return F.size(F.filter(F.col("_grams"), lambda g: F.array_contains(arr, g)))

    langs = list(TRIGRAM_PROFILES)
    out = out.select(
        "*", *[score(p).alias(f"_s_{lg}") for lg, p in TRIGRAM_PROFILES.items()]
    )
    best = F.greatest(*[F.col(f"_s_{lg}") for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties
        expr = F.when((F.col(f"_s_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return (
        out.withColumn("lang_pred_ngram", expr)
        .withColumn("ngram_hits", best.cast("long"))
        .drop("_t", "_grams", *[f"_s_{lg}" for lg in langs])
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str | None = None,
    smoothing: float = 0.5,
    model: str = "unigram",
) -> DataFrame:
    """CCNet-style head/middle/tail partitioning: rank documents by
    an LM quality score and split each partition (typically the
    language) into rank terciles — ``head`` = most corpus-typical
    (lowest perplexity), ``tail`` = least. The bucket is what CCNet
    feeds downstream sampling (keep head+middle, drop or downweight
    tail). ``model`` picks the scorer: ``"unigram"``
    (:func:`unigram_logprob`, the original proxy) or ``"bigram"``
    (:func:`bigram_logprob`, r13 — closer to CCNet's actual KenLM
    n-gram filter; word-order-scrambled boilerplate now ranks into
    the tail where the unigram scorer could not see it).

    Determinism: the score is rounded to 6 dp BEFORE ranking so
    mathematically-equal documents are exactly tied in every engine,
    and ties break on ``id_col`` — rank boundaries cannot drift with
    summation order. One extra window pass over the scored docs
    (doc-count sized, not token sized).
    """
    from pyspark.sql import Window

    if model == "unigram":
        scored = unigram_logprob(df, text_col, id_col, smoothing)
    elif model == "bigram":
        scored = bigram_logprob(df, text_col, id_col, smoothing)
    else:
        raise ValueError(
            f"perplexity_buckets: unknown model {model!r} "
            "(expected 'unigram' or 'bigram')"
        )
    if part_col is not None:
        scored = scored.join(
            F.broadcast(df.select(id_col, part_col).distinct()), id_col
        )
        w = Window.partitionBy(part_col)
    else:
        w = Window.partitionBy()
    score = F.round(F.col("mean_logprob") + F.lit(1e-9), 6) + F.lit(0.0)
    scored = scored.withColumn("score", score)
    wr = w.orderBy(F.col("score").desc(), F.col(id_col).asc())
    n = F.count(F.lit(1)).over(w)
    rn = F.row_number().over(wr)
    bucket = (
        F.when(rn <= F.floor(n / 3.0), "head")
        .when(rn <= F.floor(2.0 * n / 3.0), "middle")
        .otherwise("tail")
    )
    return scored.withColumn("bucket", bucket).drop("mean_logprob")


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 200,
) -> DataFrame:
    """Corpus vocabulary induction with cumulative coverage: the
    ``top_k`` words by occurrence count, each with its running
    cumulative count against the corpus token total — the "what vocab
    size covers X% of tokens" curve that sizes a tokenizer vocabulary
    (the word-level step before BPE merges).

    One explode + word-keyed aggregate; map-side combining collapses
    the Zipf head, so the shuffle carries the (bounded-cardinality)
    vocabulary, not the token stream. Top-k is a distributed
    take-ordered; the rank/cumsum window runs on the ``top_k``-row
    frame only. All output channels are integers (counts, not
    shares), so the result is hash-stable across engines — divide
    ``cum_occ / total_tokens`` client-side for the coverage fraction.
    """
    from pyspark.sql import Window

    from methyl_data_pipeline_spark import cache

    wc = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(words(text_col)).alias("word")
    )
    # persisted: vocabulary-sized, but the total and the top-k branch
    # would otherwise each re-run the token-stream explode + aggregate
    counts = cache.track(wc.groupBy("word").agg(F.count(F.lit(1)).alias("n_occ")))
    total = counts.agg(F.sum("n_occ").cast("long").alias("total_tokens"))
    top = counts.orderBy(F.col("n_occ").desc(), F.col("word").asc()).limit(top_k)
    w = Window.orderBy(F.col("n_occ").desc(), F.col("word").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("cum_occ", F.sum("n_occ").over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "rank", "word", F.col("n_occ").cast("long").alias("n_occ"),
            "cum_occ", "total_tokens",
        )
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    ngram_n: int = 3,
    min_share: float = 0.002,
    prefilter: bool = True,
) -> DataFrame:
    """Corpus-level hot n-grams: word ``ngram_n``-grams whose share of
    ALL n-gram occurrences is at least ``min_share`` — the boilerplate
    detector (navigation strings, license headers, templated sentences)
    that corpus curation runs BEFORE dedup, complementing the per-doc
    ``repetition_signals``.

    The naive exact plan shuffles the full exploded gram stream — and
    since most grams are near-unique, map-side partial aggregation
    collapses almost nothing, so at corpus scale the shuffle IS the
    gram stream. ``prefilter=True`` (default) first runs the one-pass
    ``freqItems`` sketch (no shuffle, bounded memory), whose guarantee
    is a SUPERSET of every gram with share > ``min_share``; the exact
    count pass then only shuffles occurrences of the ≤1/min_share
    candidates. The result is IDENTICAL to the naive plan (the sketch
    cannot miss a true hitter; false candidates die on the exact share
    filter) — only the shuffle shrinks from the gram stream to the hot
    tail. The denominator still counts every gram (a 1-row map-side
    aggregate). Returns (gram, n_occurrences, share), share ≥
    min_share, descending.
    """
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.ext.dedup import shingles, shingles_from_words

    # NULL texts produce no grams on the explode path (explode of a
    # null array emits nothing), so they must contribute 0 to the
    # denominator too — without this filter the word-count arithmetic
    # below sees F.size(NULL) = -1 (non-ANSI legacy sizeOfNull) and
    # greatest(-1 - (n-1), 1) would count 1 phantom gram per null doc.
    nn = df.filter(F.col(text_col).isNotNull())
    # The sketch guarantee is STRICT (share > support) while the exact
    # filter below is >=, so a gram sitting exactly on the threshold
    # may legally vanish from the sketch — run it at 0.9x the target
    # share so every >= hitter is strictly above the sketch support.
    # Spark's freqItems floor is support >= 1e-4; below that the
    # margined sketch cannot express the guarantee, so fall back to
    # the naive exact shuffle rather than silently lose true hitters.
    support = min_share * 0.9
    if prefilter and support >= 1e-4:
        # materialize the normalized word arrays ONCE: the sketch
        # pass, the exact candidate count, and the denominator all
        # read this projection — without the persist each re-runs the
        # regex/split chain, the dominant CPU cost of the plan
        ws_df = cache.track(
            nn.select(
                F.split(normalize_label(F.col(text_col)), " ").alias("_ws")
            )
        )
        grams = ws_df.select(
            F.explode(shingles_from_words(F.col("_ws"), ngram_n)).alias("gram")
        )
        cands = grams.stat.freqItems(["gram"], support=support).collect()[0][0]
        # ONE aggregation yields both the exact candidate counts AND
        # the denominator: non-candidate grams collapse into a single
        # NULL-key group (map-side combine reduces them to one row per
        # map task), so the shuffle stays bounded by the candidate set
        # while the full pass count drops to two (sketch + this agg)
        is_cand = F.col("gram").isin(list(cands))
        agg = (
            grams.groupBy(
                is_cand.alias("_is_cand"),
                F.when(is_cand, F.col("gram")).alias("gram"),
            )
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
        )
        counts = agg.filter(F.col("_is_cand")).drop("_is_cand")
        total = agg.agg(F.sum("n_occurrences").alias("_total"))
    else:
        grams = nn.select(F.explode(shingles(text_col, ngram_n)).alias("gram"))
        counts = grams.groupBy("gram").agg(
            F.count(F.lit(1)).alias("n_occurrences")
        )
        # naive path: the denominator folds out of the counts frame —
        # no extra scan at all
        total = counts.agg(F.sum("n_occurrences").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n_occurrences") / F.col("_total"))
        .filter(F.col("share") >= min_share)
        .drop("_total")
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
    )


def heavy_hitters_approx(
    df: DataFrame,
    text_col: str = "text",
    ngram_n: int = 3,
    min_share: float = 0.002,
) -> list[str]:
    """Sketch path of :func:`heavy_hitters` for vocabularies too large
    to aggregate exactly: Spark's ``DataFrame.stat.freqItems``
    (Karp–Schenker–Papadimitriou one-pass frequent-items), which
    returns a SUPERSET of every gram with share > ``min_share`` in a
    single scan with bounded memory — no shuffle keyed on the gram at
    all. Filter the (small) candidate list through the exact counter
    to drop sketch false positives."""
    from methyl_data_pipeline_spark.ext.dedup import shingles

    grams = df.select(F.explode(shingles(text_col, ngram_n)).alias("gram"))
    row = grams.stat.freqItems(["gram"], support=min_share).collect()[0]
    return sorted(row[0])


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-shard corpus health dashboard — the one-pass operational
    report a curation team tracks daily (the documents-table analogue
    of ``operators.qc.health_report``): doc/token volume, exact-dup
    rate (distinct normalized bodies vs docs), and the dominant
    language with its share.

    Plan: ONE scan computing tokens + the md5 body fingerprint, then
    two shard-keyed aggregates (counts/distincts and the language
    mode via a window over the tiny (shard, lang) frame). No joins
    against the fact table; everything after the scan is
    dimension-sized.
    """
    # NULL-safe token count: F.size(NULL array) = -1 under legacy
    # sizeOfNull and would silently skew SUM(total_tokens), while SQL
    # engines propagate NULL and skip the row in the SUM.
    base = df.select(
        F.col(shard_col),
        F.col(lang_col),
        n_words_nullsafe(F.col(text_col)).cast("long").alias("_toks"),
        md5_long(
            normalize_label(F.col(text_col))
        ).alias("_fp"),
    )
    per_shard = base.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").alias("total_tokens"),
        F.countDistinct("_fp").alias("n_unique_bodies"),
        F.countDistinct(lang_col).alias("n_langs"),
    )
    lang_counts = base.groupBy(shard_col, lang_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # asc_nulls_last: Spark ASC is NULLS FIRST while ANSI-SQL engines
    # default to NULLS LAST for ASC — a NULL-lang group tying the modal
    # count must elect the same top_lang on both engines.
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_n").desc(), F.col(lang_col).asc_nulls_last()
    )
    top_lang = (
        lang_counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            shard_col,
            F.col(lang_col).alias("top_lang"),
            F.col("_n").alias("top_lang_docs"),
        )
    )
    return per_shard.join(F.broadcast(top_lang), shard_col).select(
        shard_col,
        "n_docs",
        "total_tokens",
        "n_unique_bodies",
        (1.0 - F.col("n_unique_bodies") / F.col("n_docs")).alias("dup_rate"),
        "n_langs",
        "top_lang",
        (F.col("top_lang_docs") / F.col("n_docs")).alias("top_lang_share"),
    )


def bm25_rank(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    score_round: int = 6,
    materialize_index: bool = False,
) -> DataFrame:
    """BM25 ranked retrieval: for each query, the ``top_k`` corpus
    documents by the Okapi BM25 score (Robertson/Sparck Jones; the
    Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant, which is
    always positive) — the standard relevance scorer for retrieval/
    RAG corpus curation, complementing :func:`tfidf_top_terms` (which
    ranks terms within a doc; this ranks docs against queries).

    Plan shape at 100 TB — an inverted-index join, never a cartesian:
    one explode + (doc, term) groupBy builds the postings; its three
    consumers re-run that build lazily (Catalyst shares no subplan
    across branches) unless ``materialize_index=True`` persists the
    index once — see the measurement note at the build site. Query
    terms and their document frequencies are query-vocabulary-sized
    and BROADCAST, so scoring touches only postings of query terms;
    the final (query, doc) partial-sum agg and per-query top-k window
    see candidate rows only.

    Scores are rounded to ``score_round`` dp BEFORE ranking so rank
    order (and therefore the emitted rows) is reproducible across
    engines — a 1-ulp summation difference cannot flip a
    ``row_number`` tie. Ties break by ascending doc id.
    """
    w = words(F.col(text_col))
    # '' is the split artifact of empty/blank text, not a term — an
    # empty query must match nothing, and empty docs hold no postings
    postings = (
        corpus.select(F.col(id_col), F.explode(w).alias("_t"))
        .filter(F.col("_t") != "")
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # The postings frame has three consumers (doc lengths, query-term
    # document frequencies, the candidate join); lazily each re-runs
    # the fact explode + shuffle. ``materialize_index=True`` persists
    # the inverted index so the fact passes once — measured 2x SLOWER
    # at sf0.1 (3.0s vs 1.6s: the index write dominates a small
    # corpus) but the winning shape once the corpus dwarfs the index
    # build, or when many query batches reuse one index. Per-call-site
    # measurement over assumption (the bloom_test lesson).
    if materialize_index:
        from methyl_data_pipeline_spark import cache

        postings = cache.track(postings)
    doclen = postings.groupBy(id_col).agg(F.sum("_tf").alias("_dl"))
    corpus_stats = doclen.agg(
        F.count(F.lit(1)).alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )

    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.array_distinct(words(F.col(query_text_col)))
            ).alias("_t"),
        )
        .filter(F.col("_t") != "")
        .distinct()
    )
    # document frequency ONLY for query-vocabulary terms (bounded):
    # semi-join the postings down first, then count docs per term
    df_q = (
        postings.join(
            F.broadcast(qterms.select("_t").distinct()), "_t", "left_semi"
        )
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_df"))
    )

    # doclen is CORPUS-sized — never broadcast it (VERDICT r6 #4: fine
    # at sf0.1, an OOM at 100 TB). The candidate set is already bounded
    # by query-vocab postings after the qterms broadcast join, so a
    # plain shuffle join on id_col is the scale-safe shape; AQE shrinks
    # it further when the candidates are small.
    cand = (
        postings.join(F.broadcast(qterms), "_t")
        .join(F.broadcast(df_q), "_t")
        .crossJoin(F.broadcast(corpus_stats))
        .join(doclen, id_col)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tf_norm = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf")
        + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
    )
    scored = cand.select(
        query_id_col, id_col, (idf * tf_norm).alias("_s")
    ).groupBy(query_id_col, id_col).agg(
        (F.round(F.sum("_s") + F.lit(1e-9), score_round) + F.lit(0.0)).alias(
            "score"
        )
    )
    rw = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= top_k)
        .select(query_id_col, "rank", id_col, "score")
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Quality-filter calibration curve: for every distinct score
    value taken as the cut ("keep docs with score >= t"), the kept
    count and the true/false-positive tallies against a gold label —
    the precision/recall sweep that picks a curation threshold at
    corpus scale (the operator behind "what cutoff keeps 90% of good
    docs?").

    Scale shape: ONE distributed aggregate per score value (map-side
    combining collapses the corpus to score-cardinality rows), then
    the cumulative window runs on that tiny per-score frame only — no
    global sort of the corpus, the same two-level trick as
    ``vocab_coverage``. Scores are assumed discretized (integers or
    buckets — bucketize continuous scores first); the per-score frame
    is what bounds the single-partition window.

    All output channels are integers (counts), hash-stable across
    engines: ``threshold, n_kept, n_true_pos, n_false_pos,
    n_pos_total`` — divide client-side for precision
    (``n_true_pos / n_kept``) and recall (``n_true_pos /
    n_pos_total``). NULL scores and NULL labels are dropped
    (unrankable / unevaluable rows cannot enter the curve). The label
    is normalized through BOOLEAN (any truthy value counts as exactly
    1): summing a raw integer label would silently inflate
    ``n_true_pos`` — and drive ``n_false_pos`` negative — the moment
    someone passes a 1-5 quality grade as the gold column. The label
    column must be boolean or numeric, enforced at build time: a
    STRING label like '3' would either crash the whole sweep under
    ANSI (string->boolean cast) or silently NULL out and undercount
    with ANSI off — an explicit error beats both.
    """
    from pyspark.sql import Window

    label_type = dict(df.dtypes).get(label_col, "")
    if not (
        label_type == "boolean"
        or label_type in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or label_type.startswith("decimal")
    ):
        raise TypeError(
            f"threshold_sweep label_col must be boolean or numeric, "
            f"got {label_type!r}"
        )
    labeled = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("threshold"),
        F.col(label_col).cast("boolean").cast("long").alias("_pos"),
    )
    per_score = labeled.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_pos").cast("long").alias("_np"),
    )
    # cumulative over the per-score frame (score-cardinality rows);
    # the unpartitioned windows are deliberate — the frame is tiny
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_score.select(
        "threshold",
        F.sum("_n").over(w).alias("n_kept"),
        F.sum("_np").over(w).alias("n_true_pos"),
        (F.sum("_n").over(w) - F.sum("_np").over(w)).alias("n_false_pos"),
        F.sum("_np").over(w_all).alias("n_pos_total"),
    )


def _dsir_grams(text_col: str) -> Column:
    """Hashed-n-gram feature stream for DSIR: unigrams + word bigrams
    of the whitespace-lowercased tokens ('' split artifacts dropped).
    The gram list is bound as a lambda variable (single-element
    transform) so the split runs once per row, not once per produced
    element — the HOF-CSE rule every gram operator here follows."""
    return F.transform(
        F.array(F.filter(words(F.col(text_col)), lambda x: x != "")),
        lambda w: F.concat(
            w,
            F.zip_with(
                F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
                F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ),
    )[0]


def _check_features_frame(features: DataFrame, caller: str) -> DataFrame:
    """Loud-failure guard for the shared ``features=`` hook (ADVICE
    r14): the frame is joined blindly on ``_id``/``_b``, so a frame
    with the wrong shape (or a raw docs frame passed by mistake) would
    silently produce a diverged fit/score. Validates the column
    contract only — the bucket count and source df cannot be checked
    cheaply and remain documented caller obligations."""
    if set(features.columns) != {"_id", "_b", "_c"}:
        raise ValueError(
            f"{caller}: features= must be a _doc_bucket_counts frame "
            f"with columns {{_id, _b, _c}}, got {features.columns}"
        )
    return features


def _doc_bucket_counts(
    df: DataFrame, text_col: str, id_col: str, buckets: int
) -> DataFrame:
    """Per-doc hashed-feature bucket counts ``(_id, _b, _c)`` over
    unigram+bigram grams (``_dsir_grams`` + :func:`md5_long` pmod) —
    the shared featurizer of :func:`dsir_weights` and
    :func:`quality_score_linear`; external SQL computes identical
    buckets."""
    # NO _spread here, on measurement (r14 interleaved A/B, 3 runs
    # each arm, same session): repartitioning before the gram explode
    # was a wash at sf0.1 (lang_id_nb 5.21 vs 5.31 s, classifier_eval
    # 4.23 vs 3.98 s) — the featurizer's map-side partial agg bounds
    # the serial scan stage's output, and at cluster scale the
    # repartition would add a corpus-sized shuffle of raw text.
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), _dsir_grams(text_col).alias("_g")
    )
    return (
        base.select("_id", F.explode("_g").alias("_gram"))
        .select(
            "_id",
            F.pmod(md5_long(F.col("_gram")), F.lit(buckets)).alias("_b"),
        )
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def hashed_weight_table(
    spark, buckets: int, salt: str = "qw", grid: int = 1000
) -> DataFrame:
    """Deterministic md5-derived weight table ``(bucket, weight)`` for
    :func:`quality_score_linear` smoke/certificate use — weight(b) =
    (md5_long(salt|b) % (2*grid + 1) - grid) / grid, a grid-aligned
    double in [-1, 1] both engines derive identically. Real
    deployments broadcast an externally-trained table instead."""
    b = F.col("id").cast("int").alias("bucket")
    h = md5_long(F.concat(F.lit(salt + "|"), F.col("id").cast("string")))
    w = ((h % F.lit(2 * grid + 1)) - F.lit(grid)) / F.lit(float(grid))
    return spark.range(buckets).select(b, w.alias("weight"))


def train_quality_weights(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: int = 1,
    features: DataFrame | None = None,
) -> DataFrame:
    """In-engine training for :func:`quality_score_linear`'s weight
    table (VERDICT r12 #4 — closes the loop the md5
    ``hashed_weight_table`` smoke-stands in for): CLOSED-FORM
    Naive-Bayes log-odds weights (the NBSVM family's NB feature
    weights, Wang & Manning 2012, "Baselines and Bigrams") over the
    SAME hashed unigram+bigram bucket features the scorer uses
    (``_doc_bucket_counts``), plus the class-prior bias:

    - ``w_b = round(ln((c1_b + a)/(T1 + aB)) - ln((c0_b + a)/(T0 + aB)), 6)``
      — per-bucket smoothed log-likelihood ratio of the positive vs
      negative class (``c*_b`` = gram occurrences of bucket b in the
      class, ``T*`` = class totals, ``B`` = bucket count, ``a`` =
      add-alpha smoothing);
    - ``bias = round(ln(N1) - ln(N0), 6)`` — the class prior, emitted
      as the ``bucket = -1`` row (md5 buckets are non-negative, so the
      row rides the same table through the scoring join untouched).
      NOTE the pooling geometry: the exact NB posterior log-odds is
      the SUM ``bias + sum_b c_b w_b``, while
      :func:`quality_score_linear` MEAN-pools (``sum c w / n``) — that
      rescales the evidence by 1/n but would leave a constant prior
      at full strength, drowning it (measured: with the prior folded
      in, every sf0.01 doc scored below 0). For the mean-pooled
      scorer use ``bias=0`` and cutoff 0: the mean log-likelihood
      ratio is positive exactly when the doc's grams on average favor
      the positive class (measured P/R below); sum-pooled NB callers
      add the bias row themselves.

    Why closed-form and not iterative logistic regression — MEASURED
    (r13): the gradient-descent LR this function first shipped as
    (cubic-sigmoid surrogate, integer-gridded updates, the
    ``quantized_lloyd`` discipline) is degenerate within any
    oracle-replayable iteration budget — at sf0.01 every (lr, iters)
    tried in {4..256} x {2,3} scored all-pass or all-fail at cutoff 0
    (F1 0.0/0.607 vs md5 0.598): the shared-bucket bias component
    dominates the per-gram gradient and flips the whole corpus across
    the cutoff each step, while per-bucket discrimination needs ~50+
    un-unrollable iterations. The NB fit needs ONE pass, separates
    the same features cleanly — measured at sf0.01 (lang=='en'
    pseudo-gold, cutoff 0): trained P .798 / R .798 / F1 .798 vs the
    md5 table's P .440 / R .931 / F1 .598 (md5 at cutoff 0 passes
    461/500 docs — a near-pass-all gate) — and every input to each
    ``ln`` is an exact integer ratio, so the 6-dp rounded outputs are
    engine-identical (the ``unigram_logprob`` cross-engine ln
    precedent).

    Plan shape (fully lazy — NO driver action, unlike the BPE-style
    iterative trainers): one (bucket x class) conditional aggregate
    over the feature rows (ONE bucket-keyed shuffle of a
    buckets-bounded frame), a 1-row totals aggregate broadcast back,
    map-side log-odds. At 100 TB the only corpus-sized work is the
    feature explode feeding the bucket aggregate's map-side partials.
    Labels: NULL-label docs are excluded; ``label_col`` is cast to
    int (0/1). A single-class input does NOT raise (the fit is fully
    lazy — no eager count runs): ``ln(0)`` surfaces as a NULL
    ``bucket = -1`` bias row and one-sided weights that pass
    everything at cutoff 0. Callers wanting a hard guard should
    validate class counts eagerly before calling (ADVICE r13).

    ``features`` (optional, guide §2.4): a precomputed
    ``_doc_bucket_counts(df, text_col, id_col, buckets)`` frame —
    typically one the caller ``cache.track``'d so trainer AND scorer
    share ONE corpus featurize instead of each re-running the gram
    explode. The labels inner join below applies the label filter, so
    passing the all-docs featurize is exact. Must come from the same
    ``df``/``text_col``/``id_col``/``buckets`` or the fit silently
    diverges.

    Returns a ``(bucket, weight)`` DataFrame matching
    :func:`hashed_weight_table`'s contract (plus the bucket = -1
    bias row). Buckets unseen in EITHER class still get a row (the
    smoothing defines their prior log-odds 0 only when classes are
    balanced in totals); buckets absent from the corpus entirely are
    absent from the table (score 0 via the scorer's OOV rule).
    """
    if buckets < 2:
        raise ValueError("train_quality_weights: buckets must be >= 2")
    labels = (
        df.filter(F.col(text_col).isNotNull())
        .filter(F.col(label_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(label_col).cast("int").alias("_y"),
        )
    )
    from methyl_data_pipeline_spark import cache

    if features is None:
        features = _doc_bucket_counts(df, text_col, id_col, buckets)
    feats = features.join(labels, "_id")
    # persisted: bounded by ``buckets`` (<= ~10^3 rows) and consumed by
    # THREE branches (weights, gram totals, via totals the bias row) —
    # without it the lazy DAG recomputes the corpus-sized gram explode
    # per branch (measured r13 on the 10x replica via
    # tools/scale_probe.py --lm-growth: 18.3 s three-pass -> 1.84 s
    # single-pass, i.e. 1.5x wall at 10x corpus)
    per_bucket = cache.track(
        feats.groupBy("_b").agg(
            F.sum(F.when(F.col("_y") == 1, F.col("_c")).otherwise(0)).alias(
                "_c1"
            ),
            F.sum(F.when(F.col("_y") == 0, F.col("_c")).otherwise(0)).alias(
                "_c0"
            ),
        )
    )
    # gram totals fold from the persisted bucket table (1024-row agg);
    # the PRIOR's doc counts come from the labels frame alone — the
    # prior therefore counts labeled non-NULL-text docs (including
    # zero-gram docs), a deliberate contract: a doc with no grams
    # still carries its class label as prior evidence
    tot = per_bucket.agg(
        F.sum("_c1").alias("_t1"), F.sum("_c0").alias("_t0")
    )
    nd = df.filter(F.col(text_col).isNotNull()).filter(
        F.col(label_col).isNotNull()
    ).agg(
        F.sum(
            F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0)
        ).alias("_n1"),
        F.sum(
            F.when(F.col(label_col).cast("int") == 0, 1).otherwise(0)
        ).alias("_n0"),
    )
    # Persisted: the 1-row totals frame feeds BOTH output branches
    # (per-bucket weights and the bias row) and ``nd`` inside it is a
    # full corpus scan — uncached, each branch of the union re-runs
    # that scan (no subtree CSE across union branches; guide §2.4).
    totals = cache.track(tot.crossJoin(nd))
    a, b = F.lit(float(alpha)), F.lit(float(alpha * buckets))
    w = F.round(
        F.log((F.col("_c1") + a) / (F.col("_t1") + b))
        - F.log((F.col("_c0") + a) / (F.col("_t0") + b))
        + F.lit(1e-9),
        6,
    ) + F.lit(0.0)
    bias = F.round(
        F.log(F.col("_n1").cast("double"))
        - F.log(F.col("_n0").cast("double"))
        + F.lit(1e-9),
        6,
    ) + F.lit(0.0)
    weights = per_bucket.crossJoin(F.broadcast(totals)).select(
        F.col("_b").cast("int").alias("bucket"), w.alias("weight")
    )
    bias_row = totals.select(
        F.lit(-1).alias("bucket"), bias.alias("weight")
    )
    return weights.unionByName(bias_row)


def train_lang_weights(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: int = 1,
    features: DataFrame | None = None,
) -> DataFrame:
    """Multi-class Naive-Bayes head over the shared hashed
    unigram+bigram bucket features (VERDICT r13 "what's missing" #2 —
    the binary :func:`train_quality_weights` generalized to a lang-id
    style classifier): per class ``l`` and bucket ``b``, the smoothed
    log-likelihood ``w_lb = ln((c_lb + a)/(T_l + aB))``, stored
    SPARSELY as ``delta_lb = w6_lb - floor6_l`` against the per-class
    unseen-bucket floor ``floor_l = ln(a/(T_l + aB))`` — so scoring
    never needs a dense (class x bucket) table:
    ``score(d, l) = prior_l + n_grams(d) * floor_l +
    sum_matched c_b * delta_lb`` is EXACTLY the NB posterior
    log-probability (up to the class-independent evidence term),
    including globally-unseen buckets (they contribute floor_l per
    gram, which the ``n_grams * floor_l`` term covers).

    All ln inputs are exact integer ratios and every stored value is
    6-dp pre-rounded (the ``unigram_logprob`` cross-engine ln
    precedent), so a SQL oracle replays the fit bit-for-bit.

    Plan shape: one (class x bucket)-keyed aggregate of the gram
    stream (map-side partials; output <= n_classes * buckets rows),
    per-class totals folded from it and broadcast back — corpus-sized
    work only in the gram explode, same 100 TB shape as the binary
    trainer.

    Returns one frame, two row kinds:
    - ``bucket >= 0``: ``(lang, bucket, delta)`` sparse trained rows
      (``floor``/``prior`` NULL);
    - ``bucket = -1``: one per-class summary row carrying ``floor``
      and ``prior`` (``delta`` 0.0).

    ``features`` (optional, guide §2.4): a precomputed
    ``_doc_bucket_counts(df, text_col, id_col, buckets)`` frame over
    the UNFILTERED corpus — the labels inner join below restricts to
    labeled docs, so the fit is identical while a ``cache.track``'d
    featurize is shared with the :func:`lang_id_nb` scorer instead of
    re-running the gram explode per consumer.
    """
    if buckets < 2:
        raise ValueError("train_lang_weights: buckets must be >= 2")
    labeled = (
        df.filter(F.col(text_col).isNotNull())
        .filter(F.col(lang_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(lang_col).alias("_lang"))
    )
    if features is None:
        features = _doc_bucket_counts(
            df.filter(F.col(lang_col).isNotNull()), text_col, id_col, buckets
        )
    feats = features.join(labeled, "_id")
    per = feats.groupBy("_lang", "_b").agg(F.sum("_c").alias("_c"))
    from methyl_data_pipeline_spark import cache

    # the (class x bucket) table feeds both the sparse rows and the
    # totals fold — persist so the gram scan runs once, not per branch
    per = cache.track(per)
    tot = per.groupBy("_lang").agg(F.sum("_c").alias("_t"))
    nd = labeled.groupBy("_lang").agg(F.count(F.lit(1)).alias("_nl"))
    ntot = labeled.agg(F.count(F.lit(1)).alias("_ntot"))
    a, b = F.lit(float(alpha)), F.lit(float(alpha * buckets))
    floor6 = F.round(
        F.log(a / (F.col("_t") + b)) + F.lit(1e-9), 6
    ) + F.lit(0.0)
    w6 = F.round(
        F.log((F.col("_c") + a) / (F.col("_t") + b)) + F.lit(1e-9), 6
    ) + F.lit(0.0)
    prior6 = F.round(
        F.log(F.col("_nl") / F.col("_ntot").cast("double")) + F.lit(1e-9), 6
    ) + F.lit(0.0)
    sparse = per.join(F.broadcast(tot), "_lang").select(
        F.col("_lang").alias("lang"),
        F.col("_b").cast("int").alias("bucket"),
        (w6 - floor6).alias("delta"),
        F.lit(None).cast("double").alias("floor"),
        F.lit(None).cast("double").alias("prior"),
    )
    summary = (
        tot.join(nd, "_lang")
        .crossJoin(F.broadcast(ntot))
        .select(
            F.col("_lang").alias("lang"),
            F.lit(-1).alias("bucket"),
            F.lit(0.0).alias("delta"),
            floor6.alias("floor"),
            prior6.alias("prior"),
        )
    )
    return sparse.unionByName(summary)


def lang_id_nb(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    features: DataFrame | None = None,
) -> DataFrame:
    """Score every non-NULL-text doc under a :func:`train_lang_weights`
    table and emit the argmax class: ``score(d, l) = prior_l +
    n_grams(d) * floor_l + sum c_b * delta_lb``; ties break to the
    lexicographically smallest class (both engines). Zero-gram docs
    score ``prior_l`` exactly (the class prior decides).

    Plan: gram explode -> per-doc bucket collapse (the shared
    featurizer), ONE broadcast join against the sparse trained rows
    (<= classes x buckets, broadcastable by construction), a
    (doc, class) aggregate, dense completion via a broadcast
    cross-join with the class dimension, and a per-doc window argmax
    — corpus-sized shuffles keyed by doc id only. The argmax lowers to
    WindowGroupLimit (rank-1 pushdown), so no per-doc sort
    materializes. Measured fit+score at 1x -> 10x corpus:
    4.42 s -> 24.22 s (slope 5.5x on 10x data;
    tools/scale_probe.py lang_id_nb).

    Output: ``(id_col, pred_lang, n_grams, score)``.
    """
    wb = F.broadcast(weights)
    sparse = wb.filter(F.col("bucket") >= 0).select(
        F.col("lang").alias("_lang"),
        F.col("bucket").cast("long").alias("_b"),
        F.col("delta").alias("_delta"),
    )
    langdim = wb.filter(F.col("bucket") == -1).select(
        F.col("lang").alias("_lang"),
        F.col("floor").alias("_floor"),
        F.col("prior").alias("_prior"),
    )
    # ``buckets`` must equal the training-time bucket count — the
    # featurizer's pmod hashing and the table's bucket VALUES have to
    # agree or the broadcast join silently mismatches.
    # dbc feeds two branches (per-class partials + per-doc gram
    # totals) but this function does NOT persist it itself: an r14 A/B
    # (medians of 5, sf0.1) measured a scorer-local cache SLOWER (6.5
    # vs 5.3 s) — the two consumers are cheap map pipelines and the
    # cache fill serializes them behind a materialization barrier
    # (guide §5). Callers that ALSO train on the same corpus pass a
    # shared ``features`` frame instead (3+ consumers flips the trade;
    # the q_lang_id_nb A/B measured the shared cached featurize
    # faster).
    dbc = (
        features
        if features is not None
        else _doc_bucket_counts(df, text_col, id_col, buckets)
    )
    partial = (
        dbc.join(F.broadcast(sparse), "_b")
        .groupBy("_id", "_lang")
        .agg(F.sum(F.col("_c") * F.col("_delta")).alias("_part"))
    )
    ng = dbc.groupBy("_id").agg(F.sum("_c").cast("long").alias("n_grams"))
    ids = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"))
        .join(ng, "_id", "left")
        .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
    )
    dense = ids.crossJoin(F.broadcast(langdim)).join(
        partial, ["_id", "_lang"], "left"
    )
    score = (
        F.col("_prior")
        + F.col("n_grams") * F.col("_floor")
        + F.coalesce("_part", F.lit(0.0))
    )
    w = Window.partitionBy("_id").orderBy(
        F.desc("score"), F.asc("_lang")
    )
    return (
        dense.withColumn("score", score)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("_lang").alias("pred_lang"),
            "n_grams",
            "score",
        )
    )


def quality_score_linear(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    bias: float = 0.0,
    threshold: float = 0.0,
    pooling: str = "mean",
    bias_from_table: bool = False,
    features: DataFrame | None = None,
) -> DataFrame:
    """fastText-style linear quality classifier (VERDICT r11 #8;
    Joulin et al. 2016, "Bag of Tricks for Efficient Text
    Classification") — the model-based quality gate pretraining
    pipelines run beside rule-based ``quality_filter``: mean-pooled
    hashed unigram+bigram features through a single linear layer,
    ``logit = bias + sum_b count[b] * w[b] / n_grams``, pass iff
    ``logit >= threshold``.

    ``weights`` is a ``(bucket, weight)`` DataFrame — the table is
    vocabulary-bounded (``buckets`` rows) and BROADCAST into the
    scoring join, so scoring is a pure map-side pipeline over the
    corpus: tokenize+hash (one scan), per-doc bucket collapse
    (map-side partial agg), broadcast lookup, per-doc sum. No
    corpus-sized shuffle beyond the (id, bucket) collapse — the same
    100 TB shape as ``dsir_weights`` scoring. Buckets without a
    weight row score 0 (hash-bucket OOV).

    Pooling geometries (VERDICT r13 #9 — both pinned by the
    ``classifier_eval_sum`` oracle): ``pooling="mean"`` (default, the
    fastText shape above) divides the dot product by the gram count —
    right for an externally-calibrated weight table where document
    length must not scale the evidence; ``pooling="sum"`` keeps the
    raw ``bias + sum_b count[b] * w[b]`` — the EXACT Naive-Bayes
    posterior log-odds geometry :func:`train_quality_weights`'s table
    is derived in, where per-gram evidence accumulates and the class
    prior enters at full strength. ``bias_from_table=True`` reads the
    prior from the table's ``bucket = -1`` row (the row
    ``train_quality_weights`` emits) LAZILY — a 1-row aggregate
    broadcast into the plan, no driver action — instead of the
    ``bias`` argument.

    MEASURED (r14, sf0.01 lang=='en' pseudo-gold, the
    ``classifier_eval_sum`` oracle): at the fixed cutoff 0 the
    mean-pooled geometry edges out sum+prior (F1 .798 vs .784 — the
    prior pushes 15 borderline docs under the cut: P .813/R .757 vs
    .798/.798); at each geometry's own best sweep threshold the order
    flips by a hair (best-F1 .817 sum vs .813 mean). Neither
    dominates: pick sum+prior when downstream consumes calibrated NB
    posteriors, mean when a length-invariant score feeds a fixed
    cutoff.

    ``features`` (optional, guide §2.4): a precomputed
    ``_doc_bucket_counts(df, text_col, id_col, buckets)`` frame —
    pass a ``cache.track``'d one when several scorings (multiple
    weight tables or pooling geometries) evaluate the same corpus, so
    the gram explode runs once instead of once per scoring consumer.
    Must come from the same ``df``/``text_col``/``id_col``/``buckets``.

    Returns ``(id_col, n_grams, logit, quality_pass)`` for EVERY
    non-NULL-text doc; zero-gram docs score the bias exactly.
    """
    if buckets < 2:
        raise ValueError("quality_score_linear: buckets must be >= 2")
    if pooling not in ("mean", "sum"):
        raise ValueError("quality_score_linear: pooling must be 'mean' or 'sum'")
    wtab = weights.select(
        F.col("bucket").cast("long").alias("_b"),
        F.col("weight").cast("double").alias("_w"),
    )
    if features is None:
        features = _doc_bucket_counts(df, text_col, id_col, buckets)
    scored = (
        features
        .join(F.broadcast(wtab.filter(F.col("_b") >= 0)), "_b", "left")
        .groupBy("_id")
        .agg(
            F.sum("_c").cast("long").alias("n_grams"),
            F.sum(F.col("_c") * F.coalesce("_w", F.lit(0.0))).alias("_dot"),
        )
    )
    ids = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id")
    )
    if bias_from_table:
        # the bucket = -1 prior row, folded in as a broadcast 1-row
        # frame (max over <=1 rows; 0.0 when the table carries none)
        bias_frame = wtab.filter(F.col("_b") == -1).agg(
            F.coalesce(F.max("_w"), F.lit(0.0)).alias("_bias")
        )
        ids = ids.crossJoin(F.broadcast(bias_frame))
        bias_col = F.col("_bias")
    else:
        bias_col = F.lit(float(bias))
    dot = F.when(
        F.coalesce("n_grams", F.lit(0)) > 0,
        F.col("_dot") / F.col("n_grams") if pooling == "mean" else F.col("_dot"),
    ).otherwise(F.lit(0.0))
    logit = bias_col + dot
    return ids.join(scored, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        logit.alias("logit"),
        (logit >= F.lit(float(threshold))).alias("quality_pass"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    smoothing: float = 1.0,
    ratio_round: int = 9,
    stage: bool = False,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw doc
    by how target-like its hashed n-gram distribution is —
    ``log w(x) = sum_b count_x[b] * (log p_target[b] - log q_raw[b])``
    over ``buckets`` hashed unigram+bigram feature buckets, with
    Laplace ``smoothing`` on both bucket distributions.

    Engine-reproducible by construction: buckets hash via
    :func:`md5_long` (external SQL computes identical values), and the
    per-bucket log-ratio table is rounded to ``ratio_round`` dp BEFORE
    the per-doc sum so the only remaining float work is a short sum of
    grid-aligned values (the repo's pre-rounding doctrine).

    Plan shape at 100 TB: tokenize+hash is a map stage; the bucket
    distributions collapse map-side to ``buckets`` rows per partition
    before their one shuffle (same shape as ``domain_mix``); the
    log-ratio table is ``buckets`` rows and BROADCAST into the per-doc
    scoring join; the per-doc sum is one (id, bucket)-granular
    aggregation. By default the raw corpus is scanned twice (once for
    q, once for scoring) — Catalyst shares no subplan across branches,
    and the B-row distribution is the thing worth keeping, not the
    gram stream. ``stage=True`` persists the collapsed (id, bucket,
    count) frame between the two passes instead — far smaller than the
    token stream but still corpus-row-scaled. Measured head-to-head
    (VERDICT r10 #5, local[32], medians of 3): sf0.1 raw 4,285 docs ->
    two-scan 3.22 s vs staged 3.02 s; 10x corpus 42,850 docs -> 6.57 s
    vs 4.94 s — staging wins at both scales and the gap WIDENS with
    corpus size (the tokenize+md5 scan is the growing term). It stays
    opt-in rather than default because the persisted frame is
    ~n_docs x distinct-buckets rows cluster-wide: at 100 TB that is a
    spill-prone cache whose cost depends on executor storage, while
    the re-scan cost depends on source locality — flip it on when the
    raw source is expensive to re-read (remote object store,
    decompress-heavy codec), which is also the common cluster case.

    Returns (id_col, n_grams, log_weight) for every raw doc with
    non-NULL text; a doc with no grams (empty text) carries weight 0.
    """
    if buckets < 2:
        raise ValueError("dsir_weights: buckets must be >= 2")
    if smoothing <= 0:
        raise ValueError("dsir_weights: smoothing must be > 0 (log of zero)")

    def doc_buckets(df: DataFrame) -> DataFrame:
        return _doc_bucket_counts(df, text_col, id_col, buckets)

    def bucket_dist(db: DataFrame, tag: str) -> DataFrame:
        # explode -> groupBy(bucket): partial aggregation collapses to
        # <= buckets rows per partition before the one shuffle
        return db.groupBy("_b").agg(F.sum("_c").alias(f"n_{tag}"))

    raw_buckets = doc_buckets(raw)
    if stage:
        from methyl_data_pipeline_spark import cache

        raw_buckets = cache.track(raw_buckets)

    dist = bucket_dist(doc_buckets(target), "p").join(
        bucket_dist(raw_buckets, "q"), "_b", "full"
    )
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    a = float(smoothing)
    np_, nq = F.coalesce("n_p", F.lit(0)), F.coalesce("n_q", F.lit(0))
    # Symmetric cross-engine nudge: 3 decimal places below the rounding
    # grid (1e-12 at the default 9 dp), applied identically in the
    # DuckDB oracle, so a log-ratio sitting within one ulp of a
    # rounding boundary rounds the same way in both engines.
    ratio = F.round(
        (
            F.log((np_ + a) / (F.sum(np_).over(tot) + a * buckets))
            - F.log((nq + a) / (F.sum(nq).over(tot) + a * buckets))
            + F.lit(10.0 ** -(ratio_round + 3))
        ),
        ratio_round,
    )
    ratios = dist.select("_b", ratio.alias("_lr"))

    scored = (
        raw_buckets
        .join(F.broadcast(ratios), "_b", "left")
        .groupBy("_id")
        .agg(
            F.sum("_c").cast("long").alias("n_grams"),
            F.sum(F.col("_c") * F.coalesce("_lr", F.lit(0.0))).alias("log_weight"),
        )
    )
    ids = raw.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id")
    )
    return ids.join(scored, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    smoothing: float = 1.0,
    temperature: float = 1.0,
    seed: str = "dsir",
    score_round: int = 6,
    stage: bool = False,
) -> DataFrame:
    """DSIR selection via deterministic Gumbel top-k: keep the ``k``
    raw docs with the largest ``log_weight / temperature + Gumbel``
    key, which samples WITHOUT replacement proportionally to
    ``w^(1/temperature)`` (Gumbel-max duality) — the paper's
    importance resampling, reproducible across engines because the
    Gumbel noise derives from :func:`md5_long` of the doc id
    (``u = (h % 2^20 + 0.5) / 2^20``, ``g = -ln(-ln(u))``), not an
    RNG. Keys round to ``score_round`` dp before ranking (ties to min
    id) so a 1-ulp sum difference cannot flip the emitted set.

    Returns (id_col, n_grams, log_weight, sel_rank) for the selected
    docs, sel_rank 1..k by descending key. The top-k runs as
    ``TakeOrderedAndProject`` (orderBy + limit — per-partition heaps,
    no single-task corpus funnel); only the k survivors pass through
    the rank window. ``stage`` passes through to
    :func:`dsir_weights` (persist the collapsed raw feature frame
    between its two passes — measured faster at 1x AND 10x, see that
    docstring for the cache-vs-rescan trade).
    """
    if k < 1:
        raise ValueError("dsir_select: k must be >= 1")
    if temperature <= 0:
        raise ValueError("dsir_select: temperature must be > 0")
    w = dsir_weights(
        raw, target, text_col, id_col, buckets, smoothing, stage=stage
    )
    m = 1 << 20
    u = (
        F.pmod(md5_long(F.col(id_col).cast("string"), salt=seed), F.lit(m))
        + 0.5
    ) / float(m)
    # +1e-9 is the repo's cross-engine rounding nudge (see __spark_entry__
    # _r/_ri): the oracle rounds the identical nudged value, so a key
    # within one ulp of a 6-dp boundary cannot flip the selected set.
    key = F.round(
        F.col("log_weight") / float(temperature) - F.log(-F.log(u)) + F.lit(1e-9),
        score_round,
    )
    order = [F.col("_key").desc(), F.col(id_col).asc()]
    sel = w.withColumn("_key", key).orderBy(*order).limit(k)
    win = Window.orderBy(*order)  # k rows only — post-limit
    return (
        sel.withColumn("sel_rank", F.row_number().over(win))
        .select(id_col, "n_grams", "log_weight", "sel_rank")
    )


def _bpe_merge_step(syms: Column, left: str, right: str) -> Column:
    """Apply one BPE merge rule greedily left-to-right over a symbol
    array: every non-overlapping adjacent (left, right) becomes
    left||right, scanning once (so "a a a" under rule (a, a) yields
    ["aa", "a"], and "a a a a" yields ["aa", "aa"]). One fold, no
    re-entry: the merged token never re-merges within the round
    because the rule's left side cannot equal left||right."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("last"),
    )

    def step(acc: Column, s: Column) -> Column:
        hit = (acc["last"] == F.lit(left)) & (s == F.lit(right))
        return F.when(
            hit,
            F.struct(acc["out"].alias("out"), F.lit(merged).alias("last")),
        ).otherwise(
            F.struct(
                F.when(
                    acc["last"].isNotNull(),
                    F.concat(acc["out"], F.array(acc["last"])),
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("last"),
            )
        )

    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(
            acc["last"].isNotNull(), F.concat(acc["out"], F.array(acc["last"]))
        ).otherwise(acc["out"]),
    )


def bpe_merges(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    eow: str = "</w>",
) -> DataFrame:
    """Distributed BPE merge induction (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units"): learn the
    first ``k`` merge rules over the corpus — each round counts every
    adjacent symbol pair (weighted by word frequency), picks the most
    frequent (ties to lexicographically smallest (left, right), so the
    induction is deterministic and engine-replayable), and applies it
    greedily left-to-right to every word.

    Scale shape: the CORPUS is touched exactly once — the whitespace
    word-frequency collapse (explode -> groupBy(word), partial
    aggregation map-side). Every merge round then runs on the
    VOCAB-sized (word, count, symbols) table: one bounded
    pair-explode + groupBy (<= total symbol count across word TYPES,
    not tokens), one 1-row argmax collect (the global decision is
    inherent to BPE), one HOF map applying the rule. Round results
    persist via ``cache.track`` with the superseded round released, so
    lineage stays one round deep. At 100 TB the vocab table is ~10^6
    rows — each of the k rounds costs seconds, independent of corpus
    size.

    No input repartition: the corpus scan parallelizes by file/split
    at scale, and at bench scale the k per-round jobs dominate — a
    doc-keyed spread measured SLOWER (4.96 -> 5.34 s at sf0.1, k=8,
    medians of 3: the extra corpus shuffle costs more than the
    single-partition tokenize it parallelizes). Growth probe
    (`tools/scale_probe.py --bpe-growth`): 2.5x wall at 100x corpus
    with worst-case linear vocab growth.

    Words are whitespace tokens of lowercased text (:func:`words`)
    with ``eow`` appended as a distinct trailing symbol (the standard
    word-final marker, so merges can learn suffix units). Returns
    ``(merge_rank, left, right, merged, pair_count)`` for the learned
    rules, rank 1..k in induction order; stops early (fewer rows) when
    no adjacent pair remains.
    """
    if k < 1:
        raise ValueError("bpe_merges: k must be >= 1")
    from methyl_data_pipeline_spark import cache

    spark = df.sparkSession
    wf = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.filter(words(F.col(text_col)), lambda x: x != "")).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("_w")),
        lambda i: F.col("_w").substr(i, F.lit(1)),
    )
    vocab = wf.select(
        "_c", F.concat(chars, F.array(F.lit(eow))).alias("_s")
    )
    vocab = cache.track(vocab)

    rules: list[tuple[int, str, str, str, int]] = []
    prev = None
    for rank in range(1, k + 1):
        pairs = (
            vocab.select(
                "_c",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("_s"), 1, F.size("_s") - 1).alias("l"),
                        F.slice(F.col("_s"), 2, F.size("_s") - 1).alias("r"),
                    )
                ).alias("_p"),
            )
            .groupBy(F.col("_p.l").alias("_l"), F.col("_p.r").alias("_r"))
            .agg(F.sum("_c").alias("_n"))
        )
        # ONE job per round: the argmax both decides the rule AND
        # materializes this round's cached symbol table, after which
        # the superseded round releases — dropping the separate
        # materialize-before-unpersist count() measured 4.96 -> 3.59 s
        # at sf0.1 k=8 (per-round job overhead dominates at bench
        # scale; at cluster scale it halves the round latency)
        best = pairs.orderBy(
            F.col("_n").desc(), F.col("_l").asc(), F.col("_r").asc()
        ).first()
        if prev is not None:
            prev.unpersist()
            prev = None
        if best is None:
            break
        left, right, n = best["_l"], best["_r"], int(best["_n"])
        rules.append((rank, left, right, left + right, n))
        nxt = cache.track(
            vocab.select("_c", _bpe_merge_step(F.col("_s"), left, right).alias("_s"))
        )
        prev, vocab = vocab, nxt
    if prev is not None:
        prev.unpersist()
    vocab.unpersist()
    return spark.createDataFrame(
        rules,
        "merge_rank int, left string, right string, merged string, pair_count long",
    )


def bpe_encode(
    df: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: str = "</w>",
) -> DataFrame:
    """Apply learned BPE merge rules (:func:`bpe_merges` output) to
    tokenize a corpus — the encode half of the subword pipeline: learn
    once on a reference corpus, encode any corpus with the frozen
    rules.

    ``merges`` is either the :func:`bpe_merges` result DataFrame or a
    list of ``(left, right)`` pairs in rank order (a DataFrame is
    collected driver-side — it is k rows by construction).

    Scale shape: rules apply to the VOCAB (distinct-word) table — k
    chained HOF folds over word types, never per token occurrence —
    then one join maps the corpus word stream through the encoded
    vocab and a per-doc sort-and-flatten reassembles documents (the
    standard tokenize-by-dictionary shape; the vocab side is
    dup-collapsed so the join input is bounded by vocabulary, and AQE
    broadcasts it when small). Word order is preserved via the
    posexplode index carried through the join.

    Returns ``(id_col, n_tokens, tokens)`` for EVERY non-NULL-text
    doc — zero-word (empty/whitespace-only) docs emit ``n_tokens=0``
    with empty ``tokens`` rather than dropping (ADVICE r11: the
    contract is total over the doc set). ``tokens`` is the
    space-joined subword sequence (symbols never contain whitespace:
    words are whitespace tokens and ``eow`` is space-free).

    Growth (scrambled replicas, k=8 rules, local[32]): 1× (2.4M
    tokens) 2.05 s → 10× 10.96 s → 100× (240M tokens) 96.4 s — an
    encoder's output IS corpus-sized, so wall is linear in tokens by
    necessity; per-token cost improves ~2× across the range
    (scheduling amortizes).
    """
    if hasattr(merges, "collect"):
        rules = [
            (r["left"], r["right"])
            for r in merges.orderBy("merge_rank").collect()
        ]
    else:
        rules = [(left, right) for left, right in merges]

    # zero-word docs ride through as ONE sentinel row (_w = "", a
    # value real words can never take after the non-empty filter) so
    # the totality contract costs no extra join. posexplode_OUTER
    # emits a single (NULL, NULL) row for an empty word array with
    # ONE evaluation of the split — the r12 first cut used
    # when(size(wds) > 0, wds) which evaluated the tokenizer twice
    # per row and benched a confirmed ~1.4x regression on the word
    # stream; the coalesce to ("", 0) is free by comparison.
    from methyl_data_pipeline_spark import cache
    from methyl_data_pipeline_spark.ext.dedup import _spread

    wds = F.filter(words(F.col(text_col)), lambda x: x != "")
    # Persisted: the exploded word stream feeds BOTH the distinct-word
    # vocab and the encode join — uncached, the corpus tokenize runs
    # twice (guide §2.4). Rows are (id, pos, word) — token-stream-sized
    # but narrow, and the default storage level spills to disk rather
    # than evicting under pressure. r14 A/B (medians of 5, sf0.1):
    # cached 6.30 s vs lazy 6.85 s.
    # _spread first (guide §2.5; r15): a single-file local scan runs
    # the tokenize explode + the cache fill on ONE core — the output
    # is token-stream-sized, so the serial stage is the plan's widest
    # write. The text-notnull filter still pushes to the scan (cheap);
    # the Generate stays above the exchange. Interleaved A/B (r15,
    # same session, merges+encode chain, 3 pairs, sf0.1): spread
    # 7.6/8.5/8.9 s vs bare 8.2/12.6/10.8 s — spread won every pair.
    # (bpe_merges keeps NO spread: its word-frequency groupBy bounds
    # the serial stage's output map-side, measured in r14.)
    base = cache.track(
        _spread(df.filter(F.col(text_col).isNotNull()), id_col)
        .select(F.col(id_col), F.posexplode_outer(wds).alias("_i", "_w"))
        .select(
            id_col,
            F.coalesce("_i", F.lit(0)).alias("_i"),
            F.coalesce("_w", F.lit("")).alias("_w"),
        )
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("_w")),
        lambda i: F.col("_w").substr(i, F.lit(1)),
    )
    syms = F.concat(chars, F.array(F.lit(eow)))
    for left, right in rules:
        syms = _bpe_merge_step(syms, left, right)
    vocab = base.select("_w").distinct().select(
        "_w",
        F.when(F.col("_w") == "", F.array().cast("array<string>"))
        .otherwise(syms)
        .alias("_toks"),
    )
    return (
        base.join(vocab, "_w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_i"), F.col("_toks")))
                    ),
                    lambda s: s["_toks"],
                )
            ).alias("_flat")
        )
        .select(
            id_col,
            F.size("_flat").cast("long").alias("n_tokens"),
            F.array_join("_flat", " ").alias("tokens"),
        )
    )
