"""Text-analysis functions for the training-data pipeline.

Everything here is a composition of built-in ``pyspark.sql.functions``
(JVM-side, whole-stage codegen) — no Python UDFs.  Each function has an
exact ANSI-SQL twin used by the DuckDB oracle in ``__spark_entry__``,
so the semantics are pinned cross-engine:

- tokenization = split on a single space (the synthetic corpus is
  single-space separated; swap the delimiter for real corpora);
- token/char counting, type-token (distinct) ratio, stopword ratio;
- language ID = majority vote of per-language marker-word hits
  (tie-break: count desc, lang asc; no hits -> 'und');
- document fingerprint = md5 of the sorted distinct token set (an
  order-insensitive content fingerprint for clustering/dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in"]

# marker vocabularies for the n-gram-free language-ID heuristic;
# deliberately tiny and deterministic (extend per corpus)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "de", "es", "que"],
    "fr": ["le", "la", "et", "est", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def tokens(text: Column | str) -> Column:
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column | str) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, n_distinct, distinct_ratio, stopword_ratio)
    — the length/diversity/stopword quality signals, rounded to 6 for
    cross-engine comparability."""
    t = F.col(text_col)
    nt = token_count(t)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        nt.alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct"),
        F.round(distinct_token_count(t) / nt, 6).alias("distinct_ratio"),
        F.round(stopword_count(t) / nt, 6).alias("stopword_ratio"),
    )


# word runs / digit runs / single punctuation marks — deliberately
# character-class-only so Java regex (Spark) and RE2 (DuckDB) agree
REGEX_TOKEN_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"


def regex_tokens(text: Column | str) -> Column:
    """Regex tokenization: lowercase word/number runs plus isolated
    punctuation — the usual pre-tokenizer shape in front of a BPE."""
    return F.regexp_extract_all(F.lower(text), F.lit(REGEX_TOKEN_PATTERN), 0)


def bpe_token_estimate(text: Column | str) -> Column:
    """Deterministic BPE-ish subword count estimate: each regex token
    contributes ceil(len/4) subwords (~4 chars/token, the usual BPE
    rule of thumb).  An estimator for length budgeting at corpus scale,
    not a real tokenizer (no vocab in this environment)."""
    return F.aggregate(
        regex_tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)),
    )


def repetition_features(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, n_ngrams, n_distinct_ngrams, dup_ngram_ratio) — the Gopher
    within-document repetition quality signal (Rae et al. 2021 §A.1.1:
    heavily repetitive documents are low-quality): the fraction of
    n-token shingles that are duplicates of an earlier shingle in the
    SAME document.  Pure column expressions; docs shorter than ``n``
    tokens have 0 shingles and ratio 0."""
    toks = tokens(F.col(text_col))
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    ngs = F.when(F.size(toks) >= n, sh).otherwise(F.array().cast("array<string>"))
    total = F.size(ngs)
    nd = F.size(F.array_distinct(ngs))
    return df.select(
        F.col(id_col),
        total.cast("long").alias("n_ngrams"),
        nd.cast("long").alias("n_distinct_ngrams"),
        F.when(total > 0, F.round(1.0 - nd / total, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_ratio"),
    )


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def lang_markers_rows() -> list[tuple[str, str]]:
    return [(lang, w) for lang, words in sorted(LANG_MARKERS.items()) for w in words]


def detect_language(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang_guess) — majority marker-word vote; deterministic
    tie-break (hits desc, lang asc); 'und' when no marker hits."""
    spark = df.sparkSession
    markers = spark.createDataFrame(lang_markers_rows(), "lang_cand string, word string")
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word"))
    hits = (
        tok.join(F.broadcast(markers), "word")
        .groupBy(id_col, "lang_cand")
        .agg(F.count("*").alias("hits"))
    )
    # deterministic argmax in ONE aggregation (min of (-hits, lang)
    # struct = max hit count, alphabetically-smallest lang on ties) —
    # the max-count/join-back form evaluated the token explode twice
    winner = hits.groupBy(id_col).agg(
        F.min(F.struct((-F.col("hits")).alias("nh"), F.col("lang_cand").alias("l")))
        .alias("w")
    ).select(id_col, F.col("w.l").alias("lang_guess"))
    return df.select(id_col).join(winner, id_col, "left").select(
        id_col, F.coalesce("lang_guess", F.lit("und")).alias("lang_guess")
    )


# ---------------------------------------------------------------------------
# PII scrubbing + whitespace normalization (training-data hygiene)
# ---------------------------------------------------------------------------

# Ordered (pattern, replacement) pairs — order matters: emails contain
# dot-separated runs that the IP pattern would otherwise mangle, so
# emails scrub first.  Patterns are deliberately high-precision (a
# training-data scrubber must not shred ordinary prose): anchored on
# word boundaries, digit shapes, and separators.
PII_PATTERNS: list[tuple[str, str]] = [
    # email
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4 (each octet 0-255)
    (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
        "<IP>",
    ),
    # US-style SSN
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # phone: optional +country, then 3-3-4 with -, ., or space separators.
    # Guard so the match can't start mid-digit-run (an unguarded pattern
    # scrubbed the tail of invoice/ISBN-style numbers; r06 review), while
    # still admitting a leading '+' after whitespace/line start: \b can't
    # sit between two non-word chars (space and '+'), so the '+' branch
    # uses \B instead (r06 ADVICE — '+1 415-555-0199' now scrubs whole).
    # RE2-compatible — no lookaround (the DuckDB twin runs the same list).
    (
        r"(?:\B\+|\b)(?:[0-9]{1,2}[ .\-])?\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}\b",
        "<PHONE>",
    ),
    # 13-19 digit card-shaped runs (optionally 4-grouped)
    (r"\b[0-9]{4}(?:[ \-][0-9]{4}){2,3}\b|\b[0-9]{13,19}\b", "<CARD>"),
]


def scrub_pii(text: Column | str) -> Column:
    """Replace common PII shapes (email, IPv4, SSN, phone, card-like
    digit runs) with typed placeholder tokens — a chained JVM-side
    ``regexp_replace``, no UDF, order-stable (see PII_PATTERNS).  The
    placeholders survive tokenization so downstream token counting and
    dedup treat scrubbed docs consistently."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


# normalize_ws's pattern chain, exported so the DuckDB twin imports it
# exactly like PII_PATTERNS (single source of truth — a hand-transcribed
# copy in the oracle would silently diverge on the next edit here)
NORMALIZE_PATTERNS: list[tuple[str, str]] = [
    (r"[\x00-\x08\x0B-\x1F\x7F]", ""),   # strip C0 controls (keep \t \n)
    (r"[ \t]+", " "),                      # collapse horizontal runs
    (r" ?\n ?", "\n"),                      # newlines absorb flanking spaces
    (r"\n{3,}", "\n\n"),                    # 3+ newlines -> paragraph break
]


def normalize_ws(text: Column | str) -> Column:
    """Training-corpus whitespace canonicalization: strip C0 control
    chars (except \\t \\n), collapse horizontal whitespace runs to one
    space, collapse 3+ newlines to two (paragraph break), trim."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, repl in NORMALIZE_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return F.trim(col)


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, k: float = 0.5
) -> DataFrame:
    """(id, n_scored_tokens, lm_logprob) — the LM-filter quality signal
    (CCNet / Wenzek et al. 2020 score corpora by LM perplexity and drop
    the tail), in its unigram simplification so it needs no external
    model: score each document by the mean log2-probability of its
    tokens under the CORPUS'S OWN add-k-smoothed unigram distribution,
    P(t) = (count(t) + k) / (N + k·V).  Token-soup / rare-gibberish
    documents score far below documents built from the corpus's common
    vocabulary; rank or threshold on ``lm_logprob`` exactly like a
    perplexity filter.

    Shape at 100 TB: one token scan builds the frequency table (a
    shuffle whose size is the VOCABULARY, not the corpus), the totals
    ride a one-row broadcast (no driver action — the repo's scalar-
    frame pattern), and scoring is a broadcast join of the vocabulary
    onto the token stream (token types are millions while the corpus
    is trillions of tokens; a vocabulary too big to broadcast would
    shuffle-join with AQE skew handling on the hot common tokens).
    Empty documents get NULL lm_logprob (nothing to score).
    ``lm_logprob`` is rounded to 6 decimals — FP sum order differs
    across engines (the cos_sim / quantiles oracle policy)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").alias("_n"), F.count("*").alias("_v")
    )
    scored_vocab = vocab.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.log2(
            (F.col("cnt") + F.lit(float(k)))
            / (F.col("_n") + F.lit(float(k)) * F.col("_v"))
        ).alias("_lp"),
    )
    per_doc = (
        toks.join(F.broadcast(scored_vocab), "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_scored_tokens"),
            F.round(F.avg("_lp"), 6).alias("lm_logprob"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_scored_tokens", F.lit(0)).alias("n_scored_tokens"),
            "lm_logprob",
        )
    )
