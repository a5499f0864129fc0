"""Text-analysis columns for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Catalyst expressions (regex/array built-ins, whole-stage-codegen'd);
no UDFs. Each is a Column factory so it composes into any select().
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text_dedup import MERSENNE, _h32, tokens_col

# Tiny per-language stopword marker lists (public common function words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "los", "que", "es", "una"],
}


def token_count_col(c):
    """Whitespace token count over a Column (0 for NULL/empty/blank).

    NULL must map to 0, not NULL: ``size(split(NULL))`` is NULL, and a NULL
    leaking into aggregate sums poisons them (a single NULL turn would
    otherwise empty a whole conversation in truncate_to_token_budget)."""
    t = F.trim(c)
    return F.when(t.isNull() | (t == ""), F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def token_count(text_col="text"):
    """Whitespace token count (0 for NULL/empty/blank)."""
    return token_count_col(F.col(text_col))


def bpe_ish_token_count(text_col="text"):
    """BPE-style subword estimate: count word runs + digit runs + punct
    singletons (a public GPT-2-ish pre-tokenizer regex approximation)."""
    return F.regexp_count(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    )


def punct_ratio(text_col="text"):
    t = F.col(text_col)
    n = F.length(t)
    punct = n - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(n == 0, 0.0).otherwise(punct / n)


def stopword_fraction(text_col="text", lang: str = "en"):
    toks = tokens_col(text_col)
    hits = F.size(
        F.filter(toks, lambda x: x.isin(*LANG_MARKERS[lang]))
    )
    return F.when(F.size(toks) <= 0, 0.0).otherwise(hits / F.size(toks))


def quality_score(text_col="text"):
    """Composite [0,1] quality heuristic: long enough, low punctuation noise,
    some function-word signal. Weights are arbitrary but fixed."""
    n_tok = token_count(text_col)
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text_col) * 5, F.lit(1.0))
    stop_term = F.least(stopword_fraction(text_col) * 4, F.lit(1.0))
    return F.round(0.4 * len_term + 0.3 * punct_term + 0.3 * stop_term, 6)


def lang_scores(text_col="text"):
    """Per-language marker-hit counts (n-gram-free heuristic language ID)."""
    toks = tokens_col(text_col)
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text_col="text"):
    """argmax over marker-hit counts; 'und' (undetermined) when all zero.
    Ties break by language code order (deterministic)."""
    scores = lang_scores(text_col)
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fold right-to-left so earlier (alphabetical) langs win ties with >=
    for lang in reversed(langs):
        s = scores[lang]
        take = s >= best_score
        best_lang = F.when((s > 0) & take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def doc_fingerprint(text_col="text"):
    """Order-insensitive 61-bit content fingerprint: Σ token-hashes mod M.
    Robust to whitespace normalization / token re-ordering; portable md5
    base hash (same math in the oracle dialect)."""
    toks = tokens_col(text_col)
    return F.aggregate(
        F.transform(toks, lambda t: _h32(t)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc + h) % F.lit(MERSENNE),
    )


# ---------------------------------------------------------------- PII redact
# Patterns deliberately restricted to the RE2-compatible subset (character
# classes, bounded repeats, \b — no lookaround, no backrefs) so the SAME
# pattern text runs identically under Spark's Java regex and RE2-based
# engines (the DuckDB oracle mirrors these verbatim). Order matters: emails
# before generic digit runs (an email's local part may contain digits).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{13,19}\b", "<CARD>"),
    ("phone", r"\+\d[\d()\[\] .-]{6,}\d", "<PHONE>"),
]


def redact_pii(text_col="text", kinds: list[str] | None = None):
    """Scrub PII-looking spans (emails, IPv4s, long card-like digit runs,
    +international phone numbers) with typed placeholder tags — the
    pre-training privacy scrub every public-corpus pipeline runs before
    tokenization. Chained ``regexp_replace`` — pure Catalyst, codegen'd, one
    pass per pattern over the already-in-register string; no UDF, no
    shuffle. ``kinds`` selects a subset (in PII_PATTERNS order)."""
    out = F.col(text_col)
    for kind, pat, tag in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(text_col="text"):
    """Struct of per-kind PII match counts (for corpus auditing / routing
    documents to a heavier scrubber). regexp_count is JVM-side."""
    return F.struct(
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(kind)
            for kind, pat, _ in PII_PATTERNS
        ]
    )
