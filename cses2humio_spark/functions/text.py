"""Text-analysis functions for the training-data pipeline surface
(SURVEY.md §2.2): tokenization, language-ID, quality scoring, document
fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` (codegen'd, no
Python in the hot path) and is deterministic, so each has an exact DuckDB
oracle. At 100 TB these run as narrow map-side transforms — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
# language-ID (deliberately small + deterministic; real deployments plug in
# fasttext via a pandas_udf behind the same column contract)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
    "zh": ["的", "是", "不", "我", "了", "在", "有", "他", "这", "就"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-approximating token count: word-piece regex splits on
    letter/digit/punct boundaries, ~= GPT-style token inflation for plain
    text. Deterministic; oracle-friendly (regexp in both engines)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )


def stopword_ratio(col: Column, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def language_id(col: Column) -> Column:
    """Heuristic language-ID: argmax of per-language stopword ratios, 'und'
    when nothing matches. Deterministic tie-break by language code order."""
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(STOPWORDS):  # deterministic iteration order
        score = stopword_ratio(col, lang)
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0,1]:
    0.4 * length-score (saturates at 200 tokens)
    + 0.3 * (1 - punctuation ratio)
    + 0.3 * token diversity (distinct/total).
    Rounded to 6dp for cross-engine float determinism."""
    toks = tokens(col)
    n = F.size(toks).cast("double")
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", "")).cast("double")
    punct_ratio = punct / F.greatest(F.length(col).cast("double"), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / F.greatest(n, F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * diversity,
        6,
    )


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 of the normalized text
    (lowercased, whitespace-collapsed, sorted-token canonical form is NOT
    applied — word order matters for exact dup detection)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def shannon_entropy(col: Column) -> Column:
    """Per-character Shannon entropy in bits (the Humio ``shannonEntropy``
    analog — the standard signal for DGA domains and encoded payloads in
    security log analytics). Pure codegen higher-order functions: chars ->
    sorted distinct alphabet -> -sum p*log2(p) as a left-to-right fold, so
    the float addition order matches an engine-side list_reduce over the
    same sorted alphabet (oracle-parity). Empty strings score 0.0;
    single-symbol strings fold to IEEE -0.0 on every engine alike.
    Cost is O(len * alphabet) per row — fine for the short tokens/fields
    this targets; it stays a narrow projection at any scale."""
    chars = F.filter(F.split(col, ""), lambda x: x != F.lit(""))
    n = F.size(chars).cast("double")
    alphabet = F.array_sort(F.array_distinct(chars))

    def term(c: Column) -> Column:
        p = F.size(F.filter(chars, lambda x: x == c)) / n
        return p * F.log2(p)

    return F.when(n == 0, F.lit(0.0)).otherwise(
        -F.aggregate(
            F.transform(alphabet, term), F.lit(0.0), lambda acc, x: acc + x
        )
    )
