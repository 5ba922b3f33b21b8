"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (regexp_count / split / md5) — these run
inside whole-stage codegen, so a 100 TB corpus pays zero Python cost.
Each operator is also expressible in ANSI SQL for the DuckDB oracle
(same regexes, RE2-compatible).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kamae_spark.core.stage import keyword_params
from kamae_spark.operators.rowwise import ElementwiseTransform

# language-id heuristics: high-frequency function words per language.
# Deliberately tiny & deterministic (no external models in-container).
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|it|was|for)\b",
    "es": r"\b(el|la|de|que|y|los|en|un|una|por)\b",
    "fr": r"\b(le|la|les|de|et|un|une|des|du|est)\b",
    "de": r"\b(der|die|das|und|ist|von|den|nicht|mit|sich)\b",
}

WORD_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[!-/:-@\[-`{-~]"
STOPWORD_RE = LANG_MARKERS["en"]


class TokenCount(ElementwiseTransform):
    """Whitespace token count and a BPE-ish regex token count
    (word pieces + punctuation as separate tokens)."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str, mode: str = "whitespace"):
        if mode not in ("whitespace", "regex"):
            raise ValueError("mode must be whitespace|regex")

    def fn(self, x: Column) -> Column:
        if self.mode == "whitespace":
            t = F.trim(x)
            return F.when(t == "", F.lit(0)).otherwise(
                F.size(F.split(t, r"\s+"))
            ).cast("int")
        return (F.regexp_count(x, F.lit(WORD_RE)) + F.regexp_count(x, F.lit(PUNCT_RE))).cast("int")


class QualityScore(ElementwiseTransform):
    """Composite document-quality heuristics: length, punctuation ratio,
    stopword ratio, mean word length — combined into [0,1]-ish score.
    Components are exposed so downstream filters can use them raw."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str):
        pass

    @staticmethod
    def components(x: Column) -> dict[str, Column]:
        n_chars = F.length(x).cast("double")
        words = F.regexp_count(x, F.lit(WORD_RE)).cast("double")
        punct = F.regexp_count(x, F.lit(PUNCT_RE)).cast("double")
        stop = F.regexp_count(F.lower(x), F.lit(STOPWORD_RE)).cast("double")
        return {
            "n_chars": n_chars,
            "n_words": words,
            "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(0.0),
            "stopword_ratio": F.when(words > 0, stop / words).otherwise(0.0),
            "mean_word_len": F.when(words > 0, (n_chars - punct) / words).otherwise(0.0),
        }

    def fn(self, x: Column) -> Column:
        c = self.components(x)
        # heuristic blend: long enough, some stopwords, not punctuation soup
        length_score = F.least(c["n_chars"] / 500.0, F.lit(1.0))
        stop_score = F.least(c["stopword_ratio"] * 4.0, F.lit(1.0))
        punct_penalty = F.greatest(F.lit(1.0) - c["punct_ratio"] * 5.0, F.lit(0.0))
        return (length_score + stop_score + punct_penalty) / 3.0


class LanguageId(ElementwiseTransform):
    """n-gram/function-word language guess over LANG_MARKERS; 'und'
    (undetermined) when no marker matches. Deterministic argmax with
    ties broken by language code order."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str):
        pass

    def fn(self, x: Column) -> Column:
        lx = F.lower(x)
        scores = {lang: F.regexp_count(lx, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
        best = F.greatest(*scores.values())
        expr: Column = F.lit("und")
        # reversed so the FIRST language in code order wins ties
        for lang in reversed(list(LANG_MARKERS)):
            expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
        return expr


class Fingerprint(ElementwiseTransform):
    """Normalized-content fingerprint: lowercase, strip punctuation,
    collapse whitespace, md5 — the standard exact-near-dup key
    (casing/punctuation-invariant)."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str):
        pass

    @staticmethod
    def normalized(x: Column) -> Column:
        z = F.lower(x)
        z = F.regexp_replace(z, PUNCT_RE, "")
        z = F.trim(F.regexp_replace(z, r"\s+", " "))
        return z

    def fn(self, x: Column) -> Column:
        return F.md5(self.normalized(x))
