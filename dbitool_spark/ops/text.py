"""Text-analysis operators over document tables: token counting,
quality scoring, language-ID heuristic, fingerprinting.

All pure column expressions — regexp/split/aggregate run inside
whole-stage codegen; no Python touches row data, so these scan-shaped
ops run at parquet speed at any SF.

Honesty note on lang-ID: this is a marker-word + script heuristic
(the classic cheap pre-filter for corpus curation), not a model. The
driver's synthetic documents all draw from one English-ish vocab, so
on that data it reports 'en'/'unknown' — correct behavior of the
heuristic, checked exactly by the SQL oracle rather than against the
synthetic lang labels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small marker-word inventories for a cheap, deterministic heuristic.
# Function words chosen for high frequency and cross-language
# distinctiveness (the usual stopword-profiling approach).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es": ("el", "la", "los", "las", "es", "y", "en", "que", "por", "con"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "pour", "avec", "une"),
}

_PUNCT_RE = r"[^\w\s]"
_DIGIT_RE = r"[0-9]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the curation-pipeline baseline; BPE-ish
    subword counting is approximated by bpe_token_estimate)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """Deterministic BPE-ish token estimate: word-piece count by a
    regex over letter-runs / digit-runs / punctuation, plus a length
    penalty for words longer than a typical merge span (~6 chars) —
    the standard cheap proxy when no tokenizer model ships."""
    pieces = F.size(
        F.filter(
            F.split(F.lower(text), r"([^\w]|_)"), lambda p: F.length(p) > 0
        )
    )
    long_extra = F.aggregate(
        F.filter(F.split(F.lower(text), r"([^\w]|_)"), lambda p: F.length(p) > 6),
        F.lit(0),
        lambda acc, p: acc + F.floor(F.length(p) / 6).cast("int"),
    )
    punct = F.length(text) - F.length(F.regexp_replace(text, _PUNCT_RE, ""))
    return pieces + long_extra + punct


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard curation quality features per row (ratios of punct /
    digits / stopwords / short tokens, mean token length)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_toks,
            "mean_token_len": (n_chars - (n_toks - 1)) / n_toks,
            "punct_ratio": F.length(F.regexp_replace(t, r"[\w\s]", "")) / n_chars,
            "digit_ratio": F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars,
            "stopword_ratio": F.size(
                F.filter(toks, lambda w: F.array_contains(stop_arr, F.lower(w)))
            )
            / n_toks,
            "short_token_ratio": F.size(F.filter(toks, lambda w: F.length(w) <= 2)) / n_toks,
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the features: rewards
    stopword presence and moderate token length, penalizes punct/digit
    soup and very short docs. Deterministic linear blend — a filter
    threshold, not a model."""
    feats = quality_features(df, text_col)
    score = (
        F.lit(0.3) * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
        + F.lit(0.25) * F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 10), 1.0).otherwise(0.3)
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(F.col("digit_ratio") * 5, F.lit(1.0)))
        + F.lit(0.1) * F.least(F.col("n_tokens") / 100, F.lit(1.0))
    )
    return feats.withColumn("quality_score", F.round(score, 6))


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language plus a CJK character count."""
    toks = F.transform(tokens(text), F.lower)
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))
    out["zh"] = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax of marker scores; 'unknown' when no
    marker hits at all. Adds score columns + `lang_pred`."""
    scores = lang_scores(F.col(text_col))
    df = df.withColumns({f"score_{lang}": c for lang, c in scores.items()})
    langs = list(scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("unknown")
    # reverse order so earlier languages win argmax ties deterministically
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("lang_pred", pred)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: xxhash64 of the normalized text
    (lowercased, whitespace collapsed, punctuation stripped) — the
    exact-dedup key robust to trivial formatting edits."""
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(text)), _PUNCT_RE, ""), r"\s+", " "
    )
    return F.xxhash64(normalized)


# --- HTML / boilerplate removal ---------------------------------------

# Entity decode table, applied AFTER tag removal, in this order —
# '&amp;' strictly LAST so a literal '&amp;lt;' in the source decodes
# exactly once (to '&lt;' as text), never twice (to '<').
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# block elements whose CONTENT is boilerplate, not text
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_RE = r"(?is)<!--.*?-->"
_TAG_RE = r"<[^>]+>"


def strip_markup(text: Column) -> Column:
    """HTML/boilerplate removal — the pre-tokenization step every
    web-corpus pipeline runs before the quality/langid/dedup analysis
    in this module (which all assume clean text). Order matters and is
    the contract:

    1. script/style blocks and comments removed WITH their content
       (code and CSS are boilerplate, not text);
    2. remaining tags removed, replaced by a space (so 'a</p><p>b'
       keeps a word boundary);
    3. entities decoded ('&amp;' last — see HTML_ENTITIES);
    4. whitespace collapsed to single spaces, trimmed.

    Scale shape: one pure-JVM regexp/replace projection inside
    whole-stage codegen — no shuffle, no Python, runs at parquet scan
    speed at any SF. Regex subset chosen to behave identically under
    Java regex (Spark) and RE2 (DuckDB oracle): (?is) flags,
    non-greedy '.*?', '\\b', character classes only — no backrefs, no
    lookaround.

    Honesty note: this is the regexp-cascade stripper (the standard
    cheap first pass, same family as the quality heuristics here), not
    an HTML5 parser — malformed nesting ('<di v>', unclosed <script>)
    degrades exactly as the regexes read. A DOM-accurate extraction
    (trafilatura/jusText class) is a model-free but parser-dependent
    swap behind the same column signature."""
    c = F.regexp_replace(text, _SCRIPT_RE, " ")
    c = F.regexp_replace(c, _STYLE_RE, " ")
    c = F.regexp_replace(c, _COMMENT_RE, " ")
    c = F.regexp_replace(c, _TAG_RE, " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))
