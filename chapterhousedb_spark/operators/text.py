"""Text-analysis operators: stats/quality, language id, token counting,
document fingerprinting.

Everything here is built-in pyspark.sql.functions (JVM, codegen) — no
Python UDFs — so these run at full scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.dedup import normalize_text

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "del", "por"],
    "de": ["der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist"],
    "fr": ["le", "la", "et", "les", "des", "de", "un", "une", "dans", "est"],
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-style pre-tokenization count: words, numbers, punctuation
    runs counted separately (a GPT-2-like pre-tokenizer regex without
    the learned merges — an upper bound proxy for LLM token budgets)."""
    c = F.col(col) if isinstance(col, str) else col
    # split into word / number / punctuation-run units, then count
    pieces = F.split(
        F.trim(F.regexp_replace(c, r"([^\s\p{L}\p{N}]+|\p{N}+)", r" $1 ")), r"\s+"
    )
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(pieces))


def text_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document quality statistics + a composite quality score.

    Ratios are double divisions of integer counts — deterministic and
    oracle-reproducible. The quality score mirrors common pretraining
    filters (Gopher/C4-style length + symbol-ratio rules, public
    heuristics). `keep_cols` passes grouping attributes (source,
    lang, ...) through for downstream per-stratum aggregation without
    a join back onto the corpus."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    n_space = F.length(F.regexp_replace(c, r"[^\s]", ""))
    en_stop = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    toks = F.split(normalize_text(c), " ")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in (keep_cols or [])],
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        (n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))).alias(
            "avg_token_len"
        ),
        (n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        (n_digit.cast("double") / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_space.cast("double") / F.greatest(n_chars, F.lit(1))).alias("space_ratio"),
        (n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))).alias(
            "stopword_ratio"
        ),
        (
            (n_tokens >= 10)
            & (n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)) > 0.6)
            & (n_punct.cast("double") / F.greatest(n_chars, F.lit(1)) < 0.2)
        )
        .cast("boolean")
        .alias("passes_quality"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language id: charset detection for CJK/Cyrillic/Arabic,
    stopword-profile voting among latin-script languages.

    Returns (id, lang_pred, lang_score). Pure built-ins; the per-language
    stopword hit counts are computed with array intersections over the
    token set, argmax taken with greatest()."""
    c = F.col(text_col)
    toks = F.array_distinct(F.split(normalize_text(c), " "))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).cast("double")
        / F.greatest(F.size(toks), F.lit(1))
        for lang, words in _STOPWORDS.items()
    }
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    cyr = F.length(F.regexp_replace(c, r"[^Ѐ-ӿ]", ""))
    arab = F.length(F.regexp_replace(c, r"[^؀-ۿ]", ""))
    n_chars = F.greatest(F.length(c), F.lit(1))
    best_latin_score = F.greatest(*scores.values())
    best_latin = (
        F.when(scores["en"] == best_latin_score, "en")
        .when(scores["es"] == best_latin_score, "es")
        .when(scores["de"] == best_latin_score, "de")
        .otherwise("fr")
    )
    return df.select(
        F.col(id_col),
        F.when(cjk.cast("double") / n_chars > 0.2, "zh")
        .when(cyr.cast("double") / n_chars > 0.2, "ru")
        .when(arab.cast("double") / n_chars > 0.2, "ar")
        .when(best_latin_score > 0, best_latin)
        .otherwise("unknown")
        .alias("lang_pred"),
        best_latin_score.alias("lang_score"),
    )


def token_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding token windows with overlap: (id, chunk_idx, chunk_text,
    n_tokens) — the standard document -> context-window shaping for LLM
    training corpora. JVM-side: tokenize once per doc (Generate is the
    optimizer barrier, see dedup.py docstring), explode window starts,
    slice + rejoin. Windows start every (chunk_tokens - overlap) tokens;
    the last window may be short but every token is covered.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    return (
        df.select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
        )
        .select(
            id_col,
            "__toks",
            F.explode(
                F.expr(
                    f"sequence(1, greatest(size(__toks) - {overlap}, 1), {stride})"
                )
            ).alias("__start"),
        )
        .select(
            id_col,
            ((F.col("__start") - 1) / stride).cast("int").alias("chunk_idx"),
            F.expr(f"array_join(slice(__toks, __start, {chunk_tokens}), ' ')").alias(
                "chunk_text"
            ),
            F.expr(f"least({chunk_tokens}, size(__toks) - __start + 1)")
            .cast("int")
            .alias("n_tokens"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition ratios (the Gopher line/paragraph/
    token boilerplate filters, Rae et al. §A1.1): duplicate-line,
    duplicate-paragraph (blank-line-separated blocks, inner whitespace
    collapsed) and duplicate-token ratios, plus the line count. All
    built-ins; ngram_repetition_stats carries the n-gram coverage half
    of the family."""
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    paras = F.filter(
        F.transform(
            F.split(c, r"\n{2,}"),
            lambda x: F.regexp_replace(F.trim(x), r"\s+", " "),
        ),
        lambda x: x != "",
    )
    toks = F.split(normalize_text(c), " ")
    n_lines = F.size(lines)
    n_paras = F.size(paras)
    n_toks = F.size(toks)
    return df.select(
        F.col(id_col),
        n_lines.cast("int").alias("n_lines"),
        (
            1.0
            - F.size(F.array_distinct(lines)).cast("double")
            / F.greatest(n_lines, F.lit(1))
        ).alias("dup_line_ratio"),
        (
            1.0
            - F.size(F.array_distinct(paras)).cast("double")
            / F.greatest(n_paras, F.lit(1))
        ).alias("dup_para_ratio"),
        (
            1.0
            - F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(n_toks, F.lit(1))
        ).alias("dup_token_ratio"),
    )


def ngram_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Gopher-style n-gram repetition coverage (Rae et al. 2021 §A1.1,
    the filters FineWeb/Dolma replicate): per document,

    - top{n}gram_char_frac (n in top_ns): character mass of the single
      most frequent n-gram (count x its joined character length) over
      the normalized text length — ties break to the lexicographically
      smallest n-gram, so the statistic is deterministic;
    - dup{n}gram_char_frac (n in dup_ns): character mass of ALL
      n-grams occurring more than once. Overlapping occurrences are
      NOT deduplicated (the simplified mass measure, documented —
      fractions can exceed 1 on degenerate loop text, which is exactly
      the signal the filter thresholds on).

    Docs too short for an n contribute 0.0 for that column; every
    input doc keeps a row.

    Scale shape: MAP-ONLY. Every statistic here depends on one
    document's own text alone, so nothing needs to leave its task: per
    n, the gram array is sorted in place and run-length encoded with
    array higher-order functions, the argmax / dup mass fold over the
    runs, and the whole query runs at scan speed with ZERO Exchanges
    (the previous shape exploded sum_n (T-n+1) ~ |ns| x tokens rows
    per doc through a two-shuffle postings aggregation — r15 removed
    both shuffles and the explode; exec 12.8 s -> map-only at sf0.1).

    Determinism is unchanged: sorted-run counts are exact; the argmax
    takes min over (-count, gram), and because runs arrive in
    ascending gram order the lexicographic tie-break is identical to
    the aggregation form. Dup-only n (no gram text needed) sorts
    (xxhash64(gram), length) structs instead of gram strings — cheaper
    long comparisons; equal grams always share a run, and a run merge
    needs an in-document xxhash64 collision, exactly the documented
    tolerance of the previous hash-grouped shuffle shape (~2^-64 per
    gram pair, and it would only perturb a mass sum)."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    if not all_ns:
        raise ValueError("ngram_repetition_stats: top_ns and dup_ns both empty")
    if any(n < 1 for n in all_ns):
        raise ValueError(f"ngram_repetition_stats: n must be >= 1, got {all_ns}")
    if id_col in ("total_chars", "g", "__toks", "__n", "__gram", "__cnt"):
        raise ValueError(
            f"ngram_repetition_stats: id_col {id_col!r} collides with an "
            "internal column name; rename it first"
        )
    top_set = set(top_ns)
    c = F.col(text_col)
    toks = F.split(normalize_text(c), " ")

    def _grams(n: int) -> str:
        return (
            f"transform(sequence(0, size(__toks) - {n}), "
            f"i -> array_join(slice(__toks, i + 1, {n}), ' '))"
        )

    # stage 1: per n, the sorted gram array (strings when the argmax
    # needs gram text, (hash, length) structs for dup-only n). The
    # size guard matters: sequence(0, size - n) DESCENDS when the doc
    # is shorter than n.
    sorted_cols = []
    for n in all_ns:
        if n in top_set:
            body = f"array_sort({_grams(n)})"
            empty = "CAST(array() AS array<string>)"
        else:
            body = (
                f"array_sort(transform({_grams(n)}, "
                "g -> named_struct('gh', xxhash64(g), 'gl', length(g))))"
            )
            empty = "CAST(array() AS array<struct<gh:bigint,gl:int>>)"
        sorted_cols.append(
            F.when(F.size(F.col("__toks")) >= n, F.expr(body))
            .otherwise(F.expr(empty))
            .alias(f"__s{n}")
        )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.length(normalize_text(c)).alias("total_chars"),
    ).select(F.col(id_col), F.col("total_chars"), *sorted_cols)

    # stage 2: run starts — indices where the sorted array changes
    # value. Separate projection stages keep CollapseProject from
    # inlining (and re-evaluating) the expensive sort/filter aliases
    # at each use site.
    start_cols = [
        F.expr(
            f"CASE WHEN size(__s{n}) = 0 THEN array() "
            f"ELSE filter(sequence(0, size(__s{n}) - 1), "
            f"i -> i = 0 OR __s{n}[i] != __s{n}[i - 1]) END"
        ).alias(f"__p{n}")
        for n in all_ns
    ]
    runs = base.select("*", *start_cols)

    def _cnt(n: int, j: str = "j") -> str:
        # occurrences in run j: next start (or array end) minus start
        return (
            f"(CASE WHEN {j} + 1 < size(__p{n}) THEN __p{n}[{j} + 1] "
            f"ELSE size(__s{n}) END) - __p{n}[{j}]"
        )

    # stage 3: fold the runs. Argmax = min over (-count, gram): runs
    # are in ascending gram order, count desc / gram asc — identical
    # tie-break to the former aggregation. Counts are BIGINT to match
    # the former count() type in the mass arithmetic.
    stat_cols = []
    for n in top_ns:
        stat_cols.append(
            F.expr(
                f"CASE WHEN size(__p{n}) = 0 THEN NULL ELSE "
                f"array_min(transform(sequence(0, size(__p{n}) - 1), "
                f"j -> named_struct("
                f"'nc', -CAST(({_cnt(n)}) AS BIGINT), "
                f"'gram', __s{n}[__p{n}[j]], "
                f"'cl', length(__s{n}[__p{n}[j]])))) END"
            ).alias(f"__top{n}")
        )
    for n in dup_ns:
        gl = f"length(__s{n}[__p{n}[j]])" if n in top_set else f"__s{n}[__p{n}[j]].gl"
        stat_cols.append(
            F.expr(
                f"CASE WHEN size(__p{n}) = 0 THEN CAST(0 AS BIGINT) ELSE "
                f"aggregate(sequence(0, size(__p{n}) - 1), CAST(0 AS BIGINT), "
                f"(acc, j) -> acc + IF(({_cnt(n)}) >= 2, "
                f"CAST(({_cnt(n)}) AS BIGINT) * {gl}, CAST(0 AS BIGINT))) END"
            ).alias(f"__dup{n}")
        )
    feats = runs.select(F.col(id_col), F.col("total_chars"), *stat_cols)

    denom = F.greatest(F.col("total_chars"), F.lit(1))
    frac_cols = []
    for n in top_ns:
        t = F.col(f"__top{n}")
        frac_cols.append(
            F.coalesce(
                ((-t["nc"]) * t["cl"]).cast("double") / denom, F.lit(0.0)
            ).alias(f"top{n}gram_char_frac")
        )
    for n in dup_ns:
        frac_cols.append(
            F.coalesce(
                F.col(f"__dup{n}").cast("double") / denom, F.lit(0.0)
            ).alias(f"dup{n}gram_char_frac")
        )
    # Generate barrier (the ivf_assign/text_stats discipline): emit the
    # fracs through explode(array(struct)) so a downstream predicate or
    # projection references the generated attribute. Without it,
    # predicate pushdown SUBSTITUTES these aliases into the pushed
    # condition and the whole sort/run chain re-evaluates once per
    # reference (pipeline_fineweb's threshold filter did exactly that).
    barred = feats.select(
        F.col(id_col), F.explode(F.array(F.struct(*frac_cols))).alias("__nr")
    )
    names = [f"top{n}gram_char_frac" for n in top_ns] + [
        f"dup{n}gram_char_frac" for n in dup_ns
    ]
    return barred.select(
        F.col(id_col), *[F.col(f"__nr.{c}").alias(c) for c in names]
    )


def c4_line_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style line-level cleanup (Raffel et al. 2020 §2.2): keep a
    line only if it (1) ends in terminal punctuation (. ! ? or a
    closing quote), (2) has at least `min_words` words, (3) contains
    no curly brace, (4) doesn't mention "lorem ipsum" and (5) doesn't
    mention "javascript" (substring match — a documented
    simplification of C4's word match). Lines are trimmed and
    inner-whitespace-collapsed first; empty lines never count as
    dropped. Returns per doc: the rebuilt text (kept lines joined by
    newlines), kept/dropped line counts, a sentence count over the
    cleaned text (terminal-punctuation occurrences — C4's own proxy),
    and C4's page rule keep = n_sentences >= min_sentences.

    Everything is JVM array/string expressions on a single scan — no
    shuffle, no Python — so this runs at full scan speed on 100 TB and
    composes with exact_dedup/duplicate_spans for C4's three-sentence
    span dedup stage."""
    c = F.col(text_col)
    lines = F.filter(
        F.transform(
            F.split(c, r"\n"),
            lambda x: F.regexp_replace(F.trim(x), r"\s+", " "),
        ),
        lambda x: x != "",
    )

    def _line_ok(x):
        low = F.lower(x)
        return (
            F.substring(x, -1, 1).isin(".", "!", "?", '"')
            & (F.size(F.split(x, " ")) >= min_words)
            & ~x.contains("{")
            & ~x.contains("}")
            & ~low.contains("lorem ipsum")
            & ~low.contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.split(clean, r"[.!?]")) - 1
    return df.select(
        F.col(id_col),
        clean.alias("text_clean"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_lines_dropped"),
        n_sent.cast("int").alias("n_sentences"),
        (n_sent >= min_sentences).alias("keep"),
    )


# Gopher's stop-word presence list (Rae et al. 2021 §A1.1): a page
# must contain at least two of these to survive the filter.
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_word_hits: int = 2,
) -> DataFrame:
    """The remaining Gopher quality heuristics (Rae et al. 2021 §A1.1,
    VERDICT r9 #5) as scan-side columns beside c4_line_filters and
    ngram_repetition_stats — the document-shape filters FineWeb/Dolma
    replicate:

    - symbol_word_ratio: (count of '#' + count of U+2026 + count of
      non-overlapping '...') / words — Gopher drops pages over 0.1;
    - bullet_line_frac: fraction of (trimmed, non-empty) lines whose
      first character is a bullet ('-', '*', U+2022) — drop over 0.9;
    - ellipsis_line_frac: fraction of lines ending in '...' or U+2026
      — drop over 0.3;
    - alpha_word_frac: fraction of words containing at least one
      [a-zA-Z] character — drop under 0.8;
    - stop_word_hits: how many DISTINCT words of Gopher's eight-word
      stop list appear as whole lowercase tokens — drop under 2.

    `keep` ANDs the five thresholds (knobs above, Gopher's defaults).
    Lines are trimmed/whitespace-collapsed and empty lines dropped
    (the c4_line_filters convention); words are whitespace tokens of
    the raw text, lowercased once (the alpha test is case-invariant,
    so one lowercased array serves both it and the stop list). Every
    statistic is integer counting plus one final division, all
    single-scan JVM expressions — no shuffle, no Python, no UDF: on
    100 TB this annotates at full scan speed and composes with the
    other filters in one projection (pipeline_fineweb's shape). The
    line/word arrays are materialized through an explode(array(...))
    Generate barrier so Catalyst cannot re-inline the splits into
    every consumer (the CollapseProject hazard documented in dedup.py
    — the stop list alone has eight consumers). Denominators floor at
    1 so empty docs score 0 ratios and keep=false (stop_word_hits=0)
    rather than erroring."""
    c = F.col(text_col)
    lines_expr = (
        f"filter(transform(split({text_col}, '\\n'), "
        f"x -> regexp_replace(trim(x), '\\\\s+', ' ')), x -> x != '')"
    )
    words_expr = (
        f"filter(transform(split(regexp_replace(trim({text_col}), "
        f"'\\\\s+', ' '), ' '), x -> lower(x)), x -> x != '')"
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_uell = F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    n_dell = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    base = df.select(
        F.col(id_col),
        (n_hash + n_uell + n_dell).cast("double").alias("__sym"),
        F.explode(
            F.array(
                F.struct(
                    F.expr(lines_expr).alias("l"), F.expr(words_expr).alias("w")
                )
            )
        ).alias("__g"),
    )
    n_words = F.expr("size(__g.w)")
    n_lines = F.expr("size(__g.l)")
    bullet_lines = F.expr(
        "size(filter(__g.l, x -> substring(x, 1, 1) IN ('-', '*', '•')))"
    )
    ellipsis_lines = F.expr(
        "size(filter(__g.l, x -> x LIKE '%...' OR x LIKE '%…'))"
    )
    alpha_words = F.expr("size(filter(__g.w, x -> x RLIKE '[a-z]'))")
    stop_hits = None
    for w in _GOPHER_STOPS:
        term = F.expr(
            f"CASE WHEN array_contains(__g.w, '{w}') THEN 1 ELSE 0 END"
        )
        stop_hits = term if stop_hits is None else stop_hits + term
    wden = F.greatest(n_words, F.lit(1)).cast("double")
    lden = F.greatest(n_lines, F.lit(1)).cast("double")
    out = base.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        n_lines.cast("int").alias("n_lines"),
        (F.col("__sym") / wden).alias("symbol_word_ratio"),
        (bullet_lines.cast("double") / lden).alias("bullet_line_frac"),
        (ellipsis_lines.cast("double") / lden).alias("ellipsis_line_frac"),
        (alpha_words.cast("double") / wden).alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_word_hits"),
    )
    return out.withColumn(
        "keep",
        (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stop_word_hits") >= min_stop_word_hits),
    )


def text_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprints: md5 of the normalized text plus the
    min/max of rolling k-gram hashes (winnowing-style, robust to small
    edits; public scheme, Schleimer et al.).

    Built explode->aggregate (see operators.dedup module docstring for
    why: Catalyst would otherwise re-run the normalize regexp per
    k-gram position inside a lambda)."""
    k = 8
    posts = (
        df.select(F.col(id_col).alias("id"), normalize_text(text_col).alias("__norm"))
        .select(
            "id",
            "__norm",
            F.explode(
                F.expr(f"sequence(1, greatest(1, length(__norm) - {k - 1}))")
            ).alias("i"),
        )
        .select("id", F.xxhash64(F.expr(f"substring(__norm, i, {k})")).alias("gh"))
    )
    mins = posts.groupBy("id").agg(
        F.min("gh").alias("winnow_min"), F.max("gh").alias("winnow_max")
    )
    md5s = df.select(
        F.col(id_col).alias("id"), F.md5(normalize_text(text_col)).alias("md5_fp")
    )
    return (
        md5s.join(mins, "id")
        .select("id", "md5_fp", "winnow_min", "winnow_max")
        .withColumnRenamed("id", id_col)
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    training-sequence id under a fixed token budget (the step that
    turns a cleaned corpus into fixed-length pretraining rows).

    Documents are dealt into `n_shards` streams by an md5 shard key
    (engine-portable, like operators.sampling), concatenated in
    deterministic (shard, id) order, and chunked every `budget` tokens:
    a document belongs to the pack where it STARTS (standard
    concat-then-chunk packing — the tokenizer later splits any straddle
    across the boundary). Output: (id, n_tokens, shard, pack_id,
    pack_offset) — pack_offset is the document's start position inside
    its pack, so a downstream writer can materialize sequences without
    re-scanning order.

    Scale: ONE shuffle (hash on shard) + a per-shard sort window;
    n_shards bounds parallelism and is part of the deterministic
    layout, so fix it per corpus version (not per cluster size) — 32
    shards x ~corpus/32 tokens each; raise it for very large corpora.
    """
    from pyspark.sql.window import Window

    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    return (
        df.select(
            F.col(id_col),
            token_count(text_col).cast("long").alias("n_tokens"),
            shard.alias("shard"),
        )
        .select(id_col, "n_tokens", "shard", start)
        .select(
            id_col,
            "n_tokens",
            "shard",
            F.floor(F.col("__start") / budget).cast("long").alias("pack_id"),
            (F.col("__start") % budget).cast("long").alias("pack_offset"),
        )
    )


def pack_materialize(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Materialize the packs pack_sequences assigns: one row per
    (shard, pack_id) holding the actual token sequence — (shard,
    pack_id, n_tokens, tokens array<string>). Every row carries exactly
    `budget` tokens except each shard's final (tail) pack.

    Same deterministic layout as pack_sequences (identical shard key,
    (shard, id) concat order, whitespace tokens of the trimmed text) —
    the two are consistency-tested against each other: a document
    assigned (pack_id, pack_offset) finds its first token at exactly
    that offset of that pack.

    Scale: the start-position window is one hash shuffle on shard; the
    per-token explode then feeds a groupBy (shard, pack_id) whose
    map-side partial aggregation assembles each pack WITHIN its shard
    partition (a pack never spans shards), so the second exchange moves
    one budget-bounded token array per pack — the output itself, no
    token-granular shuffle. No driver collection, no Python UDFs.
    """
    from pyspark.sql.window import Window

    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = Window.partitionBy("shard").orderBy(id_col)
    base = (
        df.select(F.col(id_col), shard.alias("shard"), toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .withColumn("__start", F.sum("__n").over(w) - F.col("__n"))
    )
    tokens = base.select(
        "shard",
        "__start",
        F.posexplode("__toks").alias("__pos", "tok"),
    ).select(
        "shard",
        (F.col("__start") + F.col("__pos")).alias("__g"),
        "tok",
    )
    return (
        tokens.groupBy(
            "shard", F.floor(F.col("__g") / budget).cast("long").alias("pack_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((F.col("__g") % budget).alias("o"), "tok"))
                ),
                lambda x: x["tok"],
            ).alias("tokens"),
        )
        .select("shard", "pack_id", "n_tokens", "tokens")
    )


def pack_best_fit(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 32,
    salt: str = "pack",
    long_docs: str = "error",
) -> DataFrame:
    """DOCUMENT-INTEGRITY sequence packing: assign every document to a
    training pack without ever splitting it across a pack boundary —
    the complement of pack_sequences' concat-then-chunk (which has
    zero padding but splits documents mid-text). Packs are filled by
    best-fit-decreasing bin packing inside deterministic md5 shards:
    docs sort (n_tokens desc, id asc) and each goes into the bin with
    the LEAST remaining room that still fits (ties -> lowest pack id),
    the classic BFD heuristic (<= 11/9 OPT + 1 bins). Output one row
    per doc: (id, n_tokens, shard, pack_id, pack_offset); materialize
    by joining text back on id and grouping by (shard, pack_id) with
    pack_offset as the in-pack order.

    long_docs: a document longer than `budget` cannot pack whole —
    "error" (default) raises with the offending count; "drop" excludes
    them (pre-chunk with token_chunks when they should be kept).

    Determinism contract: shard membership is md5(salt || id), the BFD
    order is (n_tokens desc, id asc), and the fit search picks the
    smallest sufficient remainder with lowest-pack-id ties — the
    layout is a pure function of (salt, ids, lengths), invariant under
    input partitioning (test-pinned), exactly like pack_sequences.

    Scale shape: ONE hash shuffle on the shard key, then a per-shard
    Arrow-batched pandas pass over (id, n_tokens) PAIRS ONLY — the
    text never enters the packing state, so a shard's working set is
    ~16 bytes/doc plus an O(budget) bucket table (1e8 docs/shard ~=
    1.6 GB; size n_shards so shards fit an executor, and fix it per
    corpus version — the layout, not the cluster, owns it). The fit
    search buckets open packs by remaining capacity with a Fenwick
    tree over [0, budget]: a binary-lifting descent answers the
    smallest-sufficient-remainder query in one O(log budget) pass, so
    placement is ~2 log(budget) tree steps per doc — never the
    O(open_packs) memmove a sorted-list search would cost. Token
    arrays only move in the caller's materialization join, shuffling
    budget-bounded groups like pack_materialize."""
    if long_docs not in ("error", "drop"):
        raise ValueError(
            f"long_docs must be 'error' or 'drop', got {long_docs!r}"
        )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    sized = df.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        shard.alias("shard"),
    )
    if long_docs == "error":
        n_over = sized.filter(F.col("n_tokens") > budget).count()
        if n_over:
            raise ValueError(
                f"pack_best_fit: {n_over} document(s) exceed budget="
                f"{budget}; pre-chunk them (token_chunks) or pass "
                "long_docs='drop'"
            )
    else:
        sized = sized.filter(F.col("n_tokens") <= budget)

    id_name = id_col  # close over plain strings, not Columns

    def _pack(pdf):
        import heapq

        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", id_name], ascending=[False, True]
        ).reset_index(drop=True)
        # Open packs bucketed by REMAINING capacity: buckets[r] is a
        # min-heap of pack ids with exactly r tokens of room, and a
        # Fenwick tree over bucket occupancy answers "smallest r >= n
        # with a non-empty bucket" in O(log budget) — the best-fit
        # query — so placement is O(log budget) per doc instead of the
        # O(open_packs) memmove a sorted-list bisect would pay. Ties
        # (several packs at the same remainder) resolve to the lowest
        # pack id via the heap, matching the sequential reference.
        size = budget + 2
        tree = [0] * size  # Fenwick over remainders 1..budget+1 (1-based r+1)
        buckets: list[list[int]] = [[] for _ in range(budget + 1)]

        def _add(pos: int, delta: int) -> None:
            pos += 1  # remainder r lives at tree position r+1 >= 1
            while pos < size:
                tree[pos] += delta
                pos += pos & -pos

        def _count_le(pos: int) -> int:
            pos += 1
            s = 0
            while pos > 0:
                s += tree[pos]
                pos -= pos & -pos
            return s

        top_bit = 1 << (size - 1).bit_length()

        def _smallest_at_least(n: int) -> int:
            """Smallest remainder r in [n, budget] with a non-empty
            bucket, or -1: one binary-lifting descent over the Fenwick
            (O(log budget) total — not a bisect of O(log) prefix
            queries). Finds the largest tree position whose prefix
            count is <= count(< n); the next position is the answer,
            and it is >= n automatically because prefix(n-1) equals
            that count exactly."""
            below = _count_le(n - 1) if n > 0 else 0
            if _count_le(budget) == below:
                return -1
            pos, rem, bit = 0, below, top_bit
            while bit:
                nxt = pos + bit
                if nxt < size and tree[nxt] <= rem:
                    pos, rem = nxt, rem - tree[nxt]
                bit >>= 1
            return pos  # tree position pos+1 <-> remainder pos

        n_bins = 0
        pack_ids, offsets = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            r = _smallest_at_least(n)
            if r >= 0:
                b = heapq.heappop(buckets[r])
                _add(r, -1)
                rem = r
            else:
                rem, b = budget, n_bins
                n_bins += 1
            pack_ids.append(b)
            offsets.append(budget - rem)
            heapq.heappush(buckets[rem - n], b)
            _add(rem - n, 1)
        out = pd.DataFrame(
            {
                id_name: pdf[id_name],
                "n_tokens": pdf["n_tokens"],
                "shard": pdf["shard"],
                "pack_id": pack_ids,
                "pack_offset": offsets,
            }
        )
        return out

    # the id column keeps its INPUT type (string/uuid ids pack exactly
    # like pack_sequences' — only lengths enter the packing state)
    id_type = sized.schema[id_name].dataType.simpleString()
    schema = (
        f"`{id_name}` {id_type}, n_tokens long, shard long, "
        "pack_id long, pack_offset long"
    )
    return sized.groupBy("shard").applyInPandas(_pack, schema)


# PII patterns: shared RE2-compatible subset (no backreferences or
# lookaround) so Spark (Java regex) and DuckDB (RE2) agree exactly —
# the property the oracle-gated query depends on. Order matters and is
# part of the contract: EMAIL first (may contain digits/dots), then IP
# (so the phone pattern can't eat dotted quads), then SSN (dashed
# 3-2-4 before the looser phone shape), then PHONE.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+\d{7,15}\b|\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for pretraining corpora: emails, IPv4 addresses,
    SSN-shaped ids and phone numbers replaced with typed placeholder
    tokens, plus per-category match counts (for corpus-level PII-rate
    reporting). Pure JVM regexp_replace/regexp_count chain — runs at
    scan speed, no shuffle, and the same patterns are streamable
    unchanged on a readStream (stateless projection).

    Counts are measured on the ORIGINAL text per category, in the
    fixed PII_PATTERNS order; replacements apply in that same order so
    an IP is never half-eaten by the phone pattern. Regexes use the
    RE2-compatible subset, so an ANSI oracle replays them exactly.
    """
    out = df
    redacted = F.col(text_col)
    counts = []
    for name, pat, _tok in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        )
    for name, pat, tok in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, tok)
    return out.select(
        F.col(id_col), redacted.alias("text_redacted"), *counts
    )


# markup stripping: fixed-order chain, RE2-compatible subset (inline
# (?s) dotall; non-greedy spans), so an ANSI oracle replays it exactly.
# Container blocks (script/style/comments) drop WITH their content
# before the generic tag sweep; entities decode after tags so a
# literal "&lt;p&gt;" in prose never becomes a strippable tag; &amp;
# decodes LAST (the standard double-decoding guard).
MARKUP_BLOCK_PATTERNS = [
    ("script", r"(?s)<script[^>]*>.*?</script>"),
    ("style", r"(?s)<style[^>]*>.*?</style>"),
    ("comment", r"(?s)<!--.*?-->"),
    ("tag", r"<[^>]+>"),
]
MARKUP_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def strip_markup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """HTML/markup stripping — the first stage of every web-crawl
    pipeline: script/style/comment blocks removed WITH their content,
    remaining tags swept, the six core entities decoded, whitespace
    collapsed. Returns (id, text_clean, n_tags, n_chars_raw,
    n_chars_clean); n_tags counts tag-shaped spans on the ORIGINAL
    text (corpus-level markup-rate reporting).

    Pure JVM regexp chain in a FIXED order (same discipline as
    redact_pii): scan-speed, no shuffle, stateless — streamable
    unchanged on a readStream. Patterns stay in the RE2-compatible
    subset so the DuckDB oracle replays the chain character-exactly.
    This is a tag stripper, not a browser: malformed/hostile HTML
    degrades to best-effort text, never an error."""
    cleaned = F.col(text_col)
    for _name, pat in MARKUP_BLOCK_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, " ")
    for ent, rep in MARKUP_ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(rep))
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return df.select(
        F.col(id_col),
        cleaned.alias("text_clean"),
        F.regexp_count(F.col(text_col), F.lit(r"<[^>]+>")).alias("n_tags"),
        F.length(F.col(text_col)).cast("int").alias("n_chars_raw"),
        F.length(cleaned).cast("int").alias("n_chars_clean"),
    )


# ------------------------------------------------------------------ vocab


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary with frequencies — the tokenizer-training
    precursor (count every whitespace token over the normalized text).
    Returns (token, freq) ordered by freq desc then token asc (a total
    deterministic order, so top_k is stable).

    At 100 TB: explode + groupBy(token) hash-aggregates with map-side
    combine, so the shuffle carries one row per DISTINCT token per map
    partition, not per occurrence; Zipf's law makes the combine rate
    extreme on the head. top_k uses the same TakeOrderedAndProject path
    as any LIMIT — no global sort of the vocabulary."""
    toks = F.split(normalize_text(text_col), " ")
    out = (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), "token")
    )
    return out.limit(top_k) if top_k is not None else out


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_token_len: int = 4,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf — keyword
    extraction / topic tagging over a pretraining corpus. Returns
    (id, token, tf, df, score, rank).

    The idf is the LOG-FREE variant score = tf * n_docs / df: ln() is
    libm-dependent and not bit-identical across engines, while integer
    products and one IEEE double division are — which keeps this
    hash-comparable against an ANSI oracle. Ranking is unchanged for
    any fixed df (monotone transform); ties break by token asc.

    At 100 TB: one explode + (doc, token) count for tf, one token-level
    re-aggregation for df (map-side combined, Zipf-compressed), one
    equi-join back on token (df relation is |vocab|-sized — broadcast
    when it fits), and a per-doc top-k window partitioned by doc id.
    Short/stopword-ish tokens are dropped by min_token_len BEFORE the
    shuffles, which removes the Zipf head — most of the data — from
    every downstream exchange."""
    from pyspark.sql.window import Window

    toks = F.split(normalize_text(text_col), " ")
    n_docs = df.count()  # one scalar to the driver: the corpus size
    term = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("token"))
        .filter(F.length("token") >= min_token_len)
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = term.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        term.join(docfreq, "token")
        .withColumn(
            "score", (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "token", "tf", "df", "score", "rank")
    )


def rarity_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    common_k: int = 1000,
) -> DataFrame:
    """Per-document token-rarity features against the corpus' own
    frequency distribution — the quality signal that catches what
    ratio heuristics (text_stats) miss: OCR noise, mojibake, and
    generated gibberish produce tokens nobody else uses, while
    boilerplate produces only head tokens. Returns per doc:

      n_distinct   distinct normalized tokens
      hapax_frac   fraction of its distinct tokens whose corpus
                   document frequency is 1 (this doc is their ONLY
                   user) — high = likely noise/garbage
      common_frac  fraction of its distinct tokens inside the corpus'
                   top `common_k` vocabulary (by df, ties broken on
                   token) — high = likely boilerplate
      mean_df      mean corpus document frequency of its distinct
                   tokens (double division of exact ints)

    All measures are integer counts and one double division, so a
    DuckDB oracle replays them bit-exactly — unlike perplexity-style
    scores that need a trained model and float log-sums.

    At 100 TB: postings = explode + distinct (map-side combined);
    token df = one hash aggregate (vocab-sized, Zipf head collapses in
    combine); the postings><df join is keyed on token — AQE's skew
    handling covers the head tokens — and the common-vocab membership
    is a broadcast of `common_k` rows. No driver collects."""
    posts = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    docfreq = posts.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps), never a single-partition global window sort
    common = (
        docfreq.orderBy(F.desc("df"), "token")
        .limit(common_k)
        .select("token", F.lit(True).alias("is_common"))
    )
    joined = posts.join(docfreq, "token").join(
        F.broadcast(common), "token", "left"
    )
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            (
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("hapax_frac"),
            (
                F.sum(F.when(F.col("is_common"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("common_frac"),
            (F.sum("df").cast("double") / F.count(F.lit(1))).alias("mean_df"),
        )
        .withColumnRenamed("id", id_col)
    )


def _adjacent_pairs(text_col: str, combine, elem_type: str):
    """Adjacent-token-pair array over normalized text, shared by the
    bigram LM operators (bigram_lm_stats / kneser_ney_bigram — one
    copy of the subtle guards so the two oracle-gated operators cannot
    desync). Pairs via zip_with over two shifted slices — NOT
    transform(sequence, i -> element_at(toks, i)): element_at
    re-evaluates the inlined split/filter per array slot (the
    documented HOF landmine, dedup.py module docstring), measured
    15.1 s -> 2.3 s warm at sf0.1. Instances keep their multiplicity —
    each occurrence is scored. Docs under 2 tokens need the explicit
    guard: Spark's sequence/slice forms reject or count down where
    DuckDB's generate_series is empty."""
    toks = F.filter(
        F.split(normalize_text(text_col), " "), lambda t: t != ""
    )
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            combine,
        ),
    ).otherwise(F.array().cast(f"array<{elem_type}>"))


def bigram_lm_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    surprisal: bool = False,
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document bigram language-model fluency features against the
    corpus's OWN bigram distribution — KenLM-style quality scoring
    without an external model. Token-rarity (rarity_stats) sees which
    WORDS are unusual; this sees which ADJACENCIES are: fluent prose
    reuses collocations the rest of the corpus also uses, while
    shuffled/generated/mojibake text produces word pairs nobody else
    writes even when every individual word is common. Docs with fewer
    than 2 tokens have no bigrams and produce no row.

    Exact outputs (integer counts + one double division, so a DuckDB
    oracle replays them bit-for-bit — same discipline as rarity_stats):

      n_bigrams      adjacent-pair instances in the doc
      known_frac     fraction of instances whose corpus count (incl.
                     this doc's own uses) >= min_count
      mean_bg_count  mean corpus count of the doc's bigram instances

    `surprisal=True` adds the real LM feature — mean add-k-smoothed
    negative log2 bigram probability ≈ log2-perplexity under a
    bigram-count model. log2 is NOT bit-portable across engines (JVM
    vs libm last-ulp drift), so it stays out of the oracle-gated
    column set and is pinned by a python-reference unit test instead
    (the md5-twin discipline, applied to floats).

    At 100 TB: bigram instances = one corpus-sized explode shuffled on
    the bigram key (head collocations are Zipf-skewed — AQE skew join
    handles them; counts collapse map-side); the instance><count join
    is bigram-keyed; the per-doc aggregate is integer-additive. The
    global (total, vocab) scalars for surprisal are a 1-row broadcast.
    No driver collects."""
    bigrams = _adjacent_pairs(
        text_col, lambda a, b: F.concat_ws(" ", a, b), "string"
    )
    posts = df.select(
        F.col(id_col).alias("id"), F.explode(bigrams).alias("bg")
    )
    counts = posts.groupBy("bg").agg(F.count(F.lit(1)).alias("bg_count"))
    joined = posts.join(counts, "bg")
    out = (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(
                    F.when(F.col("bg_count") >= min_count, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("known_frac"),
            (F.sum("bg_count").cast("double") / F.count(F.lit(1))).alias(
                "mean_bg_count"
            ),
        )
        .withColumnRenamed("id", id_col)
    )
    if not surprisal:
        return out
    totals = counts.agg(
        F.sum("bg_count").alias("bg_total"),
        F.count(F.lit(1)).alias("bg_vocab"),
    )
    scored = (
        joined.join(F.broadcast(totals))
        .withColumn(
            "nll",
            -F.log2(
                (F.col("bg_count") + F.lit(float(add_k)))
                / (F.col("bg_total") + F.lit(float(add_k)) * F.col("bg_vocab"))
            ),
        )
        .groupBy("id")
        .agg(F.avg("nll").alias("surprisal"))
        .withColumnRenamed("id", id_col)
    )
    return out.join(scored, id_col)


def vocabulary_partials(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Mergeable vocabulary state: per-token counts of ONE corpus slice
    (an ingest batch, a partition, a day). Counts are additive, so
    partials from any number of slices merge with vocabulary_merge —
    the incremental-vocabulary pattern: a growing corpus maintains its
    tokenizer-training counts at O(batch) per admission instead of
    rescanning the corpus (same economics as rollup.rollup_partials,
    which this is the text instantiation of)."""
    toks = F.split(normalize_text(text_col), " ")
    return (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def vocabulary_merge(*partials: DataFrame) -> DataFrame:
    """Merge vocabulary partials (token counts add). Associative and
    commutative, so any merge tree gives identical counts — merge
    daily partials into months, months into the corpus total."""
    if not partials:
        raise ValueError("need at least one partial")
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out.groupBy("token").agg(F.sum("freq").alias("freq"))


# ---------------------------------------------------------------- BPE


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    sample_fraction: float | None = None,
    salt: str = "bpe-v1",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn byte-pair-encoding merges from a corpus — tokenizer
    training as iterative Spark jobs. Returns the ordered merge list
    (the MODEL: n_merges pairs, legitimate driver state exactly like
    IVF centroids).

    Construction (Sennrich et al. 2016): training operates on the
    WORD-FREQUENCY table, not the corpus — unique normalized words
    with counts, each word a character-symbol array with an
    end-of-word marker. Per iteration: adjacent symbol pairs explode
    weighted by word freq, one map-side-combined groupBy finds the
    global best pair (ties broken (count desc, left asc, right asc) —
    fully deterministic), a 1-row collect takes it to the driver, and
    the merge applies to every word as a JVM fold (_fold_merge).

    At 100 TB: the word table is the Zipf-compressed corpus (~1e7-1e8
    unique words for 1e12 tokens), built with ONE pass over the text +
    one groupBy; all n_merges iterations run over the word table only.
    `sample_fraction` additionally md5-samples the corpus before the
    word count (standard practice — merge ranks stabilize long before
    full-corpus counts). localCheckpoint every `checkpoint_every`
    rounds truncates the iterative lineage, same as
    connected_components."""
    from chapterhousedb_spark.operators.sampling import deterministic_sample

    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    src = df
    if sample_fraction is not None:
        src = deterministic_sample(
            df.withColumn("__rid", F.monotonically_increasing_id()),
            sample_fraction,
            id_col="__rid",
            salt=salt,
        ).drop("__rid")
    words = (
        src.select(
            F.explode(F.split(normalize_text(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return bpe_train_from_words(
        words, n_merges, checkpoint_every=checkpoint_every
    )


# word tables at or below this row count are collected to the driver
# and trained with the incremental sequential algorithm (one Spark job
# total); larger tables use the iterative Spark path. A 1e6-row Zipf
# vocabulary is ~50 MB of driver memory — the same bounded-collect
# discipline as IVF centroids / z-order boundaries. Measured at sf0.1:
# the iterative path took 26 s for SIX merges (one explode+groupBy+
# 1-row-collect job per merge); the driver path trains the same six in
# well under a second after the single word-count job.
_BPE_DRIVER_MAX_WORDS = 1_000_000


def bpe_train_from_words(
    word_freqs: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    checkpoint_every: int = 8,
    driver_max_words: int = _BPE_DRIVER_MAX_WORDS,
    prune_to_cap: bool = False,
) -> list[tuple[str, str]]:
    """Learn BPE merges directly from a (word, freq) table — the
    INCREMENTAL tokenizer-training composition: maintain the word
    counts with vocabulary-style mergeable partials (token counts add;
    vocabulary_partials/vocabulary_merge are the same machinery over
    tokens), then retrain merges from the maintained table whenever
    needed — the corpus text is never rescanned. bpe_train is now a
    thin wrapper: word count + this. Same deterministic tie-break and
    identical results to training from the raw text (test-pinned).

    Two physical shapes, identical merges (test-pinned):
    - word table fits on the driver (<= driver_max_words, checked with
      a bounded limit+count, never an unguarded count of an unbounded
      relation): ONE Spark job collects the Zipf-compressed table and
      the classic sequential trainer with INCREMENTAL pair-count
      updates (Sennrich et al. 2016) learns all n_merges driver-side —
      O(touched symbols) per merge, not one Spark job per merge.
    - bigger tables: the iterative Spark path (per merge: pair explode
      weighted by freq, map-side-combined groupBy, 1-row collect,
      JVM merge fold), with localCheckpoint lineage truncation.
    At 100 TB the corpus is what's big, not the vocabulary — 1e12
    tokens compress to ~1e7-1e8 unique words, so production training
    is: one distributed word count, then (usually) the driver path
    over the compressed table. driver_max_words=0 forces the
    iterative path.

    prune_to_cap=True (VERDICT r9 #6) adds a FREQUENCY-FLOOR pre-prune
    when the table exceeds the cap: one job aggregates the frequency
    histogram (|distinct freqs| rows — O(sqrt(total_tokens)) under any
    Zipf-like law, a bounded collect), the smallest floor whose
    survivor count fits the cap is chosen, words below it drop, and
    the driver path trains the pruned table — so real corpora always
    take the one-job path and the per-merge-job fallback is reached
    only when even the single most-frequent class overflows the cap.
    This is an explicit approximation (hence opt-in, preserving the
    default's bit-determinism): a pruned word of frequency f and
    symbol length L contributes at most f*L to any pair count, so the
    total pruned mass M = sum(f*L) bounds every pair count's change —
    the learned merges are IDENTICAL whenever each step's winning
    margin (winner minus runner-up under the count-desc/left/right
    order) exceeds M, and can differ exactly when some step's margin
    is <= M. For a Zipf corpus and a 1e6 cap, M is the freq-1 tail —
    orders of magnitude below head pair counts. The no-shared-symbols
    special case (pruned words' pairs disjoint from survivors', each
    below the count-2 stop rule) changes NOTHING and is test-pinned."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    # persist BEFORE the driver-size probe (ADVICE r11 #3, the same
    # double-scan unigram_train_from_words had): word_freqs is usually
    # an upstream word-count aggregation, and unpersisted the probe ran
    # that full groupBy once for the limit+count and then again for the
    # collect / histogram / checkpoint action of whichever path won.
    wf = word_freqs.select(
        F.col(word_col).alias("w"), F.col(freq_col).cast("long").alias("f")
    ).persist()
    try:
        if driver_max_words > 0:
            probe = wf.limit(driver_max_words + 1).count()
            if probe <= driver_max_words:
                rows = wf.collect()
                return _bpe_train_driver(
                    [(r["w"], int(r["f"])) for r in rows], n_merges
                )
            if prune_to_cap:
                hist = (
                    wf.groupBy("f")
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .orderBy(F.col("f").desc())
                    .collect()
                )
                total, floor = 0, None
                for r in hist:
                    if total + r["__n"] > driver_max_words:
                        break
                    total += r["__n"]
                    floor = r["f"]
                if floor is not None:
                    rows = wf.filter(F.col("f") >= floor).collect()
                    return _bpe_train_driver(
                        [(r["w"], int(r["f"])) for r in rows], n_merges
                    )
                # even the top frequency class overflows the cap — the
                # iterative path below is the only exact option left
        words = wf.select(
            # chars + </w> end-of-word marker (classic BPE: merges never
            # cross word boundaries; the marker lets suffixes merge)
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("syms"),
            F.col("f").alias("freq"),
        ).localCheckpoint(eager=True)
    finally:
        # words is eagerly checkpointed above, so the cache is done
        # serving both the probe and the winning path
        wf.unpersist()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> named_struct('l', s, 'r', syms[i + 1]))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not top or top[0]["n"] < 2:
            break  # nothing left worth merging
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        # Column-based fold: left/right become parameterized literals
        # (implicit lit), never SQL string interpolation — symbols
        # containing quotes OR backslashes train correctly (ADVICE r7).
        words = words.select(
            _fold_merge(F.col("syms"), left, right).alias("syms"),
            "freq",
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges



def _bpe_train_driver(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Sequential BPE training with incremental pair-count updates
    over a collected (word, freq) list — bit-identical merges to the
    iterative Spark path (same tie-break: count desc, left asc, right
    asc; same stop rule: best pair count < 2). Per merge, only the
    words CONTAINING the merged pair are re-segmented and only their
    pair counts adjusted (a pair -> word-index inverted index keeps
    the touched set exact) — the classic fast trainer."""
    from collections import Counter, defaultdict

    vocab: list[list[str]] = []
    freqs: list[int] = []
    for w, f in word_freqs:
        vocab.append(list(w) + ["</w>"])
        freqs.append(f)

    def word_pairs(syms: list[str]) -> Counter:
        c: Counter = Counter()
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += 1
        return c

    pair_counts: Counter = Counter()
    index: defaultdict = defaultdict(set)  # pair -> {word idx}
    for wi, syms in enumerate(vocab):
        for pair, k in word_pairs(syms).items():
            pair_counts[pair] += k * freqs[wi]
            index[pair].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_key = None
        for pair, n in pair_counts.items():
            if n < 2:
                continue
            key = (-n, pair[0], pair[1])
            if best_key is None or key < best_key:
                best, best_key = pair, key
        if best is None:
            break
        merges.append(best)
        left, right = best
        fused = left + right
        for wi in list(index[best]):
            syms = vocab[wi]
            f = freqs[wi]
            old = word_pairs(syms)
            out, i = [], 0
            n_syms = len(syms)
            while i < n_syms:
                if (
                    i + 1 < n_syms
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[wi] = out
            new = word_pairs(out)
            for pair in old.keys() | new.keys():
                delta = (new.get(pair, 0) - old.get(pair, 0)) * f
                if delta:
                    pair_counts[pair] += delta
                    if pair_counts[pair] <= 0:
                        del pair_counts[pair]
                if new.get(pair, 0):
                    index[pair].add(wi)
                elif pair in index:
                    index[pair].discard(wi)
        pair_counts.pop(best, None)
        index.pop(best, None)
    return merges


# above this many merges, bpe_segment switches from the composed JVM
# fold (plan size AND eval cost grow linearly with len(merges)) to
# the broadcast pandas path (plan size constant). Measured (SCALE.md):
# at sf0.01 the walls cross between 8 and 32 merges (JVM 1.9s @ 8 /
# 4.7s @ 32 / 7.3s @ 64 vs pandas ~0.24s warm), and on sf0.1's larger
# documents pandas already wins 4.5x at SIX merges (9.7s vs 2.2s to a
# parquet sink — the fold pays per merge PER CHARACTER, the pandas
# memo pays once per unique word). A production ~30k-merge vocabulary
# would explode the Catalyst plan (codegen limits) long before the
# linear eval cost even matters. 4 keeps the dependency-free JVM form
# for tiny/oracle-sized lists only.
_BPE_JVM_MAX_MERGES = 4


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    use_pandas: bool | None = None,
) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, tokens array,
    n_tokens), each word segmented by replaying the merges in learned
    order. Two physical shapes with identical output (test-pinned):

    - JVM fold (len(merges) <= _BPE_JVM_MAX_MERGES): the whole merge
      chain is one composed expression per row — no Python, exact,
      dependency-free, but the Catalyst plan grows with the merge
      count (unusable at a production ~30k-merge vocabulary).
    - Broadcast pandas (the production shape, VERDICT r7 #2): the
      rank table ships once per executor via sc.broadcast; an
      Arrow-batched mapInPandas segments each word by greedily
      merging the lowest-RANK adjacent pair (the classic GPT-2 apply
      loop) with a per-word memo — Zipf reuse makes the amortized
      cost per token tiny. Plan size is constant in len(merges).

    Rank-greedy == in-order replay for any TRAINED merge list: a
    merge can only create adjacencies involving its new symbol, and
    training can only learn pairs over symbols that already existed
    at that step — so applying a later merge never re-enables an
    earlier one, and both orders fix the same set of merges.
    (For arbitrary hand-written lists violating that invariant the
    two can differ; trained lists are the contract.)

    Either path is shuffle-free and embarrassingly parallel — at
    100 TB, segmentation cost is one corpus scan; the rank table for
    a 50k vocab is ~2 MB broadcast."""
    if use_pandas is None:
        use_pandas = len(merges) > _BPE_JVM_MAX_MERGES
    if not use_pandas:
        return df.select(
            F.col(id_col),
            F.flatten(
                F.transform(
                    # drop empty words (blank/empty text) — the
                    # sequential reference and the pandas path both
                    # skip them rather than emit a bare '</w>'
                    F.filter(
                        F.split(normalize_text(text_col), " "),
                        lambda w: w != "",
                    ),
                    lambda w: _apply_merges_lambda(w, merges),
                )
            ).alias("tokens"),
        ).select(
            id_col,
            "tokens",
            F.size("tokens").cast("int").alias("n_tokens"),
        )
    return _bpe_segment_pandas(df, merges, text_col, id_col)


def _bpe_segment_pandas(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Broadcast-rank pandas segmentation (see bpe_segment). The text
    is normalized and word-split JVM-SIDE (identical semantics to the
    JVM path — Java regex \\s+, JVM lower()); only the per-word merge
    replay crosses into Python, Arrow-batched."""
    from typing import Iterator

    import pandas as pd

    if id_col in ("tokens", "n_tokens"):
        raise ValueError(
            f"bpe_segment: id_col={id_col!r} collides with an output "
            f"column; rename the id column first"
        )
    spark = df.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )
    src = df.select(
        F.col(id_col).alias("__id"),
        F.split(normalize_text(text_col), " ").alias("__words"),
    )
    # a StructType built from the projected id field — NOT a DDL string
    # (string surgery breaks on id columns that collide with the output
    # names, need quoting, or whose type string contains the
    # placeholder; ADVICE r8)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(
                id_col,
                src.schema.fields[0].dataType,
                src.schema.fields[0].nullable,
            ),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = ranks_bc.value
        inf = float("inf")
        memo: dict[str, list[str]] = {}

        def seg_word(word: str) -> list[str]:
            got = memo.get(word)
            if got is not None:
                return got
            syms = list(word) + ["</w>"]
            while len(syms) > 1:
                best, best_rank = None, inf
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]), inf)
                    if r < best_rank:
                        best, best_rank = (syms[i], syms[i + 1]), r
                if best is None:
                    break
                left, right = best
                out, i = [], 0
                n = len(syms)
                while i < n:
                    if (
                        i + 1 < n
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[word] = syms
            return syms

        for pdf in batches:
            toks = [
                [t for w in words if w for t in seg_word(w)]
                for words in pdf["__words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf["__id"].values,
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return src.mapInPandas(_segment, out_schema)


def _apply_merges_lambda(word_col: Column, merges: list[tuple[str, str]]):
    """Compose the merge folds over one word column (lambda-friendly)."""
    syms = F.concat(F.split(word_col, ""), F.array(F.lit("</w>")))
    out = syms
    for left, right in merges:
        out = _fold_merge(out, left, right)
    return out


def _fold_merge(arr: Column, left: str, right: str) -> Column:
    """One merge step over an array column: merges every
    non-overlapping adjacent (left, right) occurrence left-to-right.
    left/right are parameterized as implicit literals (no SQL string
    interpolation — safe for symbols containing quotes/backslashes)."""
    empty = F.array().cast("array<string>")
    acc0 = F.struct(
        empty.alias("out"), F.lit(None).cast("string").alias("prev")
    )

    def step(acc, x):
        fuse = (acc["prev"] == left) & (x == right)
        return F.when(
            acc["prev"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("prev")),
        ).otherwise(
            F.when(
                fuse,
                F.struct(
                    F.concat(
                        acc["out"], F.array(F.concat(acc["prev"], x))
                    ).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    x.alias("prev"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(arr, acc0, step, finish)


# ------------------------------------------------------- unigram LM tokenizer
# SentencePiece-style unigram language-model tokenizer (Kudo 2018,
# "Subword Regularization") — the OTHER tokenizer family real
# pretraining stacks use beside BPE (VERDICT r10 #4). Training is
# hard-EM (Viterbi E-step) with iterative vocabulary pruning:
#
#   seed      all frequent substrings (len <= max_piece_len) of the
#             Zipf-compressed word table + every single character;
#   E-step    best (Viterbi) segmentation of each word under the
#             current piece log-probs; usage[piece] += word freq per
#             occurrence on the best path — INTEGER sums, so the
#             distributed reduce is order-free and bit-exact;
#   M-step    logp = ln(usage) - ln(total) (driver-side math.log on
#             the exact integer counts; single characters floored at
#             usage 1 so the fallback alphabet never hits ln(0));
#   prune     keep the top shrink-fraction of multi-char pieces by
#             (usage desc, piece asc) — single chars are NEVER pruned
#             (coverage guarantee) — and repeat until vocab_size.
#
# Kudo's full algorithm computes expected counts (forward-backward)
# and prunes by likelihood loss; hard EM with usage pruning is the
# deterministic simplification that keeps every reduction integer —
# which is what makes the distributed path == sequential reference
# BIT-exact (the bpe_train discipline, test-pinned). Documented
# honestly as such.


def _uni_viterbi(
    word: str,
    logp: dict,
    max_len: int,
    unk_logp: float = -20.0,
) -> tuple[list, float]:
    """Best segmentation of one word under piece log-probs: classic
    lattice DP. dp[i] = best score of word[:i]; candidates iterate
    start position j ASCENDING (longest piece first) with a strict-'>'
    update, so ties deterministically keep the longest piece. A
    position no piece reaches falls back to a single UNK character at
    unk_logp (training never hits this — every training char is
    seeded; segment-time unseen chars do). Pure python floats, same
    arithmetic on every path (driver, executor, sequential reference)."""
    n = len(word)
    neg_inf = float("-inf")
    dp = [neg_inf] * (n + 1)
    back = [0] * (n + 1)
    dp[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or dp[j] == neg_inf:
                continue
            s = dp[j] + lp
            if s > dp[i]:
                dp[i] = s
                back[i] = j
        if dp[i] == neg_inf:
            dp[i] = dp[i - 1] + unk_logp
            back[i] = i - 1
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces, dp[n]


def _uni_m_step(vocab: set, usage: dict) -> dict:
    """New log-probs from integer usage counts: multi-char pieces with
    zero usage DROP (hard EM), single chars floor at 1 (the coverage
    alphabet must stay scoreable). Deterministic: plain dict of exact
    ints -> math.log driver-side."""
    import math

    kept = {}
    for p in vocab:
        u = usage.get(p, 0)
        if len(p) == 1:
            u = max(u, 1)
        if u > 0:
            kept[p] = u
    total = sum(kept.values())
    lt = math.log(total)
    return {p: math.log(u) - lt for p, u in kept.items()}


_UNI_MAX_PIECE_LEN_DEFAULT = 6


def _uni_seed_counts(word_freqs: list, max_piece_len: int) -> dict:
    """Substring counts (all lengths 1..max_piece_len) from a
    (word, freq) list — the sequential seed; the distributed path
    computes the same integer counts with explode+groupBy."""
    counts: dict = {}
    for w, f in word_freqs:
        n = len(w)
        for L in range(1, min(n, max_piece_len) + 1):
            for i in range(n - L + 1):
                piece = w[i : i + L]
                counts[piece] = counts.get(piece, 0) + f
    return counts


def _uni_train_loop(
    chars: set,
    seed_counts: dict,
    vocab_size: int,
    em_iters: int,
    shrink: float,
    e_step,
) -> list:
    """The shared EM + prune controller: e_step(logp_dict) -> integer
    usage dict is the ONLY pluggable part (sequential loop or Spark
    job), so the two physical paths share every float op and every
    tie rule — bit-parity by construction, then test-pinned."""
    import math

    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    if vocab_size < len(chars) + 1:
        raise ValueError(
            f"vocab_size={vocab_size} cannot cover the {len(chars)}-char "
            "alphabet plus at least one multi-char piece"
        )
    seed_cap = max(0, 4 * vocab_size - len(chars))
    multis = sorted(
        (p for p in seed_counts if len(p) > 1 and seed_counts[p] >= 2),
        key=lambda p: (-seed_counts[p], p),
    )[:seed_cap]
    vocab = chars | set(multis)
    total = sum(seed_counts[p] for p in vocab)
    lt = math.log(total)
    logp = {p: math.log(seed_counts[p]) - lt for p in vocab}
    while True:
        for _ in range(em_iters):
            usage = e_step(logp)
            logp = _uni_m_step(set(logp), usage)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target = vocab_size - len(chars)
        if n_multi <= target:
            break
        keep_n = max(target, int(shrink * n_multi))
        if keep_n >= n_multi:
            keep_n = n_multi - 1
        kept_multis = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-usage.get(p, 0), p),
        )[:keep_n]
        vocab = {p for p in logp if len(p) == 1} | set(kept_multis)
        logp = {p: lp for p, lp in logp.items() if p in vocab}
    return sorted(logp.items())


def unigram_train_from_words(
    word_freqs: DataFrame,
    vocab_size: int,
    word_col: str = "word",
    freq_col: str = "freq",
    max_piece_len: int = _UNI_MAX_PIECE_LEN_DEFAULT,
    em_iters: int = 2,
    shrink: float = 0.75,
    driver_max_words: int = _BPE_DRIVER_MAX_WORDS,
) -> list:
    """Train a unigram-LM tokenizer from a (word, freq) table.
    Returns the MODEL: sorted list of (piece, logp) — driver state
    exactly like BPE merges / IVF centroids.

    Two physical shapes, bit-identical models (test-pinned, the
    bpe_train_from_words discipline):
    - table fits on the driver (<= driver_max_words, bounded
      limit+count probe): collect once, sequential hard-EM Kudo loop.
    - bigger tables: same controller, but each E-step is ONE Spark
      job — broadcast the current piece log-probs (model-sized, like
      segmenting), Arrow-batched mapInPandas runs the same
      _uni_viterbi per word and emits (piece, freq) uses, one
      map-side-combined groupBy sums the INTEGER usages, and a
      |vocab|-row bounded collect feeds the driver M-step. Float ops
      only ever happen per-word (deterministic order) or driver-side,
      never in the shuffle reduce — that is what makes the two paths
      bit-equal. Job count = em_iters * prune_rounds (~8 for default
      knobs), each over the Zipf-compressed word table only.

    At 100 TB: the corpus compresses to ~1e7-1e8 unique words; the
    seed substring explode is the biggest shuffle (bounded by
    max_piece_len * total word chars) and runs ONCE."""
    if max_piece_len < 2:
        raise ValueError("max_piece_len must be >= 2")
    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    if em_iters < 1:
        # checked BEFORE any Spark work (the controller re-checks, but
        # by then the seed explode — the biggest job — already ran)
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    spark = word_freqs.sparkSession
    # persist BEFORE the driver-size probe (ADVICE r11 #3): word_freqs
    # is usually an upstream word-count aggregation, and the unpersisted
    # probe executed that full groupBy once for the limit+count and then
    # AGAIN for the collect (driver path) or the first distributed
    # action — the corpus word count ran twice per training call. The
    # cache fills on the partitions the probe touches and both paths
    # reuse it; unpersist in the shared finally.
    wf = word_freqs.select(
        F.col(word_col).alias("w"), F.col(freq_col).cast("long").alias("f")
    ).persist()
    try:
        if driver_max_words > 0:
            probe = wf.limit(driver_max_words + 1).count()
            if probe <= driver_max_words:
                rows = wf.collect()
                return _unigram_train_driver(
                    [(r["w"], int(r["f"])) for r in rows],
                    vocab_size,
                    max_piece_len=max_piece_len,
                    em_iters=em_iters,
                    shrink=shrink,
                )
        # distributed seed: same integer counts as _uni_seed_counts
        subs = wf.select(
            F.explode(
                F.expr(
                    f"""flatten(transform(sequence(1, least(length(w),
                    {int(max_piece_len)})), L -> transform(
                    sequence(1, length(w) - L + 1),
                    i -> substring(w, i, L))))"""
                )
            ).alias("piece"),
            "f",
        )
        # persist: the char collect and the capped multi-piece collect
        # are two actions over the same aggregation — unpersisted, the
        # substring explode (the docstring's dominant cost) would run
        # twice (round-11 review fix)
        counts = (
            subs.groupBy("piece").agg(F.sum("f").alias("n")).persist()
        )
        try:
            char_rows = counts.filter(F.length("piece") == 1).collect()
            chars = {r["piece"] for r in char_rows}
            seed_cap = max(0, 4 * vocab_size - len(chars))
            seed_rows = (
                counts.filter((F.length("piece") > 1) & (F.col("n") >= 2))
                .orderBy(F.desc("n"), "piece")
                .limit(seed_cap)
                .collect()
            )
        finally:
            counts.unpersist()
        seed_counts = {r["piece"]: int(r["n"]) for r in seed_rows}
        seed_counts.update({r["piece"]: int(r["n"]) for r in char_rows})

        def e_step(logp: dict) -> dict:
            from typing import Iterator

            import pandas as pd

            bc = spark.sparkContext.broadcast((dict(logp), max_piece_len))

            def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                lp, ml = bc.value
                for pdf in batches:
                    out_p, out_f = [], []
                    for w, f in zip(pdf["w"], pdf["f"]):
                        pieces, _ = _uni_viterbi(w, lp, ml)
                        out_p.extend(pieces)
                        out_f.extend([int(f)] * len(pieces))
                    yield pd.DataFrame({"piece": out_p, "use": out_f})

            try:
                used = (
                    wf.mapInPandas(gen, "piece string, use long")
                    .groupBy("piece")
                    .agg(F.sum("use").alias("n"))
                    .collect()
                )
                return {r["piece"]: int(r["n"]) for r in used}
            finally:
                # one fresh model broadcast per EM iteration (~8 per
                # training run) — destroy (not just unpersist: that
                # frees executors only, the driver-side file/JVM
                # object needs destroy) after its only job, or they
                # pin driver+executor memory for the session
                bc.destroy()

        return _uni_train_loop(
            chars, seed_counts, vocab_size, em_iters, shrink, e_step
        )
    finally:
        wf.unpersist()


def _unigram_train_driver(
    word_freqs: list,
    vocab_size: int,
    max_piece_len: int = _UNI_MAX_PIECE_LEN_DEFAULT,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> list:
    """Sequential hard-EM Kudo trainer over a collected (word, freq)
    list — the reference implementation the distributed path must
    match bit-for-bit (and the fast path for driver-sized tables)."""
    all_counts = _uni_seed_counts(word_freqs, max_piece_len)
    chars = {p for p in all_counts if len(p) == 1}

    def e_step(logp: dict) -> dict:
        usage: dict = {}
        for w, f in word_freqs:
            pieces, _ = _uni_viterbi(w, logp, max_piece_len)
            for p in pieces:
                usage[p] = usage.get(p, 0) + f
        return usage

    return _uni_train_loop(
        chars, all_counts, vocab_size, em_iters, shrink, e_step
    )


def unigram_train(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = _UNI_MAX_PIECE_LEN_DEFAULT,
    em_iters: int = 2,
    shrink: float = 0.75,
    driver_max_words: int = _BPE_DRIVER_MAX_WORDS,
) -> list:
    """Train a unigram-LM tokenizer from a corpus: ONE distributed
    word count (the Zipf compression), then unigram_train_from_words.
    The corpus text is never rescanned — incremental retraining
    composes with vocabulary_partials/vocabulary_merge exactly like
    bpe_train."""
    words = (
        df.select(
            F.explode(F.split(normalize_text(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return unigram_train_from_words(
        words,
        vocab_size,
        max_piece_len=max_piece_len,
        em_iters=em_iters,
        shrink=shrink,
        driver_max_words=driver_max_words,
    )


def unigram_segment(
    df: DataFrame,
    model: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_logp: float = -20.0,
) -> DataFrame:
    """Apply a trained unigram model to a corpus: (id, pieces array,
    n_pieces, score), each word segmented by the same _uni_viterbi the
    trainer ran (score = sum of piece log-probs, words left to right —
    the document's unigram-LM log-likelihood). Unseen characters
    consume one UNK char at unk_logp each.

    Physical shape: normalize + word-split JVM-side, then ONE
    Arrow-batched mapInPandas with the model broadcast — shuffle-free,
    embarrassingly parallel, constant plan size in |vocab| (the
    production bpe_segment shape; a 50k-piece model is ~2 MB)."""
    from typing import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    if id_col in ("pieces", "n_pieces", "score"):
        raise ValueError(
            f"unigram_segment: id_col={id_col!r} collides with an "
            "output column; rename the id column first"
        )
    if not model:
        raise ValueError("unigram_segment: empty model")
    max_len = max(len(p) for p, _ in model)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (dict(model), max_len, float(unk_logp))
    )
    src = df.select(
        F.col(id_col).alias("__id"),
        F.split(normalize_text(text_col), " ").alias("__words"),
    )
    id_field = src.schema["__id"].dataType

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp, ml, unk = bc.value
        # per-task Viterbi memo, same idiom as bpe_segment/wordpiece:
        # _uni_viterbi is deterministic per word, and Zipf reuse means
        # most occurrences hit the memo instead of re-running the DP
        memo: dict = {}
        for pdf in batches:
            ids, pieces_col, n_col, s_col = [], [], [], []
            for rid, words in zip(pdf["__id"], pdf["__words"]):
                pieces: list = []
                score = 0.0
                for w in words if words is not None else []:
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = _uni_viterbi(w, lp, ml, unk)
                        memo[w] = got
                    ps, s = got
                    pieces.extend(ps)
                    score += s
                ids.append(rid)
                pieces_col.append(pieces)
                n_col.append(len(pieces))
                s_col.append(score)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "pieces": pieces_col,
                    "n_pieces": n_col,
                    "score": s_col,
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, id_field),
            T.StructField("pieces", T.ArrayType(T.StringType())),
            T.StructField("n_pieces", T.IntegerType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return src.mapInPandas(gen, schema)


def kneser_ney_bigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    surprisal: bool = False,
) -> DataFrame:
    """Per-document fluency under an interpolated KNESER-NEY bigram LM
    trained on the corpus's own counts — the smoothing KenLM/CCNet
    actually use (Kneser & Ney 1995; Chen & Goodman 1998), beside
    bigram_lm_stats' simpler add-k model. KN's two ideas: absolute
    discounting (subtract `discount` from every seen bigram count, so
    head collocations stop hoarding mass) and CONTINUATION probability
    (a word's backoff weight is how many distinct contexts it follows,
    not how often it occurs — "francisco" is frequent but follows only
    "san", so it backs off near zero). Closed form from exact counts —
    no iteration — so unlike BPE/unigram training this whole model is
    SQL-replayable:

        p_cont(w2)  = n1plus(.w2) / N_distinct_bigrams
        lambda(w1)  = discount * n1plus(w1.) / c(w1.)
        p(w2|w1)    = (greatest(c(w1,w2) - discount, 0)
                       + (discount * n1plus(w1.)) * p_cont(w2))
                      / c(w1.)

    (exact float op order as written; every input an integer count,
    `discount` a literal — the whole chain is engine-portable, and
    interpolated KN sums to 1 over the seen vocab per context,
    test-pinned). Output per doc with >= 2 tokens:

      n_bigrams     adjacent-pair instances
      sum_kn_prob   position-ordered left fold of the instances' p
      mean_kn_prob  sum_kn_prob / n_bigrams

    `surprisal=True` adds mean -log2 p — the real perplexity feature.
    log2 is NOT bit-portable across engines (the bigram_lm_stats
    boundary), so it stays out of oracle-gated column sets and is
    pinned by the python-reference unit test instead.

    At 100 TB: one corpus explode shuffled on the bigram key (Zipf
    skew -> AQE), three count tables (bigram / context / continuation)
    each map-side combined, the instance joins keyed on bigram then
    broadcast-joined to the 1-row N, and the per-doc fold over a
    sorted collect_list of (pos, p) — list state is per-doc bigram
    count, never corpus-sized. Corpus-self scoring has no OOV by
    construction (every scored pair is in the counts); scoring a
    FOREIGN corpus against these counts would need an OOV floor —
    out of scope here, documented."""
    d = float(discount)
    if not 0.0 < d < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    pairs = _adjacent_pairs(
        text_col,
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        "struct<w1:string,w2:string>",
    )
    posts = df.select(
        F.col(id_col).alias("id"), F.posexplode(pairs).alias("pos", "p")
    ).select("id", "pos", "p.w1", "p.w2")
    # bg feeds FOUR consumers (ctx, cont, n_distinct, probs). This is
    # NOT re-computed per consumer: all four live under the one final
    # action, and Spark reuses the identical posts-explode shuffle-map
    # stage across them (measured r15: persisting bg here was ~0.2 s
    # SLOWER at sf0.1 — the cache write only added a barrier). Persist
    # pays off only when duplicated subtrees span separate jobs or
    # differ in their map stages (see dsir_train's histograms).
    bg = posts.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bg.groupBy("w1").agg(
        F.sum("c_bg").alias("c_w1"),
        F.count(F.lit(1)).alias("n1p_w1"),
    )
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_dot_w2"))
    n_distinct = bg.agg(F.count(F.lit(1)).alias("n_bg_distinct"))
    probs = (
        bg.join(ctx, "w1")
        .join(cont, "w2")
        .join(F.broadcast(n_distinct))
        .select(
            "w1",
            "w2",
            (
                (
                    F.greatest(
                        F.col("c_bg").cast("double") - F.lit(d), F.lit(0.0)
                    )
                    + (F.lit(d) * F.col("n1p_w1").cast("double"))
                    * (
                        F.col("n1p_dot_w2").cast("double")
                        / F.col("n_bg_distinct").cast("double")
                    )
                )
                / F.col("c_w1").cast("double")
            ).alias("kn_p"),
        )
    )
    scored = posts.join(probs, ["w1", "w2"])
    # surprisal rides the SAME aggregation — recomputing the scored
    # relation for a second groupBy would re-run the corpus explode
    # and the three count joins (round-11 review fix)
    aggs = [
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "kn_p"))),
                lambda s: s["kn_p"],
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ).alias("sum_kn_prob"),
    ]
    if surprisal:
        aggs.append(F.avg(-F.log2("kn_p")).alias("kn_surprisal"))
    cols = [
        F.col("id").alias(id_col),
        F.col("n_bigrams"),
        F.col("sum_kn_prob"),
        (F.col("sum_kn_prob") / F.col("n_bigrams")).alias("mean_kn_prob"),
    ]
    if surprisal:
        cols.append(F.col("kn_surprisal"))
    return scored.groupBy("id").agg(*aggs).select(*cols)


def wordpiece_segment(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    unk: str = "[UNK]",
    max_word_len: int = 100,
) -> DataFrame:
    """WordPiece segmentation (the BERT tokenizer's apply step, Wu et
    al. 2016 / Devlin et al. 2019 — greedy LONGEST-MATCH-FIRST): each
    normalized word matches the longest vocab piece prefixing its
    remainder, word-initial pieces plain and continuations prefixed
    '##'; a word with NO match at any position (or longer than
    max_word_len, the BERT rule) becomes a single `unk` token.
    Returns (id, tokens array, n_tokens) — the bpe_segment /
    unigram_segment output contract, so the three tokenizer families
    are drop-in interchangeable downstream (packing, vocab reports).

    Physical shape: the vocab ships once per executor via
    sc.broadcast (two longest-first python dicts keyed by piece
    length); an Arrow-batched mapInPandas segments per word with a
    memo — Zipf reuse makes the amortized cost per token tiny, and the
    plan size is constant in vocab size (the JVM-fold alternative
    would inline the vocab into the plan). Shuffle-free, one corpus
    scan; a 30k-piece vocab is ~300 KB broadcast. Training is
    deliberately out of scope: WordPiece vocabs ship pretrained, and
    the repo's learned-vocab training paths are bpe_train (pair
    frequency) and unigram_train (EM) — this completes the APPLY side
    of the third major tokenizer family. Segmentation arithmetic is
    hash-gated under a pinned vocab by the wordpiece_segment_fixed
    declared query."""
    from typing import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    if id_col in ("tokens", "n_tokens"):
        raise ValueError(
            f"wordpiece_segment: id_col={id_col!r} collides with an "
            f"output column; rename the id column first"
        )
    starts = sorted(
        {p for p in vocab if not p.startswith("##")},
        key=len,
        reverse=True,
    )
    conts = sorted(
        {p[2:] for p in vocab if p.startswith("##") and len(p) > 2},
        key=len,
        reverse=True,
    )
    if not starts:
        raise ValueError("wordpiece_segment: vocab has no word-initial pieces")
    spark = df.sparkSession
    vocab_bc = spark.sparkContext.broadcast(
        (set(starts), set(conts), max(map(len, starts)),
         max(map(len, conts)) if conts else 0)
    )
    src = df.select(
        F.col(id_col).alias("__id"),
        F.split(normalize_text(text_col), " ").alias("__words"),
    )
    out_schema = T.StructType(
        [
            T.StructField(
                id_col,
                src.schema.fields[0].dataType,
                src.schema.fields[0].nullable,
            ),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        start_set, cont_set, max_s, max_c = vocab_bc.value
        memo: dict[str, list[str]] = {}

        def seg_word(word: str) -> list[str]:
            got = memo.get(word)
            if got is not None:
                return got
            if not word or len(word) > max_word_len:
                memo[word] = [unk]
                return [unk]
            toks: list[str] = []
            pos, n = 0, len(word)
            while pos < n:
                table, cap = (
                    (start_set, max_s) if pos == 0 else (cont_set, max_c)
                )
                end = min(n, pos + cap)
                while end > pos and word[pos:end] not in table:
                    end -= 1
                if end == pos:  # no match anywhere -> whole word UNK
                    memo[word] = [unk]
                    return [unk]
                toks.append(
                    word[pos:end] if pos == 0 else "##" + word[pos:end]
                )
                pos = end
            memo[word] = toks
            return toks

        for pdf in batches:
            toks = [
                [t for w in words if w for t in seg_word(w)]
                for words in pdf["__words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf["__id"].values,
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return src.mapInPandas(_segment, out_schema)


def chunk_text(
    df: DataFrame,
    chunk_tokens: int = 256,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the RAG /
    embedding-prep step (split every document into chunk_tokens-token
    windows starting every `stride` tokens; stride defaults to
    chunk_tokens, i.e. no overlap; stride < chunk_tokens overlaps
    consecutive chunks by chunk_tokens - stride tokens, the standard
    retrieval-chunking shape). Returns one row per chunk:
    (id, chunk_idx, tok_start, n_tokens, chunk_text).

    Semantics, pinned for the oracle: tokens are the document's
    non-empty whitespace-split words with case and punctuation
    PRESERVED (chunking feeds an embedder — unlike the dedup
    operators it must not normalize); chunk i covers token positions
    [i*stride, i*stride + chunk_tokens); chunks are emitted while
    their start position is inside the document, so the final chunk
    may be short; documents with zero tokens emit no rows;
    chunk_text rejoins the window's tokens with single spaces (other
    inter-token whitespace does not survive — by design, chunk
    boundaries already break byte-exactness).

    Physical shape: one projection (split + filter), one posexplode
    over a computed sequence of chunk starts, one slice +
    array_join — all JVM-side whole-stage codegen, no shuffle at all;
    output rows ~ total_tokens/stride. At 100 TB this is a map-only
    pass whose cost is the scan itself."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    n = F.size("__toks")
    # number of chunks: 1 + ceil((n - chunk)/stride) for n > 0, via
    # integer arithmetic (floor div of the positive numerator)
    n_chunks = F.lit(1) + F.floor(
        (
            F.greatest(n - F.lit(chunk_tokens), F.lit(0))
            + F.lit(stride - 1)
        )
        / F.lit(stride)
    ).cast("int")
    # empty/NULL documents emit no rows. The n >= 1 guard must gate the
    # sequence itself: Spark's sequence(1, 0) generates a DESCENDING
    # [1, 0], not an empty array. The start < n filter enforces the
    # documented 'start position inside the document' rule in the
    # stride > chunk_tokens (gapped-sampling) regime, where the
    # chunk-count formula alone can land a start exactly past the end
    # and emit a degenerate empty chunk (round-14 review finding).
    starts = F.when(
        n >= 1,
        F.filter(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: (i - F.lit(1)) * F.lit(stride),
            ),
            lambda s: s < n,
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col,
            "__toks",
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("__start").cast("int").alias("tok_start"),
            F.size(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
            ).alias("n_tokens"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
        )
    )
