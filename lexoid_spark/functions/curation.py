"""Corpus-curation operators for a web-scale training-data pipeline.

The post-extraction cleanup family every large pretraining corpus runs
between "markdown per url" and "tokens in the dataloader": PII
redaction, cross-document paragraph dedup (RefinedWeb-style), Gopher
repetition signals, URL canonicalization, deterministic stratified
sampling, and context-window packing. None of these exist in the
reference (Lexoid stops at markdown — ``api.py:235-441`` returns
per-document parses); they are the scale layer this engine adds on top.

Scale shapes:

- ``pii_redact``: pure ``regexp_replace`` chain — JVM-native, zero
  shuffle, rides the scan.
- ``paragraph_dedup``: posexplode → groupBy(paragraph hash) min-struct
  (map-side combine, skew-proof: a boilerplate paragraph repeated in
  10^9 docs partially aggregates) → equi-join back → groupBy(doc).
  Two shuffles on bounded keys, no windows over hot partitions.
- ``repetition_table``: duplicate-line metrics are per-row native
  (sorted-adjacent array compare, no shuffle); only the top-2-gram
  statistic explodes + groupBys (map-side combine).
- ``normalize_url``: native regexp chain, zero shuffle.
- ``stratified_sample``: filter on a portable md5-derived hash bucket —
  zero shuffle, deterministic across engines and runs.
- ``packed_bins``: two-phase distributed prefix sum (per-partition
  cumsum + driver-side partition offsets — a P-row control-plane
  collect), NOT a single-partition global window.
- ``decontaminate``: corpus side shuffles only (id, n-gram hash)
  pairs; the benchmark gram set (evals are KBs) broadcasts.
- ``rebalance_mixture``: one aggregation collected (#strata rows),
  integer-exact thresholds, then a pure hash filter.

All hashes are md5-derived so DuckDB oracles can mirror them exactly
(same trick as ``dedup._md5_hash64``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lexoid_spark.functions.dedup import _md5_hash64
from lexoid_spark.functions.textstats import tokens

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \b,
# non-capturing groups. Order matters: emails before phones (digits in
# mail hosts), IPs before phones (dotted digit runs).
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+\d{7,15}\b|\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"


def pii_redact(col) -> Column:
    """Replace emails / IPv4 addresses / phone-shaped numbers with
    typed placeholder tokens (the pre-training scrub applied by e.g.
    ROOTS/RefinedWeb-style pipelines). Pure JVM regexp chain."""
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return out


# ---------------------------------------------------------------------------
# Cross-document paragraph dedup (RefinedWeb-style exact span dedup)
# ---------------------------------------------------------------------------

def paragraph_dedup(df: DataFrame, id_col: str, text_col: str,
                    sep: str = "\n\n") -> DataFrame:
    """Remove exact-duplicate paragraphs corpus-wide, keeping only the
    first occurrence (min ``(id, pos)``); reassemble each document from
    its surviving paragraphs.

    The keeper per paragraph hash is chosen with ``min(struct(id,
    pos))`` under ``groupBy(hash)`` — an aggregation with map-side
    combine, so a boilerplate paragraph shared by millions of pages
    partially aggregates on the map side instead of hot-spotting one
    window partition. Returns ``(id, n_paras, n_kept, text_dedup)``.
    """
    paras = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
        )
        .filter(F.length(F.trim(F.col("para"))) > 0)
        .withColumn("_h", F.md5(F.col("para")))
    )
    keepers = paras.groupBy("_h").agg(
        F.min(F.struct("id", "pos")).alias("k")
    )
    kept = paras.join(keepers, "_h").filter(
        (F.col("id") == F.col("k.id")) & (F.col("pos") == F.col("k.pos"))
    )
    per_doc_kept = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s.getField("para"),
            ),
            sep,
        ).alias("text_dedup"),
    )
    totals = paras.groupBy("id").agg(F.count("*").alias("n_paras"))
    return (
        totals.join(per_doc_kept, "id", "left")
        .select(
            "id",
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher repetition signals
# ---------------------------------------------------------------------------

def _grams2(col) -> Column:
    """Ordered (non-distinct) word 2-grams — shifted-zip form, same
    rationale as ``dedup.shingles`` (HOF re-evaluation trap)."""
    toks = tokens(col)
    k = F.size(toks)
    nxt = F.slice(toks, 2, F.greatest(k - 1, F.lit(0)))
    zipped = F.slice(F.arrays_zip(toks.alias("a"), nxt.alias("b")),
                     1, F.greatest(k - 1, F.lit(0)))
    return F.transform(
        zipped, lambda x: F.concat_ws(" ", x.getField("a"), x.getField("b"))
    )


def repetition_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style in-document repetition metrics:

      dup_line_frac       duplicated lines / non-empty lines
      dup_line_char_frac  chars in duplicated lines / chars in lines
      top_2gram           most frequent word 2-gram (ties → greatest)
      top_2gram_frac      chars covered by its occurrences / token chars

    Line metrics are per-row native: sort the line array once, then a
    line is duplicated iff it equals a sorted neighbor — no shuffle.
    Only the 2-gram mode needs explode + groupBy (map-side combine).
    """
    txt = F.col(text_col)
    lines = F.filter(F.split(txt, "\n"), lambda ln: F.length(ln) > 0)
    srt = F.array_sort(lines)
    n = F.size(srt)
    prev = F.concat(F.array(F.lit(None).cast("string")),
                    F.slice(srt, 1, F.greatest(n - 1, F.lit(0))))
    nxt = F.concat(F.slice(srt, 2, F.greatest(n - 1, F.lit(0))),
                   F.array(F.lit(None).cast("string")))
    z = F.arrays_zip(srt.alias("c"), prev.alias("p"), nxt.alias("x"))
    dups = F.filter(
        z,
        lambda s: s.getField("c").eqNullSafe(s.getField("p"))
        | s.getField("c").eqNullSafe(s.getField("x")),
    )
    dup_cnt = F.size(dups)
    dup_chars = F.aggregate(
        dups, F.lit(0).cast("long"),
        lambda a, s: a + F.length(s.getField("c")),
    )
    tot_chars = F.aggregate(
        srt, F.lit(0).cast("long"), lambda a, ln: a + F.length(ln)
    )
    toks = tokens(txt)
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        n.alias("n_lines"),
        F.when(n > 0, dup_cnt.cast("double") / n).otherwise(0.0)
         .alias("dup_line_frac"),
        F.when(tot_chars > 0, dup_chars.cast("double") / tot_chars)
         .otherwise(0.0).alias("dup_line_char_frac"),
        tok_chars.alias("_tok_chars"),
    )

    ex = df.select(
        F.col(id_col).alias("id"), F.explode(_grams2(txt)).alias("gram")
    )
    top = (
        ex.groupBy("id", "gram").agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max(F.struct("c", "gram")).alias("t"))
        .select("id", F.col("t.gram").alias("top_2gram"),
                F.col("t.c").alias("_c"))
    )
    # occurrences × word-chars of the gram (spaces excluded), over all
    # token chars — the Gopher "fraction of characters contained within
    # the most frequently-occurring 2-gram"
    return (
        base.join(top, "id", "left")
        .select(
            "id", "n_lines", "dup_line_frac", "dup_line_char_frac",
            F.coalesce("top_2gram", F.lit("")).alias("top_2gram"),
            F.when(
                (F.col("_tok_chars") > 0) & F.col("_c").isNotNull(),
                (F.col("_c")
                 * F.length(F.regexp_replace("top_2gram", " ", "")))
                .cast("double") / F.col("_tok_chars"),
            ).otherwise(0.0).alias("top_2gram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

_SCHEME_HOST = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"
_TRACKING = r"(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&?"


def normalize_url(col) -> Column:
    """Canonicalize a URL for dedup: lowercase scheme+host, drop the
    fragment, strip tracking params (utm_*/fbclid/gclid), clean
    dangling ``?``/``&``, drop one trailing slash. Pure regexp chain
    (RE2-compatible so DuckDB oracles mirror it verbatim)."""
    head = F.lower(F.regexp_extract(col, _SCHEME_HOST, 0))
    rest = F.regexp_replace(col, _SCHEME_HOST, "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, _TRACKING, "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(head, rest)


# ---------------------------------------------------------------------------
# Test-set decontamination
# ---------------------------------------------------------------------------

def decontaminate(df: DataFrame, bench: DataFrame, id_col: str,
                  text_col: str, bench_text_col: str = "text",
                  n: int = 13) -> DataFrame:
    """Flag documents sharing any word ``n``-gram with a benchmark
    set (the GPT-3-style 13-gram decontamination rule): a training
    corpus must drop documents that quote eval data.

    Shape: both sides explode to distinct n-gram hashes; the corpus
    side semi-joins the benchmark side on the hash. The benchmark gram
    set is tiny relative to the corpus (evals are KBs, corpora are
    TBs), so the join broadcasts; the corpus side never shuffles its
    text — only (id, hash) pairs. Returns the ids of CONTAMINATED
    documents (drop-list; anti-join to keep)."""
    from lexoid_spark.functions.dedup import shingles

    doc_grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("_g"),
    ).select("id", _md5_hash64(F.col("_g")).alias("_h"))
    bench_grams = bench.select(
        F.explode(shingles(F.col(bench_text_col), n)).alias("_g")
    ).select(_md5_hash64(F.col("_g")).alias("_h")).distinct()
    return (
        doc_grams.join(F.broadcast(bench_grams), "_h", "left_semi")
        .select("id").distinct()
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "strat", denom: int = 10_000) -> DataFrame:
    """Keep each row iff ``md5_hash64(id:salt) % denom < rate(stratum)
    * denom`` — deterministic (re-runs and engines agree; no RNG), and
    a pure filter (zero shuffle; rides the scan). ``rates`` maps
    stratum value → sampling rate in [0, 1]."""
    bucket = F.pmod(
        _md5_hash64(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(denom),
    )
    thresh = F.lit(int(default_rate * denom))
    expr = None
    for k, v in sorted(rates.items()):
        cond = F.col(stratum_col) == k
        t = F.lit(int(v * denom))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.filter(bucket < thresh)


# ---------------------------------------------------------------------------
# Chunking (RAG / training windowing)
# ---------------------------------------------------------------------------

def chunk_by_chars(df: DataFrame, id_col: str, text_col: str,
                   chunk_chars: int, overlap: int = 0) -> DataFrame:
    """Split documents into overlapping fixed-size character windows:
    chunk i starts at ``1 + i*(chunk_chars - overlap)`` (1-based) and
    spans ``chunk_chars``. All-native ``sequence``/``posexplode``/
    ``substring`` — no UDF, rides the scan; only the explode's row
    multiplication costs anything. Returns
    ``(id, chunk_id, start, chunk)``."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    step = chunk_chars - overlap
    txt = F.col(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(txt), F.lit(1)), F.lit(step)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(starts).alias("chunk_id", "start"),
        txt.alias("_t"),
    ).select(
        "id", "chunk_id", "start",
        F.substring(F.col("_t"), F.col("start"), chunk_chars).alias("chunk"),
    )


def chunk_by_tokens(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int, overlap: int = 0) -> DataFrame:
    """Token-window variant: chunk i = tokens
    ``[i*(chunk_tokens - overlap), +chunk_tokens)`` rejoined with a
    single space (whitespace-normalizing, like any tokenizer round
    trip). Native slice over one tokenization. Returns
    ``(id, chunk_id, n_tokens, chunk)``."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(step)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(starts).alias("chunk_id", "_start"),
        toks.alias("_toks"),
    ).select(
        "id", "chunk_id",
        F.size(F.slice(F.col("_toks"), F.col("_start"), chunk_tokens))
         .alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("_start"), chunk_tokens), " "
        ).alias("chunk"),
    )


# ---------------------------------------------------------------------------
# Source-mixture rebalancing
# ---------------------------------------------------------------------------

def rebalance_mixture(df: DataFrame, id_col: str, stratum_col: str,
                      weight_col: str, targets_bp: dict[str, int],
                      denom: int = 10_000,
                      salt: str = "mix") -> DataFrame:
    """Downsample overrepresented strata toward a target mixture
    (``targets_bp``: stratum → target share in basis points of
    ``denom``). Keep threshold per stratum =
    ``min(denom, target_bp * total_weight // stratum_weight)`` — a
    stratum already under its target keeps everything (no
    upsampling/duplication); one over it is hash-sampled down.

    Two passes: per-stratum weight totals are ONE aggregation
    collected at the driver (#strata rows — control-plane), thresholds
    are exact integer arithmetic (engine-portable: the oracle computes
    the same integers in SQL), and the second pass is a pure
    deterministic hash filter riding the scan."""
    totals = {
        r["s"]: int(r["w"])
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
        .collect()
    }
    total = sum(totals.values())
    thresholds = {
        s: min(denom, targets_bp.get(s, 0) * total // w)
        for s, w in totals.items() if w > 0
    }
    bucket = F.pmod(
        _md5_hash64(F.concat(F.col(id_col).cast("string"),
                             F.lit(":" + salt))),
        F.lit(denom),
    )
    expr = None
    for s, t in sorted(thresholds.items()):
        cond = F.col(stratum_col) == s
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thr = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    return df.filter(bucket < thr)


# ---------------------------------------------------------------------------
# Context-window packing
# ---------------------------------------------------------------------------

def packed_bins(df: DataFrame, id_col: str, n_tokens_col: str,
                context_len: int, num_parts: int = 32) -> DataFrame:
    """Assign documents (in ``id`` order) to fixed-size token bins:
    ``bin = floor(exclusive_prefix_sum(n_tokens) / context_len)`` —
    the boundary-straddling approximation of greedy sequence packing
    (a doc may span two bins; the dataloader splits it).

    The prefix sum is distributed: range-partition by id, cumsum
    per partition under a partition-local window, then add per-partition
    offsets computed from a P-row driver collect (control-plane only).
    A naive ``Window.orderBy(id)`` with no partitioning would funnel
    the whole corpus through ONE task — the classic global-window
    scale-killer this avoids. Returns ``(id, bin)``.
    """
    part = df.select(
        F.col(id_col).alias("id"),
        F.col(n_tokens_col).cast("long").alias("_n"),
    ).repartitionByRange(num_parts, "id").withColumn(
        "_p", F.spark_partition_id()
    )
    w = Window.partitionBy("_p").orderBy("id")
    local = part.withColumn(
        "_cum", F.sum("_n").over(w) - F.col("_n")
    ).persist()
    # P control-plane rows: (partition, total tokens, min id)
    sizes = sorted(
        local.groupBy("_p").agg(
            F.sum("_n").alias("tot"), F.min("id").alias("mn")
        ).collect(),
        key=lambda r: r["mn"],
    )
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["_p"]] = acc
        acc += r["tot"]
    off_col = F.lit(0).cast("long")
    expr = None
    for p, o in offsets.items():
        c = F.col("_p") == p
        expr = F.when(c, o) if expr is None else expr.when(c, o)
    off_col = expr.otherwise(F.lit(0)) if expr is not None else off_col
    # Materialize the (small: id, n_tokens, bin) output eagerly, then
    # drop the cached full-corpus cumsum frame — leaving it persisted
    # for the session lifetime is the session-degradation pattern the
    # project notes flag (one leaked cache per call). localCheckpoint
    # blocks are freed by the ContextCleaner when `out` is collected.
    out = local.select(
        "id",
        F.col("_n").alias("n_tokens"),
        F.floor((F.col("_cum") + off_col) / context_len).alias("bin"),
    ).localCheckpoint(eager=True)
    local.unpersist(blocking=False)
    return out


# ---------------------------------------------------------------------------
# corpus-trained familiarity score (CCNet-style LM filter analogue)
# ---------------------------------------------------------------------------

def charlm_familiarity(df: DataFrame, id_col: str, text_col: str,
                       lang_col: str, top_k: int = 512) -> DataFrame:
    """Per-document character-bigram familiarity against a per-language
    table trained on the corpus itself — the shape of CCNet's KenLM
    perplexity filter (train a per-lang LM, score each doc, drop the
    unusual tail), with EXACT integer arithmetic instead of float
    logprobs so a SQL oracle reproduces every score bit-for-bit: the
    familiarity is ``mean corpus count of the doc's bigrams`` (counting
    only the language's ``top_k`` bigrams), rounded half-up at 6 dp via
    the engine-portable integer formula.

    Scale shape: one explode over the corpus feeds BOTH the training
    aggregation (map-side-combinable groupBy(lang, bigram)) and the
    scoring join; the per-language top-k table is control-plane sized
    (#langs x top_k rows) and BROADCAST; per-doc scoring is one shuffle
    keyed by id. The ranking window partitions by lang over the counts
    table only — never over corpus rows. Ties rank (count desc, bigram
    asc) on both engines for determinism.
    """
    bigrams = df.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.explode(
            F.when(
                F.length(text_col) >= 2,
                F.expr(
                    f"transform(sequence(1, length({text_col}) - 1), "
                    f"i -> substring({text_col}, i, 2))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    # the exploded bigram frame feeds BOTH the training aggregation and
    # the scoring join — pin it so the per-character explode + substring
    # runs once per query, not once per consumer (guide §5)
    bigrams = bigrams.persist()
    counts = bigrams.groupBy("lang", "bg").agg(F.count("*").alias("cnt"))
    rk = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("bg"))
    table = (
        counts.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") <= top_k)
        .drop("_rk")
    )
    return (
        bigrams.join(F.broadcast(table), ["lang", "bg"], "left")
        .groupBy("id")
        .agg(
            F.sum(F.coalesce("cnt", F.lit(0))).alias("fam_sum"),
            F.count("*").alias("n_bigrams"),
        )
        .withColumn(
            "familiarity",
            F.expr("(2 * fam_sum * 1000000 + n_bigrams) div (2 * n_bigrams)")
            / F.lit(1000000.0),
        )
        .select(F.col("id").alias(id_col), "fam_sum", "n_bigrams",
                "familiarity")
    )


# ---------------------------------------------------------------------------
# C4-style line + page filtering
# ---------------------------------------------------------------------------

def c4_line_filter(df: DataFrame, id_col: str, text_col: str,
                   min_words: int = 5, min_lines: int = 3) -> DataFrame:
    """C4's public cleaning rules (Raffel et al. 2020 §2.2, behavior
    analogue): keep only lines that end in terminal punctuation
    (``. ! ? "``), contain at least ``min_words`` words, and do not
    mention "javascript"; drop whole pages that contain "lorem ipsum"
    or a ``{`` (code), or end up with fewer than ``min_lines``
    surviving lines. Returns ``(id, n_lines, n_kept, text_clean)`` for
    surviving pages only.

    Scale shape: ZERO shuffle — split + higher-order ``filter`` +
    ``array_join`` all ride the scan as native JVM expressions; the
    page-level predicates are plain filters that push into the same
    stage. No explode, so no row blowup for giant pages.

    Regexes are Java/RE2-portable; the DuckDB oracle mirrors each rule
    with ``list_filter`` over ``string_split``.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda L: F.trim(L).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(L), r"\s+")) >= min_words)
        & ~F.contains(F.lower(L), F.lit("javascript")),
    )
    lo = F.lower(F.col(text_col))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.size(lines).alias("n_lines"),
            F.size(kept).alias("n_kept"),
            F.array_join(kept, "\n").alias("text_clean"),
            lo.alias("_lo"),
        )
        .filter(
            ~F.contains(F.col("_lo"), F.lit("lorem ipsum"))
            & ~F.contains(F.col("_lo"), F.lit("{"))
            & (F.col("n_kept") >= min_lines)
        )
        .drop("_lo")
    )


# ---------------------------------------------------------------------------
# DSIR-shaped hashed importance weights
# ---------------------------------------------------------------------------

def dsir_weights(df: DataFrame, id_col: str, text_col: str,
                 target: Column, n_buckets: int = 1024) -> DataFrame:
    """Data Selection via Importance Resampling, hashed-feature shape
    (Xie et al. 2023 behavior analogue): every word hashes into one of
    ``n_buckets`` buckets; bucket counts over the TARGET subset
    (``target`` boolean column) vs the RAW corpus estimate the two
    distributions, and each document is scored by the ratio of its
    summed target-bucket counts to its summed raw-bucket counts. The
    float log-ratio of the paper is collapsed to one exact rational —
    ``importance = half_up_6dp(sum_t / sum_r)`` via the engine-portable
    integer formula — so the SQL oracle reproduces every score
    bit-for-bit.

    Scale shape: raw and target bucket counts come out of ONE
    combined aggregation (``count(*)`` + a conditional sum in the
    same map-side-combinable groupBy over <= n_buckets keys — no
    skew, bucket domain is fixed), so the corpus traverses the word
    explode twice total (once to train, once to score) instead of
    three times; the single bucket table is control-plane sized
    (<= n_buckets rows) and BROADCAST, so scoring adds no shuffle
    beyond the final groupBy(id).

    Returns ``(id, sum_t, sum_r, importance)``.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        target.alias("_is_target"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    ).withColumn("h", _md5_hash64(F.col("w")) % n_buckets)
    counts = words.groupBy("h").agg(
        F.count("*").alias("nr"),
        F.sum(F.col("_is_target").cast("long")).alias("nt"),
    )
    return (
        words.join(F.broadcast(counts), "h")
        .groupBy("id")
        .agg(
            F.sum("nt").alias("sum_t"),
            F.sum("nr").alias("sum_r"),
        )
        .withColumn(
            "importance",
            F.expr("(2 * sum_t * 1000000 + sum_r) div (2 * sum_r)")
            / F.lit(1000000.0),
        )
        .select(F.col("id").alias(id_col), "sum_t", "sum_r", "importance")
    )


def linear_quality_classifier(df: DataFrame, id_col: str, text_col: str,
                              n_buckets: int = 1024,
                              weights: "dict[int, int] | None" = None,
                              ) -> DataFrame:
    """fastText-shaped model-based quality filter (the
    FineWeb-Edu / DCLM pipeline stage): a linear classifier over
    hashed bag-of-words features — each token hashes into one of
    ``n_buckets`` buckets, the document logit is the MEAN of the
    bucket weights, and the keep decision is ``logit >= 0``. Training
    is out of scope (ship your weights); ``weights=None`` uses a
    deterministic closed-form stand-in ``w(b) = (b*37 + 11) % 201 -
    100`` so tests and SQL oracles reproduce every score exactly.

    Scale shape: ZERO shuffle — the whole classifier is one
    higher-order fold per row (hash → weight → integer sum), riding
    the scan inside whole-stage codegen. Weights stay INTEGER through
    the sum (order-independent, engine-exact); the only float op is
    the final single division, which IEEE-rounds identically on both
    engines. A real weight vector would ship as a one-row broadcast
    array (same pattern as the IVF centroids) rather than a
    per-bucket join.

    Returns ``(id_col, n_toks, sum_w, score, keep)``.
    """
    if weights is not None:
        # one-row broadcast, NOT an inlined literal array: distinct
        # weight vectors must not trigger fresh codegen compiles
        wrow = df.sparkSession.createDataFrame(
            [([int(weights.get(b, 0)) for b in range(n_buckets)],)],
            "w_tbl array<int>",
        )
        df = df.crossJoin(F.broadcast(wrow))
        wexpr = lambda t: F.element_at(  # noqa: E731
            F.col("w_tbl"), (_md5_hash64(t) % n_buckets + 1).cast("int"))
    else:
        wexpr = lambda t: (  # noqa: E731
            (_md5_hash64(t) % n_buckets) * 37 + 11) % 201 - 100
    toks = tokens(F.col(text_col))
    sum_w = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + wexpr(t).cast("long"),
    )
    n = F.size(toks)
    score = F.when(n > 0, sum_w.cast("double") / n).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.alias("n_toks"),
        sum_w.alias("sum_w"),
        score.alias("score"),
        (score >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# UniMax budget allocation across strata
# ---------------------------------------------------------------------------

def unimax_allocation(df: DataFrame, id_col: str, stratum_col: str,
                      budget_pct: int = 80) -> DataFrame:
    """UniMax-style budget waterfilling across strata (Chung et al.
    2023 behavior analogue): spread a document budget (``budget_pct``
    percent of the corpus, integer-exact) as uniformly as possible
    across strata, capping each stratum at its capacity and
    redistributing the slack to the rest — EXACT integer arithmetic
    end-to-end via the closed-form prefix test: sorted ascending by
    (capacity, stratum), stratum i (of K) is fully taken iff
    ``cap_i * (K - i + 1) <= B - cumsum_prev_caps``; the first index
    failing that test fixes the equal share ``(B - cumsum_prev) div
    (K - i0 + 1)`` and its remainder goes to the first strata after
    i0 in the same order. No floats anywhere, so the DuckDB oracle is
    bit-for-bit.

    Returns the allocation table ``(stratum, cap, alloc)`` — K rows.
    Scale shape: one map-side-combinable count aggregation; the window
    functions run over the K-row aggregate only (control plane), never
    over corpus rows.
    """
    caps = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("cap")
    )
    w_ord = Window.orderBy(F.asc("cap"), F.asc("stratum"))
    w_all = Window.partitionBy()
    a = (
        caps.withColumn("i", F.row_number().over(w_ord))
        .withColumn("k", F.count("*").over(w_all))
        .withColumn("total", F.sum("cap").over(w_all))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("cap").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("b", F.expr(f"total * {int(budget_pct)} div 100"))
        .withColumn(
            "uncapped_i",
            F.min(
                F.when(
                    F.col("cap") * (F.col("k") - F.col("i") + 1)
                    > F.col("b") - F.col("cum_prev"),
                    F.col("i"),
                )
            ).over(w_all),
        )
        .withColumn(
            "rem_at_i0",
            F.max(
                F.when(F.col("i") == F.col("uncapped_i"),
                       F.col("b") - F.col("cum_prev"))
            ).over(w_all),
        )
    )
    share = F.expr("rem_at_i0 div (k - uncapped_i + 1)")
    extra = F.expr("rem_at_i0 % (k - uncapped_i + 1)")
    alloc = F.when(
        F.col("uncapped_i").isNull() | (F.col("i") < F.col("uncapped_i")),
        F.col("cap"),
    ).otherwise(
        share + F.when(F.col("i") - F.col("uncapped_i") < extra, 1)
        .otherwise(0)
    )
    return a.select("stratum", "cap", alloc.cast("long").alias("alloc"))


def unimax_sample(df: DataFrame, id_col: str, stratum_col: str,
                  budget_pct: int = 80) -> DataFrame:
    """Select exactly ``alloc`` documents per stratum under the
    :func:`unimax_allocation` budget — the first ``alloc`` ids per
    stratum ranked by ``(md5-hash(id), id)``, deterministic and
    engine-portable. Returns the selected ``(id, stratum)`` rows.

    Scale note: exact-count selection needs a rank per stratum (one
    shuffle + sort, and the biggest stratum is the biggest partition —
    skew rides on the stratum distribution). At 10^12 rows the
    approximate variant (:func:`stratified_sample`'s pure hash-bucket
    filter, zero shuffle) is the production path; this operator is the
    exact-quota complement for when the budget must bind exactly.
    """
    alloc = unimax_allocation(df, id_col, stratum_col, budget_pct)
    ranked = df.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("stratum").orderBy(
                F.asc(_md5_hash64(F.col("id").cast("string"))), F.asc("id")
            )
        ),
    )
    return (
        ranked.join(F.broadcast(alloc), "stratum")
        .filter(F.col("rk") <= F.col("alloc"))
        .select(F.col("id").alias(id_col), "stratum")
    )


# ---------------------------------------------------------------------------
# Cross-document duplicated-span removal (exact substring dedup shape)
# ---------------------------------------------------------------------------

def duplicate_span_removal(df: DataFrame, id_col: str, text_col: str,
                           n: int = 8, materialize: bool = True) -> DataFrame:
    """Remove text spans that are exact word-level ``n``-gram
    duplicates across documents — the shape of exact substring
    deduplication (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"), word-tokenized instead of
    suffix-array character ranges: any window of ``n`` words that
    occurs in two or more DISTINCT documents is dropped from every
    document (all words covered by any duplicated window go).

    Scale shape: one explode produces (id, pos, gram-hash) rows; the
    duplicated-gram set is a map-side-combinable two-level aggregation
    (count distinct ids per hash — a boilerplate gram shared by 10^9
    pages partially aggregates, no hot keys); covered-position masking
    is per-row native higher-order functions over the doc's own starts
    array (no second explode). Two shuffles on bounded keys total.

    Returns ``(id, n_words, n_dup_starts, text_clean)``.
    """
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )
    grams = base.filter(F.size("t") >= n).select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: _md5_hash64(
                    F.array_join(F.slice("t", i + 1, n), " ")
                ),
            )
        ).alias("pos", "h"),
    )
    if materialize:
        # dup-set aggregation + position join both consume `grams`:
        # pin it so the tokenize + per-gram md5 runs once, not per
        # consumer (same trade as char_span_removal's kernel pin)
        grams = grams.persist()
    dup = (
        grams.groupBy("h")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    starts = (
        grams.join(dup, "h")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    j = base.join(starts, "id", "left").withColumn(
        "starts", F.coalesce("starts", F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.transform(
            F.col("t"), lambda w, i: F.struct(w.alias("w"), i.alias("i"))
        ),
        lambda st: ~F.exists(
            F.col("starts"),
            lambda s: (s <= st["i"]) & (st["i"] <= s + (n - 1)),
        ),
    )
    return j.select(
        F.col("id").alias(id_col),
        F.size("t").alias("n_words"),
        F.size("starts").alias("n_dup_starts"),
        F.array_join(
            F.transform(kept, lambda st: st["w"]), " "
        ).alias("text_clean"),
    )


def char_span_removal(df: DataFrame, id_col: str, text_col: str,
                      w: int = 40, materialize: bool = True) -> DataFrame:
    """Character-level exact-substring dedup (the Lee et al. 2022
    semantics ``duplicate_span_removal`` approximates at word level):
    any window of ``w`` CHARACTERS occurring in two or more distinct
    documents is removed from every document — spans crossing word
    boundaries and punctuation dedup correctly, which the word-gram
    variant cannot do. Fixed-length stride-1 windows stand in for the
    paper's suffix arrays (every duplicated substring of length ≥ w is
    fully covered by duplicated windows, so the removal set matches
    the suffix-array method for spans ≥ w).

    Scale shape: one Arrow-batched mapInPandas pass emits (id, pos,
    window-hash) rows (one per char — the same cardinality class as
    the word variant's token rows; see :func:`_char_window_fps` for
    the vectorized polynomial hash); the duplicated-window set is a
    map-side-combinable two-level aggregation (countDistinct ids per
    hash — boilerplate shared by 10^9 pages partially aggregates, no
    hot keys). Masking is per-row: sorted starts fold into disjoint
    intervals (O(starts) — NOT a per-char exists scan), then the kept
    text is spliced with O(intervals) substrings. Two shuffles on
    bounded keys, no window functions, no explode.

    Returns ``(id, n_chars, n_dup_starts, text_clean)``.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    )
    # k=1 degenerates the winnowing selection to EVERY window position
    # — the exact stride-1 semantics — while sharing the vectorized
    # polynomial-hash kernel (the per-window md5 this replaced was the
    # dominant cost: ~w bytes digested per character)
    wins = _char_window_fps(base, w=w, k=1)
    if materialize:
        # two consumers (dup-set aggregation + the position join) would
        # otherwise each run the Arrow fingerprint kernel — pin it so
        # the corpus is hashed ONCE (guide §5: reuse > recompute when
        # the intermediate is CPU-born; the spill-backed cache write is
        # cheaper than a second full kernel pass)
        wins = wins.persist()
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    starts = (
        wins.join(dup, "h")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    j = base.join(starts, "id", "left").withColumn(
        "starts", F.coalesce("starts", F.array().cast("array<int>"))
    )
    return _splice_out_windows(j, id_col, w)


def _splice_out_windows(j: DataFrame, id_col: str, w: int) -> DataFrame:
    """Shared masking tail for the char-window dedup variants: given
    ``(id, txt, starts)`` with sorted 0-based window starts, remove
    every ``w``-char window and return ``(id, n_chars, n_dup_starts,
    text_clean)``. Per-row native HOFs only — fold sorted starts into
    disjoint [lo, hi] intervals (0-based, inclusive; adjacent
    intervals merge — identical output, fewer splices), then splice
    the gaps."""
    empty_iv = F.array().cast("array<struct<lo:int,hi:int>>")
    merged = F.aggregate(
        F.col("starts"),
        empty_iv,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s <= F.element_at(acc, -1)["hi"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["lo"].alias("lo"),
                    (s + (w - 1)).alias("hi"),
                )),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(
                s.alias("lo"), (s + (w - 1)).alias("hi"))))
        ),
    )
    # splice: walk intervals with a (cursor, acc) fold, keeping the
    # gaps; 1-based substr positions, cursor = next unread char
    clean = F.aggregate(
        merged,
        F.struct(F.lit(1).alias("cur"), F.lit("").alias("acc")),
        lambda a, iv: F.struct(
            (iv["hi"] + 2).alias("cur"),
            F.concat(
                a["acc"],
                F.col("txt").substr(a["cur"], iv["lo"] + 1 - a["cur"]),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"], F.col("txt").substr(a["cur"], F.length("txt"))
        ),
    )
    return j.select(
        F.col("id").alias(id_col),
        F.length("txt").alias("n_chars"),
        F.size("starts").alias("n_dup_starts"),
        clean.alias("text_clean"),
    )


#: bases of the two independent 32-bit polynomial window hashes the
#: winnowing variant fingerprints with (both odd, so powers stay units
#: mod 2^32); the DuckDB oracle recomputes the identical values with
#: HUGEINT Horner folds — ``(a * B + cp) % 2^32`` per codepoint.
WINNOW_B1 = 1000003
WINNOW_B2 = 999983


def _char_window_fps(base: DataFrame, w: int, k: int) -> DataFrame:
    """Shared fingerprint kernel for the char-window dedup variants:
    ``(id, txt)`` → the selected ``(id, pos, h)`` fingerprint rows,
    where ``h`` packs two independent 32-bit polynomial window hashes
    over the codepoints (``sum cp[i+j] * B^(w-1-j) mod 2^32``, exact
    in int64: products < 2^53, window sums < 2^59) into one
    non-negative int64, and selection keeps the RIGHTMOST minimal
    hash of every ``k``-run (``k=1`` = every stride-1 position — the
    exact variant). Hashing AND selection run vectorized in ONE
    Arrow-batched mapInPandas pass that emits the fingerprints
    directly — no per-window digest, no materialized per-row hash
    arrays, no explode."""
    import numpy as np
    import pandas as pd

    pw1 = np.array([pow(WINNOW_B1, w - 1 - j, 2 ** 32) for j in range(w)],
                   dtype=np.int64)
    pw2 = np.array([pow(WINNOW_B2, w - 1 - j, 2 ** 32) for j in range(w)],
                   dtype=np.int64)

    def _fps_batches(batches):
        for pdf in batches:
            ids, poss, hvs = [], [], []
            for did, txt in zip(pdf["id"].to_numpy(), pdf["txt"]):
                nw = len(txt) - w + 1  # stride-1 window count
                if nw < k:  # no full k-run → nothing selected
                    continue
                cp = np.frombuffer(
                    txt.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                win = np.lib.stride_tricks.sliding_window_view(cp, w)
                h1 = (win @ pw1) & 0xFFFFFFFF
                h2 = (win @ pw2) & 0xFFFFFFFF
                hv = ((h1 & 0x7FFFFFFF) << 32) | h2  # < 2^63
                if k == 1:
                    sel = np.arange(nw, dtype=np.int64)
                else:
                    # rightmost argmin per k-run: argmin takes the
                    # FIRST min of the reversed window = the
                    # RIGHTMOST of the original
                    rev = np.lib.stride_tricks.sliding_window_view(
                        hv, k)[:, ::-1]
                    jj = (k - 1) - rev.argmin(axis=1)
                    sel = np.unique(
                        np.arange(nw - k + 1, dtype=np.int64) + jj)
                ids.append(np.full(sel.size, did, dtype=np.int64))
                poss.append(sel.astype(np.int32))
                hvs.append(hv[sel])
            if ids:
                yield pd.DataFrame({
                    "id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "h": np.concatenate(hvs),
                })

    # pre-prune rows that cannot select (F.length is UTF-16 units ≥
    # the kernel's codepoint count, so this passes a superset; the
    # kernel re-checks with codepoint semantics)
    return base.filter(F.length("txt") >= w + k - 1).mapInPandas(
        _fps_batches, schema="id long, pos int, h long")


def char_span_removal_winnow(df: DataFrame, id_col: str, text_col: str,
                             w: int = 40, k: int = 8,
                             materialize: bool = True) -> DataFrame:
    """Winnowing-sampled character-level dedup (Schleimer et al. 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting") — the
    scale path for :func:`char_span_removal`, whose stride-1 windows
    shuffle one row PER CHARACTER. Here only the winnowed fingerprints
    shuffle: within every run of ``k`` consecutive window hashes, the
    RIGHTMOST minimal one is selected; selection is a pure function of
    the hash run, so two copies of a duplicated span select the same
    windows at the same relative offsets.

    Guarantee (the winnowing theorem): every duplicated span of at
    least ``w + k - 1`` characters contains a full k-run of windows in
    both copies, hence at least one SELECTED window with a matching
    hash in each — the span is detected. Removal masks the selected
    duplicated windows only (a subset of the exact variant's mask):
    spans shorter than ``w + k - 1``, and up to ``w + k - 2`` chars at
    a detected span's edges, can survive. Expected selection density
    is 2/(k+1), so the explode/shuffle volume drops ~(k+1)/2 x vs the
    exact variant.

    Scale shape: hashing AND selection run in ONE Arrow-batched numpy
    mapInPandas kernel that emits the selected ``(id, pos, hash)``
    fingerprint rows directly — no per-window md5 (the exact variant's
    dominant cost: ~w bytes digested per character), no materialized
    per-row hash arrays, no explode. The window hash is a pair of
    independent 32-bit polynomial hashes over the codepoints
    (``sum cp[i+j] * B^(w-1-j) mod 2^32``, exact in int64: products
    < 2^53, window sums < 2^59), packed into one non-negative int64 —
    integer-exact on both engines, so the DuckDB oracle reproduces
    selection bit-for-bit. The duplicated-fingerprint set is the same
    map-side-combinable two-level aggregation; masking is the shared
    interval-fold splice. Two shuffles on bounded keys.

    Returns ``(id, n_chars, n_dup_starts, text_clean)``.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    )
    fps = _char_window_fps(base, w=w, k=k)
    if materialize:
        # same one-kernel-run pin as char_span_removal (two consumers)
        fps = fps.persist()
    dup = (
        fps.groupBy("h")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    starts = (
        fps.join(dup, "h")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    j = base.join(starts, "id", "left").withColumn(
        "starts", F.coalesce("starts", F.array().cast("array<int>"))
    )
    return _splice_out_windows(j, id_col, w)
