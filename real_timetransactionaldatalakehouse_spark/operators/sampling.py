"""Corpus curation operators for training-data pipelines (EXT,
SURVEY.md section 2 X): deterministic split assignment, per-group
balancing caps, and benchmark decontamination.

These are the steps between "deduped corpus" and "training shards" in
an LLM data pipeline.  The design constraints at 100 TB:

- splits must be DETERMINISTIC functions of a stable id — never
  ``rand()`` — so reprocessing a partition, adding a source, or
  re-running a failed task cannot move a document across the
  train/eval boundary (the classic contamination-by-retry bug);
- balancing caps are top-k-per-group, which Spark executes with a
  partial WindowGroupLimit below the exchange — the shuffle carries at
  most k rows per group per map task;
- decontamination joins on winnowing fingerprints (60-bit ints), so
  the wide stage moves fingerprints, never documents, and the
  benchmark side is small enough to broadcast.

All hashing is the md5-prefix 60-bit form (``dedup._md5_60``) so every
operator here has an exact ANSI-SQL / DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import topk_per_group
from .text import tokens, winnow_fingerprints


def split_bucket(id_col, seed: str = "split-v1", buckets: int = 1000):
    """Deterministic bucket in [0, buckets) from a stable id: the
    md5-prefix hash of ``id || ':' || seed``.  Changing ``seed``
    produces an independent re-split; same seed is stable forever.
    DuckDB twin: ``('0x' || substr(md5(id || ':' || seed), 1, 15))
    ::BIGINT % buckets``."""
    from .dedup import _md5_60

    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
    return F.pmod(_md5_60(key), F.lit(buckets))


def _split_expr(id_col: str, weights: dict[str, float], seed: str):
    """The :func:`hash_split` CASE expression as a plain Column over
    ``id_col`` — a pure map-side function of (id, seed), so any frame
    that carries an id can compute that id's split WITHOUT joining the
    labeled corpus back (r14: :func:`split_leakage` attaches both
    endpoints' splits this way, deleting two corpus-wide joins)."""
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    bucket = split_bucket(id_col, seed)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name]
        cond = bucket < int(round(hi * 1000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return F.lit(names[0]) if expr is None else expr.otherwise(names[-1])


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default)
    by deterministic hash bucket — map-only, no shuffle, stable under
    reprocessing and appends.  ``weights`` maps split name to a
    fraction; fractions are cumulated over the dict's insertion order
    onto 1000 hash buckets."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    return df.withColumn(out_col, _split_expr(id_col, weights, seed))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    rates: dict[tuple, float] | float,
    id_col: str = "doc_id",
    seed: str = "sample-v1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a hash-chosen
    fraction of rows per stratum (e.g. cap overrepresented languages
    in a mixture).  Same determinism argument as :func:`hash_split`
    — the keep/drop decision is a pure function of (id, seed), so
    re-running any partition reproduces the identical sample, and a
    row's fate never depends on partition layout or visit order
    (``df.sample`` cannot promise either).  ``rates`` maps a stratum
    key tuple to its keep-rate, or is a single float for all strata.
    Map-only; no shuffle."""
    bucket = split_bucket(id_col, seed)
    if isinstance(rates, float):
        keep = bucket < int(round(rates * 1000))
    else:
        keep = None
        for key, rate in rates.items():
            key = key if isinstance(key, tuple) else (key,)
            if len(key) != len(strata_cols):
                # zip() would silently truncate: a key one element
                # longer than strata_cols applies its rate to the
                # whole prefix stratum — deterministic deletion of the
                # WRONG strata (r9 review fix: hard error instead)
                raise ValueError(
                    f"rates key {key!r} has {len(key)} element(s) but "
                    f"strata_cols has {len(strata_cols)}: {strata_cols}"
                )
            match = None
            for c, v in zip(strata_cols, key):
                cond = F.col(c) == F.lit(v)
                match = cond if match is None else match & cond
            thresh = bucket < int(round(rate * 1000))
            keep = F.when(match, thresh) if keep is None else keep.when(match, thresh)
        keep = keep.otherwise(bucket < int(round(default_rate * 1000)))
    return df.filter(keep)


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    seed: str = "mix-v1",
    buckets: int = 100_000,
) -> DataFrame:
    """Token-budget data mixing — the mixture primitive of LLM
    pretraining: given target mixture ``weights`` (source -> share of
    ``token_budget``), keep a deterministic hash-chosen subset of each
    source whose EXPECTED token mass is its share.  Sources absent
    from ``weights`` are dropped (they are not in the mixture).

    Rate-based, not prefix-sum-based, on purpose: the published
    mixing recipes sample source ``s`` at rate ``w_s * B / tokens_s``
    — a map-only filter after one metadata-sized per-source token
    total (|sources| rows collected).  An exact greedy cut would need
    a per-source running token sum, i.e. one reducer per source — the
    classic skew shape at corpus scale — to remove sampling error
    that is already ~1/sqrt(docs-per-source).  Rates clamp at 1.0
    (a source whose total is under its share contributes everything).

    Keep/drop is a pure function of (id, seed) (:func:`split_bucket`
    at ``buckets`` granularity): retry-stable, layout-independent,
    and re-running with a larger budget keeps supersets (hash buckets
    nest).  Output adds ``n_tokens``.
    """
    import math

    n_tok = (
        F.col(token_col) if token_col is not None else F.size(tokens(text_col))
    ).cast("long")
    with_tok = df.withColumn("n_tokens", n_tok)
    totals = {
        r["s"]: r["t"]
        for r in with_tok.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
        if r["s"] in weights
    }
    bucket = split_bucket(id_col, seed, buckets)
    keep = None
    for src, w in weights.items():
        total = totals.get(src)
        if not total:
            continue
        # mirrored exactly by the oracle SQL: FLOOR(LEAST(w*B/total, 1.0)*buckets)
        thresh = math.floor(min(w * token_budget / total, 1.0) * buckets)
        cond = F.col(source_col) == F.lit(src)
        keep = F.when(cond, bucket < thresh) if keep is None else keep.when(cond, bucket < thresh)
    if keep is None:
        return with_tok.filter(F.lit(False))
    return with_tok.filter(keep.otherwise(F.lit(False)))


def cap_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                  k: int, tiebreak_cols: list[str] | None = None,
                  desc: bool = True) -> DataFrame:
    """Per-group balancing cap: keep at most ``k`` rows per group in a
    deterministic preference order (e.g. cap each (source, lang) cell
    so one crawl domain cannot dominate a mixture).  Executes as
    top-k-per-group — partial WindowGroupLimit keeps the shuffle at
    k rows per group per map task regardless of group skew."""
    return topk_per_group(
        df, group_cols, order_col, k, tiebreak_cols=tiebreak_cols, desc=desc
    ).drop("rank")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Remove corpus documents sharing any winnowing fingerprint with a
    benchmark/eval set — the overlap step of training-data
    decontamination.  Winnowing guarantees any shared substring of
    length >= k + window - 1 chars produces a shared fingerprint, so
    verbatim eval leakage of that length cannot survive.

    Plan shape: both sides reduce to (fp, id) pairs; the benchmark
    side (eval sets are thousands of docs, not billions — a size the
    CALLER controls) broadcasts into a semi-join marking contaminated
    ids.  The contaminated-id side of the final anti-join is NOT
    force-broadcast (r9 review fix): its size is corpus-determined —
    one boilerplate passage shared with an eval doc can mark a large
    fraction of a duplicate-heavy crawl — so AQE decides at runtime:
    broadcast when small (the common case, same plan as before), a
    shuffled anti-join instead of a driver/executor OOM when not.
    Fingerprints (60-bit ints) shuffle; documents never shuffle for
    the semi side.
    """
    def fps(df: DataFrame) -> DataFrame:
        # winnow_fingerprints keys on "doc_id" — normalize the id name
        # (r13: the under-split fan lives in winnow_fingerprints
        # itself, shared with q_text_winnow; this operator measured
        # 5.1 s -> 1.5 s at sf0.1 from it, paired)
        src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
        return winnow_fingerprints(src, text_col, k=k, window=window)

    b_fp = fps(benchmark).select("fp").distinct()
    contaminated = (
        fps(corpus).join(F.broadcast(b_fp), "fp", "left_semi")
        .select(F.col("doc_id").alias(id_col)).distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def _gram_hashes(
    df: DataFrame,
    out_id: str,
    text_col: str,
    id_col: str,
    n: int,
    repartition: bool | int,
    h1_of=None,
) -> DataFrame:
    """Distinct token n-gram hashes per document, ``(out_id, __h)``
    rows — the shared reduction of :func:`decontaminate_ngram`,
    :func:`contamination_report` and the Bloom screen's
    :func:`_gram_pairs` (r12: the Bloom path reuses THIS body rather
    than copying it — the mutant-corpus divergence lesson).

    Hashes the token SLICES directly (r6): building the n-word concat
    string per position only to hash it paid the string churn for
    nothing — ``xxhash64`` over the array slice has the same equality
    classes (elementwise), and only hash equality matters for these
    engine-internal joins (measured 0.83 s -> 0.63 s at sf0.1 on the
    decontaminate pass, identical output).  ``h1_of`` overrides the
    per-slice hash for callers that need an ANSI-SQL-reproducible
    gram hash (the md5_60 string mode).  The token array is
    materialized as its own projection so the interpreted transform
    lambda does not re-split the text per position (the winnowing-fix
    defect class).  Documents shorter than ``n`` tokens keep
    word_shingles' whole-document gram via the whole-array hash.

    The default spread goes through the split-count guard
    (``sources.fan_out``: no-op unless the exchange at least doubles
    the gram-build parallelism); an EXPLICIT integer count is a
    caller override and repartitions unconditionally."""
    from ..sources import fan_out
    from .text import tokens

    if repartition is True:
        # r13: input-sized spread (the fan_out default), not core
        # count — in-session width A/B on the 13-gram decontaminate at
        # bench SF: 4/8-way ~0.63-0.64 s vs 32-way >= 0.75 s; the
        # session layout grows with input, well-split tables skip at
        # the guard
        src = fan_out(df, guard=True)
    elif repartition is False:
        src = df
    else:
        src = df.repartition(int(repartition))
    if h1_of is None:
        h1_of = F.xxhash64
    toks = tokens(text_col)
    tdf = src.select(F.col(id_col).alias(out_id), toks.alias("__toks"))
    tk = F.col("__toks")
    grams = F.when(
        F.size(tk) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: h1_of(F.slice(tk, i, n)),
            )
        ),
    ).otherwise(F.array(h1_of(tk)))
    return tdf.select(out_id, F.explode(grams).alias("__h"))


def decontaminate_ngram(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    repartition: bool | int = True,
) -> DataFrame:
    """Token n-gram overlap decontamination — the GPT-3/Pile-style
    variant of :func:`decontaminate`: drop any corpus document sharing
    a word ``n``-gram with the benchmark/eval set.  Winnowing (above)
    guarantees on raw substrings; n-gram overlap is the published
    standard for benchmark leakage and catches re-tokenized rewording
    the character fingerprints can miss at their guarantee length.

    Plan shape: both sides reduce to distinct xxhash64 n-gram hashes
    (only hash EQUALITY matters — the join is engine-internal, so the
    fastest native 64-bit hash wins); the benchmark side (eval sets
    are thousands of docs, not billions — caller-bounded) broadcasts
    into a semi-join marking contaminated ids.  The contaminated-id
    anti-join is left to AQE (r9 review fix, same reasoning as
    :func:`decontaminate`): the set is corpus-determined and
    unbounded under boilerplate overlap, so it broadcasts at runtime
    when small and shuffles instead of OOMing when not.  N-gram
    hashes shuffle; documents never shuffle for the semi side.

    ``repartition``: the gram build is per-row CPU-heavy (n token
    concats per position), so an under-split corpus is fanned out to
    core count first (measured 4x at bench scale, where one parquet
    file arrives as ONE split).  Pass ``False`` on a well-split
    100 TB table, or an int to size it explicitly.
    """
    b = _gram_hashes(
        benchmark, "__bid", text_col, id_col, n, repartition
    ).select("__h").distinct()
    contaminated = (
        _gram_hashes(corpus, id_col, text_col, id_col, n, repartition)
        .join(F.broadcast(b), "__h", "left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def _gram_pairs(
    df: DataFrame,
    out_id: str,
    text_col: str,
    id_col: str,
    n: int,
    hash_fn: str,
    repartition: bool | int,
) -> DataFrame:
    """Distinct token n-grams per document as DOUBLE-hash pairs
    ``(out_id, __h1, __h2)`` — the Kirsch-Mitzenmacher base for the
    Bloom screen (k derived positions from two hashes behave like k
    independent hashes; Kirsch & Mitzenmacher, ESA'06).

    The gram stream is :func:`_gram_hashes` itself — one hash per
    gram, ``array_distinct`` over longs (the struct-pair first draft
    measured 3x slower on the distinct alone; a copied body would
    re-create the mutant-corpus divergence hazard) — plus one narrow
    post-explode projection deriving the second hash from the first
    (h2 = hash(h1), the standard double-hashing construction when
    re-reading the key is the expensive part).
    ``hash_fn="xxhash64"`` hashes token slices; ``"md5_60"`` hashes
    the joined gram string and derives h2 as md5_60 of h1's DECIMAL
    STRING, so the whole screen has an exact ANSI-SQL twin."""
    if hash_fn == "xxhash64":
        h1_of = None  # _gram_hashes' native slice hash

        def h2_of(h1):
            return F.xxhash64(h1)
    elif hash_fn == "md5_60":
        from .dedup import TOKEN_HASHES

        hasher = TOKEN_HASHES["md5_60"]

        def h1_of(sl):
            return hasher(F.concat_ws(" ", sl))

        def h2_of(h1):
            return hasher(h1.cast("string"))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    base = _gram_hashes(df, out_id, text_col, id_col, n, repartition,
                        h1_of=h1_of)
    return base.select(
        out_id,
        F.col("__h").alias("__h1"),
        h2_of(F.col("__h")).alias("__h2"),
    )


#: both hashes project to their low 57 bits before mixing so
#: h1' + j*h2' <= 2^57 + 31*2^57 = 2^62 never overflows a signed long
#: under ANSI mode (k is capped at 32 accordingly); 57 bits is far
#: beyond any practical m_bits, so the projection costs no position
#: entropy.
_BLOOM_HASH_MOD = 1 << 57


def _bloom_pos(j: int, m_bits: int):
    """Position j of the double-hash scheme:
    (h1' + j*h2') mod m over the 57-bit hash projections."""
    mod = F.lit(_BLOOM_HASH_MOD).cast("long")
    return F.pmod(
        F.pmod(F.col("__h1"), mod)
        + F.lit(j).cast("long") * F.pmod(F.col("__h2"), mod),
        F.lit(m_bits).cast("long"),
    )


def bloom_contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
    hash_fn: str = "xxhash64",
    repartition: bool | int = True,
) -> DataFrame:
    """Bloom-SCREENED benchmark decontamination report (r12): per
    corpus document, how many of its distinct ``n``-grams pass an
    ``m_bits``/``k`` Bloom membership test against the benchmark's
    gram set (``n_screened``) and how many are TRUE matches confirmed
    by the exact join (``n_confirmed``).  Only documents with
    ``n_screened > 0`` appear; ``n_confirmed <= n_screened`` always,
    and the gap is the screen's false-positive cost, visible in the
    output instead of argued from the formula.

    Why this exists next to :func:`decontaminate_ngram`: the exact
    operator broadcasts the benchmark's DISTINCT GRAM HASHES as a
    join hash table — perfect while eval sets are thousands of
    documents, but decontaminating against a UNION of benchmarks or
    a sibling corpus (10^8+ distinct grams ~ multiple GB of hash
    table) outgrows a broadcast join long before it outgrows a Bloom
    bitmap (10^9 bits = 128 MB at ~1% fp with k=4 and one bit per
    3.4 grams).  The screen is MAP-ONLY over the corpus (k O(1)
    element_at + bit_get probes of an array<long> literal,
    whole-stage codegen, zero shuffle); only screen SURVIVORS —
    benchmark-overlap-sized, not corpus-sized — reach the exact
    confirm join, whose broadcast-or-shuffle choice is left to AQE.
    False positives therefore cost extra CONFIRM work, never
    correctness.

    Engineering bounds, stated honestly: the bitmap is folded into
    64-bit words by one bit_or aggregate (map-side combine) and
    collected as <= m_bits/64 rows, then shipped as ONE array<long>
    literal — metadata-sized up to m_bits ~ 2^27 (16 MB plan
    payload); past that, move the bitmap into an EXT-tier Arrow
    kernel over a SparkContext broadcast (the repo's pandas_udf
    discipline) rather than growing the literal.
    ``hash_fn="md5_60"`` makes screen AND confirm exactly
    reproducible in ANSI SQL (the certified-query mode);
    ``"xxhash64"`` is the production default.

    Output: ``(id_col, n_screened, n_confirmed)``, one row per
    screened document.
    """
    screened, b = _bloom_screen(
        corpus, benchmark, text_col, id_col, n, m_bits, k, hash_fn,
        repartition,
    )
    # ONE pass over the screened stream (r12 review fix: separate
    # n_screened / n_confirmed aggregations re-ran the whole corpus
    # gram build + probe pipeline twice per action): the benchmark's
    # distinct hashes join in as a flag — unique per __h1, so no row
    # multiplication — and both counts fold in a single aggregation,
    # the same shape the DuckDB oracle uses.
    in_bench = b.select("__h1").distinct().withColumn("__inb", F.lit(True))
    return (
        screened.join(in_bench, "__h1", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_screened"),
            F.sum(F.when(F.col("__inb"), 1).otherwise(0))
            .cast("long").alias("n_confirmed"),
        )
    )


def _bloom_screen(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    m_bits: int,
    k: int,
    hash_fn: str,
    repartition: bool | int,
):
    """Build the bitmap from the benchmark gram stream and return
    ``(screened corpus grams, benchmark gram pairs)`` — the shared
    front half of :func:`bloom_contamination_report` and
    :func:`bloom_decontaminate` (so the screen-only act path never
    constructs the confirm-join subtree it documents as skipped)."""
    if m_bits < 64 or m_bits % 64 or k < 1 or k > 32:
        raise ValueError(
            "m_bits must be a positive multiple of 64 and k in [1, 32]")
    b = _gram_pairs(benchmark, "__bid", text_col, id_col, n, hash_fn,
                    repartition)
    # bitmap build: positions fold into 64-bit WORDS distributively —
    # one bit_or aggregate (map-side combine, skew-free) down to
    # <= m_bits/64 rows, so the driver collects word rows, not one row
    # per distinct position; the collected VOLUME is the bitmap's
    # information content and the irreducible driver cost of this
    # operator.
    word_rows = (
        b.select(
            F.explode(
                F.array(*[_bloom_pos(j, m_bits) for j in range(k)])
            ).alias("p")
        )
        .select(
            F.floor(F.col("p") / 64).cast("long").alias("w"),
            F.pmod(F.col("p"), F.lit(64)).cast("int").alias("o"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr(
            "shiftleft(CAST(1 AS BIGINT), o)")).alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in word_rows:
        words[int(r["w"])] = int(r["bits"])
    # ship the bitmap as a ONE-ROW broadcast (the spike-fold pattern):
    # each executor receives the array<long> once and every gram probes
    # it with O(1) element_at + bit_get.  The two rejected encodings,
    # from measurement (r12): a string literal probed by substr is
    # O(position) per probe (UTF8String resolves codepoint offsets by
    # scanning — quadratic screen, hung at m=2^22), and F.lit(list)
    # builds a CreateArray of m/64 child literals (a 131k-expression
    # plan at m=2^23 — minutes of analysis/codegen before the first
    # task).
    bitmap_df = corpus.sparkSession.createDataFrame(
        [(words,)], "__bloom_bits array<bigint>"
    )
    bits_arr = F.col("__bloom_bits")

    cg = _gram_pairs(corpus, id_col, text_col, id_col, n, hash_fn,
                     repartition).crossJoin(F.broadcast(bitmap_df))
    screen_pred = None
    for j in range(k):  # k is small and static: unrolled AND, codegen
        pos = _bloom_pos(j, m_bits)
        word = F.element_at(bits_arr, F.floor(pos / 64).cast("int") + 1)
        c = F.bit_get(word, F.pmod(pos, F.lit(64)).cast("int")) == 1
        screen_pred = c if screen_pred is None else (screen_pred & c)
    return cg.filter(screen_pred).drop("__bloom_bits"), b


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
    confirm: bool = True,
    hash_fn: str = "xxhash64",
    repartition: bool | int = True,
) -> DataFrame:
    """ACT side of :func:`bloom_contamination_report`: drop corpus
    documents sharing an ``n``-gram with the benchmark, using the
    Bloom screen to keep the corpus map-only.  ``confirm=True``
    (default) drops on CONFIRMED overlap — the output equals
    :func:`decontaminate_ngram` exactly (false positives are screened
    back in by the confirm join; pytest pins the equality), which is
    the certified semantics.  ``confirm=False`` drops on the screen
    alone: the over-dropping variant for pipelines that accept the
    ~(set_bits/m)^k false-positive rate to skip the confirm join
    entirely (a fraction-of-a-percent corpus loss at the documented
    sizing — acceptable for pretraining corpora, never for eval
    sets).  confirm=False genuinely skips the confirm subtree (r12
    review fix: the first draft routed through the report, whose plan
    still built the benchmark distinct-hash join it documented as
    skipped)."""
    screened, b = _bloom_screen(
        corpus, benchmark, text_col, id_col, n, m_bits, k, hash_fn,
        repartition,
    )
    flagged = (
        screened.join(b.select("__h1").distinct(), "__h1", "left_semi")
        if confirm else screened
    )
    return corpus.join(
        flagged.select(id_col).distinct(), id_col, "left_anti"
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    order_cols: list[str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document to the
    fixed-size context window that holds its FIRST token when the
    corpus is concatenated in a deterministic order — the standard
    pretraining packing layout (documents stream into ``budget``-token
    windows; the window id is the running token offset divided by the
    budget).

    Output: ``(id, n_tokens, pack_id, pack_pos)`` where ``pack_pos``
    is the document's first-token offset inside its window.  Writers
    shard by ``pack_id`` and emit windows independently.

    Scale shape: the global running token sum uses the same two-phase
    prefix-sum as :func:`relational.global_rank` — literal-boundary
    buckets (a pure function of the row: identical layout under any
    re-execution or cache drop, no pinned materialization), window-
    cumsum within buckets, add per-bucket offsets from a metadata-
    sized collect (one SUM row per bucket).  No single-partition
    window anywhere; the only full-data exchange is the window's hash
    partition on the bucket id.  ``order_cols`` must be a total order
    (default: the unique id) so the layout is retry-stable, like
    every other curation op here (no ``rand()``).
    """
    from pyspark.sql import Window

    from .dedup import _attach_cached
    from .text import tokens

    spark = df.sparkSession
    order = order_cols or [id_col]
    n_tok = (
        F.col(token_col) if token_col is not None
        else F.size(tokens(text_col))
    ).cast("long")
    base = df.select(F.col(id_col), *[F.col(c) for c in order if c != id_col],
                     n_tok.alias("n_tokens")).persist()
    from .relational import (
        _bucketed_layout,
        _order_specs,
        _partition_offset_expr,
    )

    specs = _order_specs(order)
    bexpr, per_bucket, keyed = _bucketed_layout(
        base, specs, [F.sum("__t").alias("t")], partitions,
        extra_cols=[F.col("n_tokens").alias("__t")],
    )
    keyed.unpersist()
    offsets, acc = [], 0
    for b in sorted(per_bucket):
        offsets.append((b, acc))
        if per_bucket[b] is not None and per_bucket[b][0] is not None:
            acc += int(per_bucket[b][0])
    cols = [F.col(c) for c in order]
    w = Window.partitionBy("__b").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # metadata-sized bucket counts inline the offsets as literals
    # (4x cheaper than re-broadcasting a tiny join table every
    # execution); cluster-scale bucket counts broadcast-join
    off_expr = _partition_offset_expr(offsets, pid_col="__b")
    joined = base.withColumn("__b", bexpr)
    if off_expr is None:
        off_df = F.broadcast(
            spark.createDataFrame(offsets, "__b int, __tok_offset long")
        )
        joined = joined.join(off_df, "__b")
        off_expr = F.col("__tok_offset")
    start = F.sum("n_tokens").over(w) + off_expr - F.col("n_tokens")
    out = (
        joined
        .withColumn("pack_id", F.floor(start / F.lit(budget)))
        .withColumn("pack_pos", start % F.lit(budget))
        .drop("__b", "__tok_offset")
    )
    from .dedup import _attach_layout

    return _attach_layout(_attach_cached(out, [base]), [base])


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    counters: int = 1024,
) -> DataFrame:
    """Approximate frequent items (Misra-Gries / SpaceSaving family):
    per-partition bounded summaries of ``counters`` counters, merged by
    key, global top-``k`` — the heavy-hitter sketch that replaces an
    exact full groupBy when the key cardinality (URLs, n-grams, user
    agents) dwarfs memory at 100 TB.

    Guarantees (classic MG bound): each partition's summary
    under-counts any key by at most ``n_p / counters`` (``n_p`` = rows
    in that partition), so the merged estimate under-counts by at most
    ``sum_p n_p / counters = N / counters`` and NEVER over-counts.
    Every key with true count > N / counters survives in at least one
    summary.  The shuffle carries at most ``counters`` rows per
    partition — summary-sized, independent of data volume.

    Arrow-batched ``mapInPandas`` keeps the counter dict per partition;
    the merge is a plain sum-groupBy over the tiny summaries plus a
    ``TakeOrdered`` top-k.  Estimates are lower bounds; callers needing
    exact counts re-scan filtered to the candidate set (linear, one
    pass, k rows out).
    """
    import pandas as pd

    out_type = df.schema[col].dataType.simpleString()

    def summarize(batches):
        counts: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counts:
                    counts[v] += 1
                elif len(counts) < counters:
                    counts[v] = 1
                else:
                    # MG decrement step: all counters give one to the
                    # unseen key; zeroed counters drop out
                    dead = []
                    for key in counts:
                        counts[key] -= 1
                        if counts[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counts[key]
        if counts:
            yield pd.DataFrame(
                {col: list(counts), "est": list(counts.values())}
            )

    summaries = df.select(col).mapInPandas(
        summarize, schema=f"{col} {out_type}, est long"
    )
    return (
        summaries.groupBy(col)
        .agg(F.sum("est").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col(col).asc())
        .limit(k)
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    repartition: bool | int = True,
) -> DataFrame:
    """The AUDIT side of :func:`decontaminate_ngram` — the per-eval-doc
    leakage report decontamination pipelines publish next to the drop:
    for each benchmark document, how many corpus documents share at
    least one token n-gram with it and how many distinct shared grams
    there are.  Benchmark docs with zero overlap appear with zeros
    (the report must prove absence, not just list hits).

    Plan: same gram-hash reduction as the decontaminate pass — the
    benchmark side broadcasts, the corpus grams stream through ONE
    inner hash join, and everything after the join is
    (bench_id, corpus_id, gram) partial aggregation.  Corpus text
    never shuffles.
    """
    b = _gram_hashes(benchmark, "__bid", text_col, id_col, n, repartition)
    hits = (
        _gram_hashes(corpus, "__cid", text_col, id_col, n, repartition)
        .join(F.broadcast(b), "__h")
        .groupBy("__bid")
        .agg(
            F.countDistinct("__cid").alias("n_contaminating_docs"),
            F.countDistinct("__h").alias("n_shared_grams"),
        )
    )
    return (
        benchmark.select(F.col(id_col).alias("__bid"))
        .join(hits, "__bid", "left")
        .select(
            F.col("__bid").alias(id_col),
            F.coalesce("n_contaminating_docs", F.lit(0)).alias("n_contaminating_docs"),
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        )
    )


def _global_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list,
    partitions: int | None = None,
):
    """Global 1-based position and INCLUSIVE running sum of
    ``value_col`` over a total order, without ever funneling the data
    through a single-partition window: range-shuffle on the order
    keys, ``row_number``/``sum`` windows within each partition, then
    add per-partition (rows, sum) offsets computed from a
    metadata-sized collect (one row per partition) — the same
    two-phase prefix sum as :func:`relational.global_rank` and
    :func:`pack_sequences`.

    ``order_cols`` may mix column names, plain Column expressions
    (ascending), and ``(name_or_column, 'asc'|'desc')`` tuples, and
    must form a TOTAL order (unique tiebreak) so positions are
    well-defined.

    Returns ``(out, total_rows, total_sum)``; ``out`` carries the
    input columns plus ``__pos`` and ``__cum``.  Bucketing is by
    LITERAL boundaries (:func:`relational._bucketed_layout`): the
    bucket is a pure function of the row, so positions and running
    sums are identical under any re-execution or cache drop — the
    input is persisted (releasable via :func:`dedup.release_cached`)
    purely as an optimization, since the offset pass and the output
    pass both read it.
    """
    from pyspark.sql import Window

    from .relational import (
        _bucketed_layout,
        _order_specs,
        _partition_offset_expr,
    )

    spark = df.sparkSession
    specs = _order_specs(order_cols)
    src = df.persist()
    bexpr, per_bucket, keyed = _bucketed_layout(
        src,
        specs,
        [F.count(F.lit(1)).alias("c"), F.sum("__v").alias("s")],
        partitions,
        extra_cols=[F.col(value_col).cast("long").alias("__v")],
    )
    keyed.unpersist()  # offsets collected; output plan reads src
    row_offsets, sum_offsets = [], []
    rows_acc = total_sum = 0
    for b in sorted(per_bucket):
        row_offsets.append((b, rows_acc))
        sum_offsets.append((b, total_sum))
        if per_bucket[b] is not None:
            # SUM over zero rows (or an all-NULL value column) is
            # NULL even when the COUNT field is present — guard the
            # sum element like pack_sequences guards its count, so an
            # empty/degenerate input reaches the operators' documented
            # ValueError instead of int(None) (r9 review fix)
            rows_acc += int(per_bucket[b][0] or 0)
            total_sum += int(per_bucket[b][1] or 0)
    order_exprs = [c.asc() if d == "asc" else c.desc() for c, d in specs]
    w = Window.partitionBy("__b").orderBy(*order_exprs).rowsBetween(
        Window.unboundedPreceding, 0
    )
    row_off = _partition_offset_expr(row_offsets, pid_col="__b")
    sum_off = _partition_offset_expr(sum_offsets, pid_col="__b")
    joined = src.withColumn("__b", bexpr)
    if row_off is None:
        off_df = F.broadcast(spark.createDataFrame(
            [(p, r, s[1]) for (p, r), s in zip(row_offsets, sum_offsets)],
            "__b int, __row_off long, __sum_off long",
        ))
        joined = joined.join(off_df, "__b")
        row_off, sum_off = F.col("__row_off"), F.col("__sum_off")
    out = (
        joined
        .withColumn("__pos", F.row_number().over(w) + row_off)
        .withColumn(
            "__cum", F.sum(F.col(value_col).cast("long")).over(w) + sum_off
        )
        .drop("__b", "__row_off", "__sum_off")
    )
    from .dedup import _attach_cached, _attach_layout

    out = _attach_layout(_attach_cached(out, [src]), [src])
    return out, rows_acc, total_sum


def sample_systematic(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    order_cols: list[str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Systematic probability-proportional-to-size (PPS) sampling:
    pick ``k`` documents with inclusion probability proportional to a
    positive INTEGER weight (quality score, token count, boost
    factor) using exact integer arithmetic — the deterministic,
    retry-stable alternative to exponential-race weighted reservoirs
    (Efraimidis–Spirakis), whose float ``u^(1/w)`` keys are not
    bit-portable across engines or libm versions.

    Lay the documents on a line in a fixed total order (``order_cols``,
    default the unique id), each covering an interval of length equal
    to its weight; drop ``k`` evenly spaced tickets on the line and
    keep every document whose interval contains a ticket.  With
    cumulative weight ``C_i`` and total ``T``, doc ``i`` is selected
    iff ``floor(C_i*k/T) > floor((C_i - w_i)*k/T)`` — pure integer
    ops, so Spark and any ANSI engine agree bit-for-bit.  A document
    with ``w_i > T/k`` can cover several tickets (``n_tickets > 1``):
    the standard PPS multiplicity, reported rather than resampled.

    Output: ``(id, weight, cum_weight, n_tickets)`` for selected
    documents only; ``sum(n_tickets) == k`` exactly.

    Scale shape: one range shuffle (the two-phase prefix sum above),
    a metadata-sized per-partition totals collect, and a map-side
    filter.  No single-partition stage at any size.  Guards ``T * k``
    against int64 overflow — at corpus scales beyond ~2^63/T tickets,
    switch the ticket arithmetic to DECIMAL(38,0).
    """
    order = order_cols or [id_col]
    # r14 (optimization, guide §2.3/§6): _global_cumsum PERSISTS its
    # input and re-reads it per execution, so project down to the
    # columns the ticket arithmetic actually reads (id, weight, order
    # keys) BEFORE the persist — the bench plan showed the FULL
    # documents row (text included) scanned from parquet and cached
    # for a computation that consumes 16 bytes/row.  Only applied when
    # every order spec is a plain name or (name, dir) tuple;
    # expression specs may reference other columns, so they keep the
    # caller's frame.
    names: list[str] = []
    prunable = True
    for c in order:
        if isinstance(c, str):
            names.append(c)
        elif isinstance(c, tuple) and isinstance(c[0], str):
            names.append(c[0])
        else:
            prunable = False
            break
    if prunable:
        keep = list(dict.fromkeys([id_col, weight_col, *names]))
        df = df.select(*keep)
    cum_df, _, total = _global_cumsum(
        df, weight_col, order, partitions=partitions
    )
    if total <= 0:
        raise ValueError(f"total weight must be positive, got {total}")
    if total > (2**63 - 1) // max(k, 1):
        raise OverflowError(
            f"T*k = {total}*{k} overflows int64; use DECIMAL ticket math"
        )
    w = F.col(weight_col).cast("long")
    # ticket index at the doc's interval end vs start: integer div on
    # non-negative longs == floor division in both engines
    hi_t = F.expr(f"(__cum * {k}) div {total}")
    lo_t = F.expr(f"((__cum - CAST({weight_col} AS BIGINT)) * {k}) div {total}")
    out = (
        cum_df
        .withColumn("__nt", (hi_t - lo_t).cast("long"))
        .filter(F.col("__nt") >= 1)
        .select(
            F.col(id_col),
            w.alias("weight"),
            F.col("__cum").alias("cum_weight"),
            F.col("__nt").alias("n_tickets"),
        )
    )
    from .dedup import _attach_cached, _attach_layout

    return _attach_layout(
        _attach_cached(out, getattr(cum_df, "_cached_deps", [])),
        getattr(cum_df, "_layout_frames", []),
    )


def split_leakage(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    **neardup_kwargs,
) -> DataFrame:
    """Train/eval LEAKAGE audit — the check that must pass after
    :func:`hash_split` and near-dup ingestion compose: find verified
    near-duplicate pairs whose endpoints landed in DIFFERENT splits.
    Whole-document hash splitting is immune to exact duplicates only
    if dedup ran first and caught everything; near-duplicates (the
    trimmed/mutated copies MinHash exists for) can still straddle the
    boundary and leak eval content into training.  Publishing this
    audit next to the split table is standard practice for the same
    reason decontamination ships :func:`contamination_report`.

    Plan: split assignment is the map-only hash bucket; pair
    generation is :func:`dedup.minhash_verified_neardup_pairs`
    (banded candidates -> exact Jaccard, never the pair space); each
    endpoint's split is COMPUTED on the pair row (:func:`_split_expr`
    over ``id_a``/``id_b`` — r14, guide §2.4 "remove shuffles
    outright").  The pre-r14 shape joined the hash-labeled corpus
    back by id twice; since the split is a pure function of (id,
    seed) and every pair endpoint comes from ``df`` by construction,
    those joins — two corpus-wide scans plus exchanges in the audit's
    execution — attached values the pair row could derive itself.

    Output: ``(id_a, id_b, jaccard, split_a, split_b)`` with
    ``split_a != split_b`` — empty means the split is leakage-free at
    the audited threshold.
    """
    from .dedup import minhash_verified_neardup_pairs

    weights = weights or {"train": 0.90, "eval": 0.10}
    pairs = minhash_verified_neardup_pairs(
        df, text_col=text_col, id_col=id_col,
        jaccard_threshold=jaccard_threshold, **neardup_kwargs,
    )
    return (
        pairs.select(
            "id_a", "id_b", "jaccard",
            _split_expr("id_a", weights, seed).alias("split_a"),
            _split_expr("id_b", weights, seed).alias("split_b"),
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )


def leakage_safe_split(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    out_col: str = "split",
    **neardup_kwargs,
) -> DataFrame:
    """The CONSTRUCTIVE counterpart of :func:`split_leakage` (r10):
    assign splits so near-duplicate leakage cannot occur BY
    CONSTRUCTION — every verified near-dup CLUSTER is split-atomic
    (all members inherit one split), so no pair at or above the
    audited threshold can straddle train/eval.  The audit finds
    leakage after the fact; this prevents it up front — publish both
    (the audit over this function's output is empty by construction
    at the same threshold/parameters, and pytest pins that).

    Plan: :func:`dedup.verified_neardup_clusters` labels the documents
    that participate in any near-dup cluster (banded candidates ->
    exact Jaccard -> hash-min components; never the pair space); the
    split bucket is computed from the CLUSTER id for members and from
    the document id for the un-clustered majority — both map-only hash
    expressions over :func:`split_bucket`, so the only join is the
    cluster-label attach (cluster table is |near-dup docs|-sized, tiny
    relative to the corpus).  Determinism: a pure function of
    (text-derived cluster structure, id, seed) — stable under
    reprocessing; appending NEW near-dups of an eval doc later lands
    them in the eval cluster's split, never in train.

    Caveat the docstring owes the caller: cluster-atomic assignment
    biases split SIZES when clusters are huge (a 1M-doc boilerplate
    clique lands whole in one split) — run the dedup keep-one tier
    first (the corpus-prep composition does), after which clusters are
    near-singletons and the weights hold to within hash noise.
    """
    from .dedup import _attach_cached, neardup_cluster_keys

    weights = weights or {"train": 0.90, "eval": 0.10}
    # r14 (guide §2.4): the assigner only needs each doc's effective
    # cluster key (coalesce(cluster_id, own id)), so it attaches the
    # light per-doc key table instead of the full cluster table —
    # skipping the n_members aggregation and its joins, which this
    # function's plan carried but never read.  The key column rides
    # the dunder convention (r10 ADVICE #3), so a caller frame that
    # already carries ``cluster_id`` is never referenced or shadowed.
    keys = neardup_cluster_keys(
        df, text_col, id_col, jaccard_threshold=jaccard_threshold,
        **neardup_kwargs,
    )
    keyed = df.join(keys, id_col).withColumn(
        "__split_key", F.col("__cluster_key").cast("string")
    )
    out = hash_split(
        keyed, id_col="__split_key", weights=weights, seed=seed,
        out_col=out_col,
    ).drop("__cluster_key", "__split_key")
    # deps ride the RETURNED frame, not the intermediate (the same
    # propagate-don't-drop rule drop_near_duplicates gained this round)
    return _attach_cached(out, getattr(keys, "_cached_deps", []))


def training_shard_layout(
    df: DataFrame,
    shards: int,
    id_col: str = "doc_id",
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global
    sort: every example gets a shard and a position inside it, such
    that readers streaming shard 0..N-1 in position order see a fixed
    pseudo-random permutation of the corpus — the layout step between
    "curated corpus" and "training shards".

    Shard and order both derive from the md5-prefix hash of
    ``(id, seed)`` (:func:`split_bucket` discipline): re-running any
    partition, appending a source, or changing executor counts cannot
    move an example (``rand()``/``repartition`` order can and do),
    and changing ``seed`` is a fresh epoch-level reshuffle.

    Scale shape: shard assignment is map-only; the position is ONE
    keyed window per shard (parallelism = ``shards``, each reducer
    sorts its shard's (hash, id) pairs — choose ``shards`` >= cluster
    cores so no reducer holds more than corpus/shards rows).  No
    global sort, no single-partition stage, text never shuffles if
    the caller projects ids first and joins the layout back.

    Output: ``(id, shard, pos)`` — ``pos`` is 1-based within shard.
    """
    from pyspark.sql import Window

    from .dedup import _md5_60

    h_shard = split_bucket(id_col, seed + ":shard", shards)
    order_h = _md5_60(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + seed + ":pos"))
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("__oh").asc(), F.col(id_col).asc()
    )
    return (
        df.select(F.col(id_col), h_shard.alias("shard"),
                  order_h.alias("__oh"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def _dsir_bucket_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    hash_fn: str,
) -> DataFrame:
    """Hashed bag-of-ngram feature stream for :func:`dsir_logweights`:
    one ``(id, __b)`` row per unigram AND bigram OCCURRENCE (a bag,
    not a set — DSIR's feature vector counts repeats), ``__b`` in
    ``[0, n_buckets)``.

    One tokenize, one explode: the unigram and bigram hash arrays are
    built per row with higher-order transforms over the SAME token
    array projection and concatenated before the single explode
    (the ``ngram_lm_score`` lesson — never re-split text per
    position).  ``hash_fn="md5_60"`` hashes the gram STRING (bigram =
    ``w1 || ' ' || w2``) for the exact DuckDB twin; the default
    ``xxhash64`` hashes token slices variadically — no concat churn —
    and is the scale path."""
    from ..sources import fan_out
    from .dedup import _md5_60
    from .text import tokens

    spark = df.sparkSession
    src = fan_out(df, spark.sparkContext.defaultParallelism, guard=True)
    tk = F.col("__t")
    if hash_fn == "md5_60":
        def uh(i):
            return _md5_60(F.element_at(tk, i))

        def bh(i):
            return _md5_60(
                F.concat(
                    F.element_at(tk, i),
                    F.lit(" "),
                    F.element_at(tk, i + F.lit(1)),
                )
            )
    elif hash_fn == "xxhash64":
        def uh(i):
            return F.xxhash64(F.element_at(tk, i))

        def bh(i):
            return F.xxhash64(
                F.element_at(tk, i), F.element_at(tk, i + F.lit(1))
            )
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    unis = F.transform(F.sequence(F.lit(1), F.size(tk)), uh)
    bis = F.when(
        F.size(tk) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(tk) - 1), bh),
    ).otherwise(F.array().cast("array<bigint>"))
    toked = src.select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= 1)
    return toked.select(
        F.col(id_col), F.explode(F.concat(unis, bis)).alias("__g")
    ).select(id_col, F.pmod(F.col("__g"), F.lit(n_buckets)).alias("__b"))


def dsir_logweights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): score every raw-corpus document by its hashed
    bag-of-ngrams log importance weight under target vs raw unigram+
    bigram bucket distributions.  The published recipe for "select
    pretraining data that looks like the target domain" (the
    reference lakehouse has no selection tier at all; EXT surface,
    SURVEY section 2 X).

    Model: grams (unigrams + bigrams) hash into ``n_buckets`` feature
    buckets; with add-``alpha`` smoothing over the raw-bucket support,

        lam_b = ln( ((ct_b + a) * (Tr + a*m)) /
                    ((cr_b + a) * (Tt + a*m)) )

    where ``cr_b``/``ct_b`` are raw/target bucket counts and
    ``Tr``/``Tt`` the gram totals; a document's log weight is the sum
    of ``lam_b`` over its gram OCCURRENCES (bag semantics).  The
    single-``ln``-of-one-ratio form keeps every intermediate an IEEE
    double both engines compute identically; the per-gram sum goes
    through the ``functions.dsum`` DECIMAL discipline so float logs
    stay engine-portable.

    100-TB shape: the corpus tokenizes ONCE — the gram stream
    pre-aggregates to ``(id, bucket, cnt)`` rows and that ONE keyed
    exchange feeds the raw model, the total, AND the scoring join
    (AQE ReusedExchange, verified in the executed plan).  The
    pre-agg also caps per-document shuffle rows at ``n_buckets``
    regardless of document length (a 100k-token document shuffles at
    most m narrow rows, not 200k gram rows), and the per-gram DECIMAL
    fold becomes an exact ``cnt * decimal(lam)`` — identical value,
    decimal multiplication by an integer is exact.  The model is at
    most ``n_buckets`` rows (broadcast); the totals are one-row
    broadcasts; text never shuffles.

    Buckets the target never hits score
    ``ln((a * (Tr + a*m)) / ((cr + a) * (Tt + a*m)))`` — whose SIGN
    depends on the corpus-size ratio: with a raw corpus much larger
    than the target (the usual DSIR regime) even target-unseen buckets
    can score positive, because the smoothed target prior 1/m exceeds
    a rare bucket's raw relative frequency.  Only the RANKING between
    buckets is meaningful, not the sign; unseen-in-raw buckets cannot
    appear in the scoring stream by construction, so smoothing is
    required for the target side only.

    Output: ``(id, n_grams, logw)`` — rank descending and keep top-k
    (or Gumbel-resample with a deterministic hash race) downstream.
    """
    cg = _dsir_bucket_stream(corpus, text_col, id_col, n_buckets, hash_fn)
    tg = _dsir_bucket_stream(target, text_col, id_col, n_buckets, hash_fn)
    doc_b = cg.groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__cnt"))
    raw = doc_b.groupBy("__b").agg(F.sum("__cnt").alias("__cr"))
    tgt = tg.groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    tot_r = raw.agg(F.sum("__cr").alias("__tr"))
    tot_t = tgt.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__tt"))
    am = float(alpha) * n_buckets
    lam = F.log(
        (
            (F.coalesce(F.col("__ct"), F.lit(0)).cast("double") + F.lit(float(alpha)))
            * (F.col("__tr").cast("double") + F.lit(am))
        )
        / (
            (F.col("__cr").cast("double") + F.lit(float(alpha)))
            * (F.col("__tt").cast("double") + F.lit(am))
        )
    )
    model = (
        raw.join(tgt, "__b", "left")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_t))
        .select("__b", lam.alias("__lam"))
    )
    return (
        doc_b.join(F.broadcast(model), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_grams"),
            F.sum(F.col("__lam").cast("decimal(28,6)") * F.col("__cnt"))
            .cast("double")
            .alias("logw"),
        )
    )


def gumbel_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "gumbel-v1",
    temperature: float = 1.0,
    out_key: str = "sample_key",
) -> DataFrame:
    """Deterministic Gumbel top-k — weighted sampling WITHOUT
    replacement from log-weights (the resampling half of DSIR, Xie et
    al. NeurIPS'23; equivalently the Gumbel-max trick over a softmax):
    each row's sampling key is

        key = logw / temperature + G,   G = -ln(-ln(u))

    and the k largest keys are the sample.  ``u`` is a deterministic
    hash-derived uniform — ``(md5_60(id:seed) % 1e6 + 0.5) / 1e6``,
    the :func:`split_bucket` discipline — never ``rand()``: re-running
    a partition, adding a source, or retrying a failed task cannot
    change the sample (the contamination-by-retry rule), and changing
    ``seed`` draws an independent sample.  ``temperature`` sharpens
    (<1) or flattens (>1) the weight distribution; ``temperature ->
    inf`` degenerates to uniform sampling.

    The key is rounded through DECIMAL(28,6) before ranking so the
    float ``ln`` calls stay engine-portable (the ``dsum`` discipline
    applied to an ORDER BY), with ``id`` as the total-order tiebreak.

    100-TB shape: one map-only projection + a global top-k, which
    Spark compiles to TakeOrderedAndProject — per-partition heaps of
    size k, then a k-row driver merge; no sort, no shuffle of the
    corpus.  Output: the k sampled rows with ``out_key`` attached.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not temperature > 0:
        raise ValueError(
            f"temperature must be positive, got {temperature} "
            "(0 divides the weights by zero; negative inverts them)"
        )
    u = (
        split_bucket(id_col, seed, 1_000_000).cast("double") + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    g = -F.log(-F.log(u))
    key = (
        F.col(weight_col).cast("double") / F.lit(float(temperature)) + g
    ).cast("decimal(28,6)")
    return (
        df.withColumn(out_key, key.cast("double"))
        .orderBy(F.col(out_key).desc(), F.col(id_col).asc())
        .limit(k)
    )
