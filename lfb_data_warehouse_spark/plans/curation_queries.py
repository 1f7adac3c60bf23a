"""Data-curation battery — the remaining operators a 100 TB
training-data pipeline runs between raw scrape and shard writing:
deterministic train/val/test splitting, content-hash sharding, URL
parsing/normalization, multi-grain marts via GROUPING SETS, quantile
(NTILE) binning, and an integer-exact lexical-diversity quality gate.

All queries follow queries.py's determinism rules (exact DECIMAL /
integer arithmetic, explicit casts + aliases on both engines, total
orders under every window). Scale notes per query; the unifying theme
is that split/shard/URL/diversity are PURE MAP passes (zero shuffle,
the decision function is a Catalyst expression on the row itself) and
the two aggregates (grouping sets, ntile) shuffle once on their
natural keys.

Reference parity: the reference has no curation layer (its pipeline
stops at warehouse marts, SURVEY.md §2) — this battery is part of the
beyond-reference LLM-pipeline surface, same tier as datapipe_queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import avg_exact, sum_exact
from ..operators.sampling import hash_split, hash_split_sql
from ..sources.testdata import load_table
from .queries import register

# ---------------------------------------------------------------------------
# Deterministic train/val/test split (hash_split operator)
# ---------------------------------------------------------------------------

_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SALT = "corpus-split-v1"


@register(
    "stratified_split_documents",
    oracle=f"""
    WITH labeled AS (
        SELECT lang, n_chars,
               {hash_split_sql(["doc_id"], _SPLIT_FRACTIONS, _SPLIT_SALT)} AS split
        FROM documents
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM labeled GROUP BY 1, 2
    """,
)
def stratified_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof corpus split: every document gets exactly one of
    train/val/test by salted content hash (mutually exclusive +
    exhaustive hex ranges), so re-runs and late-arriving shards never
    move a document across the split boundary — the property
    ``randomSplit`` cannot give an incremental pipeline. The per-lang
    counts are the split-balance audit a curation run reports.

    Scale: label assignment is a map-side when-chain (zero shuffle,
    survives any repartitioning); the audit aggregate shuffles only
    (lang, split) — 3×|langs| groups."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = hash_split(docs, ["doc_id"], _SPLIT_FRACTIONS, salt=_SPLIT_SALT)
    return labeled.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Content-hash shard assignment (the shard-writer's partitioner)
# ---------------------------------------------------------------------------

_HEX_DIGITS = "0123456789abcdef"


def _shard_col() -> F.Column:
    # first sha256 hex char -> shard 0-15, via a 16-branch when-chain
    # generated from the same table as the oracle CASE
    c = F.substring(F.sha2(F.concat_ws("|", F.lit("shard-v1"), F.col("doc_id").cast("string")), 256), 1, 1)
    expr = F.lit(None).cast("long")
    for i, d in enumerate(_HEX_DIGITS):
        expr = F.when(c == d, F.lit(i).cast("long")).otherwise(expr)
    return expr


def _shard_sql() -> str:
    c = "substring(sha256(concat_ws('|', 'shard-v1', CAST(doc_id AS VARCHAR))), 1, 1)"
    whens = " ".join(f"WHEN {c} = '{d}' THEN {i}" for i, d in enumerate(_HEX_DIGITS))
    return f"CAST(CASE {whens} END AS BIGINT)"


@register(
    "shard_assignment_documents",
    oracle=f"""
    SELECT {_shard_sql()} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY 1
    """,
)
def shard_assignment_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-writer partitioner: stable content-hash shard ids (16-way
    here; the width is the prefix length) with the per-shard balance
    audit (docs, bytes, source spread) a shard-writing job logs before
    committing. Content hashing — not ``doc_id % n`` — so shard sizes
    stay balanced under non-uniform id gaps and the assignment is
    reproducible on any engine.

    Scale: shard id is map-side; the writer path is
    ``df.repartition(n, shard_col).write.partitionBy('shard_id')`` —
    one shuffle keyed exactly like this audit's groupBy. At 100 TB use
    2-3 hex chars (256-4096 shards) so each shard fits an output file
    target; the audit shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn("shard_id", _shard_col()).groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# Seeded global training-order shuffle (epoch ordering for loaders)
# ---------------------------------------------------------------------------

TRAIN_ORDER_SEED = "order-v1-seed42"  # change per epoch for a fresh order
TRAIN_ORDER_SHARDS = 8


@register(
    "training_order_shuffle",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (
               ORDER BY sha256(concat_ws('|', '{TRAIN_ORDER_SEED}',
                                         CAST(doc_id AS VARCHAR))),
                        doc_id) - 1 AS pos
      FROM documents
    )
    SELECT doc_id,
           CAST(pos AS BIGINT) AS order_pos,
           CAST(pos % {TRAIN_ORDER_SHARDS} AS BIGINT) AS shard,
           CAST(pos // {TRAIN_ORDER_SHARDS} AS BIGINT) AS pos_in_shard
    FROM p
    """,
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic training-order shuffle (round 14 — the
    corpus-prep step between sequence packing and shard assignment
    that had no named operator): every document gets its epoch
    position ``order_pos`` = dense rank of ``sha256(seed | doc_id)``,
    a round-robin ``shard`` stripe and the within-shard write order —
    reproducible on any engine with sha256 (the oracle replays the
    identical order in DuckDB; per-document rows, so one transposed
    position anywhere fails the gate).

    Scale: the oracle's ``ROW_NUMBER() OVER (ORDER BY hash)`` is the
    single-reducer naive plan; the engine runs the two-phase
    prefix-sum dense rank (range exchange on the skew-free hash key +
    a partition-counts collect) from operators/ids.py — identical
    answer, no task sees more than one partition. See
    operators/packing.py:training_order_shuffle."""
    from ..operators.packing import training_order_shuffle as tos

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return tos(docs, "doc_id", TRAIN_ORDER_SEED, TRAIN_ORDER_SHARDS).select(
        "doc_id", "order_pos", "shard", "pos_in_shard"
    )


# ---------------------------------------------------------------------------
# URL parsing / normalization (web-scrape provenance battery)
# ---------------------------------------------------------------------------


@register(
    "url_parse_battery",
    oracle="""
    SELECT doc_id,
           source || '.example.org' AS host,
           'https' AS scheme,
           '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path,
           source AS ref_param,
           CAST(2 AS BIGINT) AS path_depth,
           'example.org' AS registered_domain
    FROM documents
    """,
)
def url_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition for scrape provenance: host, scheme, path,
    one query param, path depth, and a registered-domain heuristic
    (last two host labels — the crawl-dedup/per-site-quota key). The
    documents table has no URL column, so the fixture derives one
    deterministically from (source, lang, doc_id) and the oracle
    checks Spark's ``parse_url`` against that ground truth — the
    operator under test is the JVM-side parser, not the derivation.

    Scale: pure map pass (parse_url is a codegen'd JVM builtin, no
    UDF); at 100 TB this runs fused into the ingest scan."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat_ws(
        "",
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.col("source"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    path = F.parse_url(url, F.lit("PATH"))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return docs.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("scheme"),
        path.alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        (F.size(F.split(path, "/")) - 1).cast("long").alias("path_depth"),
        F.concat_ws(".", F.element_at(labels, n - 1), F.element_at(labels, n)).alias(
            "registered_domain"
        ),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS multi-grain mart (one shuffle, three grains)
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_mart",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           CAST(GROUPING(c_mktsegment, o_orderpriority) AS BIGINT) AS grain,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (c_mktsegment), ())
    """,
)
def grouping_sets_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain mart in ONE pass: segment×priority, per-segment, and
    grand total via GROUPING SETS, disambiguated by grouping_id (bit
    vector; verified to match DuckDB's GROUPING() convention —
    leftmost column is the high bit on both engines). Replaces the
    reference's three separate aggregate jobs over the same join
    (SURVEY §2.4 A1 shape) with one shuffle.

    Scale: Spark expands grouping sets BEFORE the exchange, so partial
    aggregation still combines map-side per grain; the broadcast
    customer join keeps the fact scan shuffle-free."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == customer.c_custkey,
    )
    return (
        joined.groupingSets(
            [["c_mktsegment", "o_orderpriority"], ["c_mktsegment"], []],
            "c_mktsegment", "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("grain"),
            F.count(F.lit(1)).alias("order_count"),
            sum_exact("o_totalprice").alias("total_price"),
        )
        .select("c_mktsegment", "o_orderpriority", "grain", "order_count", "total_price")
    )


# ---------------------------------------------------------------------------
# NTILE quantile binning (value-tier segmentation)
# ---------------------------------------------------------------------------


@register(
    "ntile_quartile_acctbal",
    oracle="""
    WITH tiled AS (
        SELECT c_mktsegment, c_acctbal,
               CAST(NTILE(4) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey
               ) AS BIGINT) AS quartile
        FROM customer
    )
    SELECT c_mktsegment, quartile,
           COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
    FROM tiled GROUP BY 1, 2
    """,
)
def ntile_quartile_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning: NTILE(4) value tiers per market segment with
    per-tier balance stats — the exact-quantile segmentation mart
    (approx_percentile_claim covers the sketch path; this is the exact
    window path with a total order so tile boundaries are stable).

    Scale: one shuffle on c_mktsegment; NTILE needs the whole
    partition sorted, so at 100 TB with few segments pre-aggregate or
    switch to the percentile-sketch binning — documented tradeoff,
    this query pins the exact semantics."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    tiled = customer.select(
        "c_mktsegment", "c_acctbal", F.ntile(4).over(w).cast("long").alias("quartile")
    )
    return tiled.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        avg_exact("c_acctbal").alias("avg_bal"),
    )


@register(
    "approx_ntile_price_quartiles",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.25) AS q1,
               quantile_disc(o_totalprice, 0.50) AS q2,
               quantile_disc(o_totalprice, 0.75) AS q3
        FROM orders GROUP BY 1),
    t AS (
        SELECT o.o_orderpriority,
               CAST(CASE WHEN o.o_totalprice <= b.q1 THEN 1
                         WHEN o.o_totalprice <= b.q2 THEN 2
                         WHEN o.o_totalprice <= b.q3 THEN 3
                         ELSE 4 END AS BIGINT) AS tile,
               o.o_totalprice
        FROM orders o JOIN b USING (o_orderpriority))
    SELECT o_orderpriority, tile,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM t GROUP BY 1, 2
    """,
)
def approx_ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALABLE quantile binning (operators/agg.py:approx_ntile) — the
    sketch-boundary alternative to ntile_quartile_acctbal's exact
    window: per-group quartile boundaries via percentile_approx
    (mergeable KLL-class sketch, one partial-aggregation pass) and a
    map-side when-chain assignment, so NO group ever needs its whole
    frame sorted in one task — the formulation that survives a 100 TB
    frame where NTILE's single-reducer-per-partition sort dies.

    Oracle parity: with accuracy ≥ group size the sketch is exact and
    Spark's boundary is the element at rank ceil(p·n) — verified
    identical to DuckDB quantile_disc across sizes/probabilities, so
    the oracle replays boundaries + the same <=-boundary rule. Per-tile
    stats (count/min/max/exact sum) pin every row's assignment."""
    from ..operators.agg import approx_ntile

    orders = load_table(spark, sf_dir, "orders")
    tiled = approx_ntile(
        orders,
        "o_totalprice",
        4,
        accuracy=1_000_000,
        group_cols=["o_orderpriority"],
    )
    return tiled.groupBy("o_orderpriority", "tile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        sum_exact("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Lexical diversity quality gate (integer-exact — no float-order hazard)
# ---------------------------------------------------------------------------

_DIVERSITY_MIN = 0.5  # Simpson diversity below this = repetitive boilerplate


@register(
    "text_token_diversity",
    oracle=f"""
    WITH e AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
        FROM documents
    ),
    c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
    d AS (
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct,
               CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
        FROM c GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_distinct,
           round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
           round(1.0 - CAST(sum_sq AS DOUBLE) / (n_tokens * n_tokens), 6) AS simpson_diversity,
           round(1.0 - CAST(sum_sq AS DOUBLE) / (n_tokens * n_tokens), 6) >= {_DIVERSITY_MIN}
               AS keep
    FROM d
    """,
)
def text_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetitiveness quality gate via Gini-Simpson diversity:
    1 - Σ(cnt/n)² is the probability two random tokens differ — low
    values mean the doc is dominated by a few repeated tokens (the
    boilerplate/spam signature Gopher's repetition rules target).
    Chosen over Shannon entropy deliberately: Σcnt² and n are exact
    integers, so the score has NO float-summation-order or libm-parity
    hazard — bit-identical on any engine, any partitioning (the
    ln-based queries need 6dp rounding for the same guarantee).

    Scale: tokenize→count shuffles on (doc_id, tok) with map-side
    partial aggregation; second aggregate reuses the doc_id-clustered
    distribution (no second exchange in AQE's coalesced plan)."""
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    counts = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sum_sq"),
    )
    n = F.col("n_tokens").cast("double")
    diversity = F.round(F.lit(1.0) - F.col("sum_sq").cast("double") / (n * n), 6)
    return per_doc.select(
        "doc_id", "n_tokens", "n_distinct",
        F.round(F.col("n_distinct").cast("double") / n, 6).alias("type_token_ratio"),
        diversity.alias("simpson_diversity"),
        (diversity >= F.lit(_DIVERSITY_MIN)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (mixing diagnostics)
# ---------------------------------------------------------------------------


@register(
    "cross_source_dup_matrix",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, 'mirror' AS source, text
        FROM documents WHERE doc_id % 50 = 0
    ),
    h AS (
        SELECT doc_id, source, sha256(text) AS text_sha FROM corpus
    )
    SELECT least(a.source, b.source) AS source_a,
           greatest(a.source, b.source) AS source_b,
           COUNT(*) AS dup_pairs,
           COUNT(DISTINCT a.text_sha) AS dup_texts
    FROM h a JOIN h b
      ON a.text_sha = b.text_sha AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source duplication matrix: for every source pair, how many
    identical-text pairs exist — the diagnostic a mixing pipeline runs
    BEFORE setting source weights (two sources sharing most of their
    content should not both get full weight; the remix queries consume
    exactly this signal). Pairs join on the content hash with doc_id<
    ordering (each unordered pair once), sources canonicalized
    least/greatest so (a,b) and (b,a) collapse.

    Scale: the self-join shuffles (hash, id) pairs — 40 bytes/row, not
    bodies — and only hash groups with >1 row produce join output;
    with exact-dup rate d the join output is O(d·n), never O(n²)."""
    docs = load_table(spark, sf_dir, "documents")
    # deterministic cross-source duplicate fixture (every 50th doc gets
    # a 'mirror'-source clone), derived identically in the oracle — the
    # synthetic corpus has no exact dups at small SF, which would make
    # this a trivially-empty gate
    corpus = docs.select("doc_id", "source", "text").unionByName(
        docs.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.lit("mirror").alias("source"),
            "text",
        )
    )
    h = corpus.select(
        "doc_id", "source", F.sha2(F.col("text"), 256).alias("text_sha")
    )
    a, b = h.alias("a"), h.alias("b")
    pairs = a.join(
        b,
        (F.col("a.text_sha") == F.col("b.text_sha"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    return (
        pairs.select(
            F.least("a.source", "b.source").alias("source_a"),
            F.greatest("a.source", "b.source").alias("source_b"),
            F.col("a.text_sha").alias("text_sha"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("dup_pairs"),
            F.count_distinct("text_sha").alias("dup_texts"),
        )
    )


# ---------------------------------------------------------------------------
# Split drift audit (is val/test distributionally representative?)
# ---------------------------------------------------------------------------


@register(
    "split_drift_audit",
    oracle=f"""
    WITH labeled AS (
        SELECT lang,
               {hash_split_sql(["doc_id"], _SPLIT_FRACTIONS, _SPLIT_SALT)} AS split
        FROM documents
    ),
    per AS (
        SELECT lang, split, COUNT(*) AS n FROM labeled GROUP BY 1, 2
    ),
    tot AS (
        SELECT split, CAST(SUM(n) AS BIGINT) AS split_total FROM per GROUP BY 1
    ),
    shares AS (
        SELECT p.lang, p.split,
               CAST(p.n AS DOUBLE) / t.split_total AS share
        FROM per p JOIN tot t ON p.split = t.split
    )
    SELECT tr.lang,
           round(tr.share, 6) AS train_share,
           round(COALESCE(te.share, 0.0), 6) AS test_share,
           round(abs(tr.share - COALESCE(te.share, 0.0)), 6) AS abs_drift
    FROM (SELECT * FROM shares WHERE split = 'train') tr
    LEFT JOIN (SELECT * FROM shares WHERE split = 'test') te
      ON tr.lang = te.lang
    """,
)
def split_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-representativeness audit: per-language share in train vs
    test and the absolute drift — the check that a hash split did not
    (by unlucky hashing or skewed strata) give the eval set a different
    language mix than training. Sums of per-split shares are exact
    count ratios (one double division), rounded at 6dp.

    Scale: reuses the split label (map-side), then two tiny aggregates
    over (lang × split) — nothing touches document bodies."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = hash_split(docs, ["doc_id"], _SPLIT_FRACTIONS, salt=_SPLIT_SALT)
    per = labeled.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n"))
    tot = per.groupBy("split").agg(F.sum("n").cast("long").alias("split_total"))
    shares = per.join(tot, "split").select(
        "lang", "split", (F.col("n").cast("double") / F.col("split_total")).alias("share")
    )
    tr = shares.filter(F.col("split") == "train").select(
        "lang", F.col("share").alias("tr_share")
    )
    te = shares.filter(F.col("split") == "test").select(
        "lang", F.col("share").alias("te_share")
    )
    joined = tr.join(te, "lang", "left")
    te_share = F.coalesce(F.col("te_share"), F.lit(0.0))
    return joined.select(
        "lang",
        F.round("tr_share", 6).alias("train_share"),
        F.round(te_share, 6).alias("test_share"),
        F.round(F.abs(F.col("tr_share") - te_share), 6).alias("abs_drift"),
    )
