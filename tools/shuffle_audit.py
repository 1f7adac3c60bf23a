"""Measure the actual shuffle budget of every headline query.

SCALE.md claims each headline query carries only its irreducible
shuffles; tests/test_plans.py pins the plan SHAPES. This tool measures
the BYTES: it runs each headline query to the noop sink in a session
with the Spark event log enabled, tagging each query with its own job
group, then parses the event log's per-task metrics into per-query

  input records read      (scan volume after pushdown / pruning)
  shuffle records written (rows entering exchanges) + MB
  shuffle MB read         (what leaves exchanges)

The headline number is `sh/in` — shuffle records written per input
record. A query with sh/in ≪ 1 is map-side-bound (broadcast joins and
partial aggregation doing their job): the shape that survives a
1000-executor scale-up, because network traffic stays a small fraction
of scan volume no matter how many executors split the scan. sh/in near
or above 1 means every scanned row crosses the network at least once —
acceptable only for irreducible shuffles (full-diff joins, global
windows). (Bytes Read is NOT used as the denominator: the vectorized
local-fs parquet reader under-reports it; record counts are exact.)

Usage: python tools/shuffle_audit.py  →  markdown table on stdout
(committed as SHUFFLE.md). sf via $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402


def run_tagged(spark, sf_dir: str, runners: dict, prefix: str = "") -> None:
    sc = spark.sparkContext
    for name, fn in runners.items():
        sc.setJobGroup(prefix + name, name, interruptOnCancel=False)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc.setJobGroup("", "")


def parse_events(event_dir: str) -> dict[str, dict[str, int]]:
    """Aggregate task metrics per job group from the event log."""
    job_group: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    totals: dict[str, dict[str, int]] = {}
    # Spark 4 writes a rolling event-log DIRECTORY per app
    # (eventlog_v2_<appid>/events_1_<appid> + appstatus marker)
    files = []
    for root, _dirs, fnames in os.walk(event_dir):
        for f in fnames:
            if f.startswith("events") or (f.startswith("local-") and "." not in f):
                files.append(os.path.join(root, f))
    for path in files:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
                    jid = ev["Job ID"]
                    job_group[jid] = group
                    for sid in ev.get("Stage IDs", []):
                        stage_job[sid] = jid
                elif kind == "SparkListenerTaskEnd":
                    jid = stage_job.get(ev.get("Stage ID", -1))
                    group = job_group.get(jid, "")
                    if not group or group.startswith("__warm__:"):
                        continue
                    m = ev.get("Task Metrics") or {}
                    t = totals.setdefault(
                        group,
                        {
                            "input_records": 0,
                            "shuffle_write": 0,
                            "shuffle_write_records": 0,
                            "shuffle_read": 0,
                            "tasks": 0,
                        },
                    )
                    t["tasks"] += 1
                    t["input_records"] += (m.get("Input Metrics") or {}).get(
                        "Records Read", 0
                    )
                    sw = m.get("Shuffle Write Metrics") or {}
                    t["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)
                    t["shuffle_write_records"] += sw.get("Shuffle Records Written", 0)
                    sr = m.get("Shuffle Read Metrics") or {}
                    t["shuffle_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                        "Local Bytes Read", 0
                    )
    return totals


def mb(n: int) -> str:
    return f"{n / 1e6:.1f}"


_INC_LABEL_DIRS: dict[str, str] = {}


def _inc_labels_path(spark, sf_dir: str) -> str:
    """Materialize YESTERDAY's labels (old-corpus components) once per
    (process, sf_dir) — the state a daily deployment reads from disk.
    Called untagged from main() so the bootstrap never pollutes the
    measured increment."""
    import tempfile

    from pyspark.sql import functions as F

    from lfb_data_warehouse_spark.operators.dedup import all_pairs_jaccard
    from lfb_data_warehouse_spark.operators.graph import connected_components_star
    from lfb_data_warehouse_spark.plans.datapipe_queries import (
        JACCARD_N,
        JACCARD_THRESHOLD,
        NEWBATCH_MOD,
        NEWBATCH_REM,
    )
    from lfb_data_warehouse_spark.sources.testdata import load_table

    if sf_dir not in _INC_LABEL_DIRS:
        docs = load_table(spark, sf_dir, "documents")
        old = docs.filter(~(F.col("doc_id") % NEWBATCH_MOD == NEWBATCH_REM))
        pairs = all_pairs_jaccard(
            old, "doc_id", "text",
            shingle_n=JACCARD_N, threshold=JACCARD_THRESHOLD, group_col="source",
        )
        d = tempfile.mkdtemp(prefix="lfb_inc_labels_")
        connected_components_star(pairs, src="id_a", dst="id_b").write.mode(
            "overwrite"
        ).parquet(d)
        _INC_LABEL_DIRS[sf_dir] = d
    return _INC_LABEL_DIRS[sf_dir]


def incremental_dedup_step(spark, sf_dir: str):
    """The DAILY INCREMENT alone — what actually runs per ingest once
    yesterday's labels exist: new-batch pair finding (new×new +
    new×old, old side batch-pruned) + label fold + survivor update.
    The registered gate (incremental_dedup_survivors) measures the
    whole bootstrap-included chain; this row isolates the recurring
    cost, which is the |new batch| bound SCALE.md claims."""
    from pyspark.sql import functions as F

    from lfb_data_warehouse_spark.operators.dedup import incremental_jaccard_pairs
    from lfb_data_warehouse_spark.operators.graph import incremental_components
    from lfb_data_warehouse_spark.plans.datapipe_queries import (
        JACCARD_N,
        JACCARD_THRESHOLD,
        NEWBATCH_MOD,
        NEWBATCH_REM,
    )
    from lfb_data_warehouse_spark.sources.testdata import load_table

    labels = spark.read.parquet(_inc_labels_path(spark, sf_dir))
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % NEWBATCH_MOD == NEWBATCH_REM
    old, new = docs.filter(~is_new), docs.filter(is_new)
    new_edges = incremental_jaccard_pairs(
        old, new, "doc_id", "text",
        shingle_n=JACCARD_N, threshold=JACCARD_THRESHOLD, group_col="source",
    ).select("id_a", "id_b")
    merged = incremental_components(labels, new_edges, src="id_a", dst="id_b")
    sizes = merged.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    drop = merged.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    canon = (
        merged.filter(F.col("node") == F.col("component"))
        .join(sizes, "component")
        .select(F.col("node").alias("doc_id"), "cluster_size")
    )
    return (
        docs.join(drop, "doc_id", "left_anti")
        .join(canon, "doc_id", "left")
        .select(
            "doc_id", "source",
            F.coalesce("cluster_size", F.lit(1).cast("long")).alias("represents"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    event_dir = tempfile.mkdtemp(prefix="spark-shuffle-audit-")
    try:
        spark = get_spark(
            "shuffle_audit",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{event_dir}",
                "spark.eventLog.compress": "false",
            },
        )
        runners = {n: REGISTRY[n].fn for n, s in REGISTRY.items() if s.headline}
        # bench-only extra entries (e.g. the persisted-index IVF search)
        # are part of the measured perf surface too
        import bench as bench_mod

        runners.update({n: getattr(bench_mod, n) for n in bench_mod.EXTRA_BENCH})
        # non-headline queries whose shuffle-budget claims VERDICT r3
        # item 7 asked to measure, not just plan-pin
        AUDIT_EXTRA = (
            "grouping_sets_mart",
            "zorder_clustering_locality",
            "cross_source_dup_matrix",
            "span_dedup_documents",
            "text_unigram_logprob",
            "dedup_components_star",
            "ann_pq_adc_topk",
            "gopher_quality_gates",
            "text_char_entropy",
            "retention_cohort_weekly",
            # round-5 additions: the incremental-dedup traffic bound
            # (claimed |new batch|-bounded), the IVF x PQ composition,
            # the sketch-boundary NTILE, the learned codebooks, and the
            # full-recipe corpus composite
            "incremental_dedup_survivors",
            "incremental_dedup_components",
            "ann_ivf_pq_topk",
            "ann_ivf_pq_residual_topk",
            "ivf_incremental_append",
            "embedding_pca_claim",
            "heavy_hitters_sketch",
            "text_heavy_hitters",
            # round-5 late analytics gates
            "sketch_overlap_yoy",
            "ewma_customer_spend",
            "anomaly_daily_revenue",
            "rfm_customer_scores",
            "basket_brand_affinity",
            "event_transition_matrix",
            "pareto_abc_brands",
            "customer_order_gap_stats",
            "dup_cluster_size_histogram",
            "approx_ntile_price_quartiles",
            "pq_codebook_learned",
            "prepare_training_corpus",
            # round-6 additions: the IO-contract composite (CSV scan +
            # conform + one-aggregate check battery) and the hot-entity
            # audit (one map-side-combined pass)
            "io_contract_battery",
            "history_length_audit",
            # round-11 additions: the audio tier (stateful ADPCM, FLAC
            # bitstream) and the JPEG factor/precision tail — all
            # claimed zero-exchange map passes; measure, don't assert
            "adpcm_decode_stats",
            "flac_decode_stats",
            "jpeg_311_decode_stats",
            "jpeg12_progressive_stats",
            "line_dedup_boilerplate",
            # round-12 additions: the holistic salted collect (claimed
            # two bounded exchanges of (key, salt, set) partials, never
            # raw rows past phase 1), the stereo-FLAC zero-exchange
            # pass, and the rewritten five-format poison battery
            "salted_collect_users",
            "flac_stereo_decode_stats",
            "media_poison_battery",
            # round-13/14 additions: blocked Levenshtein (claimed the
            # exchange carries only (id, block, 40-char prefix)), the
            # AVI/MJPEG walk (claimed zero-exchange map pass), the
            # seeded training-order shuffle (one range exchange on the
            # hash key), and the bigram-LM upgrade (claimed the counts
            # exchanges are vocabulary-bounded and scoring adds no
            # second corpus shuffle)
            "dedup_edit_distance_pairs",
            "avi_mjpeg_decode_stats",
            "training_order_shuffle",
            "text_unigram_logprob",
            # perceptual image dedup (claimed: only (doc_id, 64-char
            # hash) crosses the exchange — round 14c adds the banded
            # hamming self-join, still hash-bounded) and the AVI-leg
            # frame sampler
            "image_ahash_dedup",
            "multimodal_frame_sample",
            # round 14c: the VAD leg rides the downsample pass —
            # claimed still a zero-exchange map pass (counts only)
            "audio_downsample_stats",
        )
        runners.update({n: REGISTRY[n].fn for n in AUDIT_EXTRA})
        # bootstrap yesterday's labels UNTAGGED so the audit-only
        # incremental row measures only the recurring daily step
        _inc_labels_path(spark, "/root/testdata/sf0.001")
        _inc_labels_path(spark, sf_dir)
        runners["incremental_dedup_step"] = incremental_dedup_step
        names = list(runners)
        # warm pass at sf0.001 under a prefix the parser ignores
        # (codegen/footers), then one measured tagged pass at sf_dir
        run_tagged(spark, "/root/testdata/sf0.001", runners, prefix="__warm__:")
        run_tagged(spark, sf_dir, runners)
        spark.stop()

        totals = parse_events(event_dir)
        print(f"# SHUFFLE — measured shuffle budget at {sf_dir}\n")
        print("Generated by `python tools/shuffle_audit.py` (event-log task")
        print("metrics, one tagged pass per headline query after a sf0.001")
        print("warmup pass that the parser excludes by job-group tag).")
        print("`sh/in` = shuffle records written per input record — the")
        print("fraction of scanned rows that must cross the network; the")
        print("number that decides whether a plan survives 1000 executors.\n")
        print(
            "| query | tasks | input rows | shuffle rows | shuffle MB (w/r) | sh/in |"
        )
        print("|---|---|---|---|---|---|")
        for name in names:
            t = totals.get(name)
            if not t:
                print(f"| {name} | — | — | — | — | — |")
                continue
            ratio = (
                t["shuffle_write_records"] / t["input_records"]
                if t["input_records"]
                else 0.0
            )
            print(
                f"| {name} | {t['tasks']} | {t['input_records']:,} | "
                f"{t['shuffle_write_records']:,} | "
                f"{mb(t['shuffle_write'])} / {mb(t['shuffle_read'])} | {ratio:.3f} |"
            )
        print("""
Reading the numbers:

- **flagship_star_fact: 0 shuffle rows** for ~785k scanned — every
  dimension join broadcasts and there is no aggregation exchange (the
  fact rows never leave their scan partitions). This is the plan
  property that matters at 100 TB, now measured rather than claimed.
- Scan-aggregate queries (q1/q5/q6/q9, marts, pivot, brand-revenue)
  shuffle only their post-partial-aggregation group rows: sh/in ≈ 0.
- The as-of/interval/salted designs hold: ≤ 4% of scanned rows cross
  the network (bucket replication and salting are row-bounded).
- q21 (0.38) and q18 (0.19) carry genuinely irreducible same-key
  fact-fact shuffles; with bucket-written tables they drop to zero
  (proven in `bucketed_join_colocated`). q18's RATIO rose in r14 while
  its absolute shuffle rows fell (177k → 147k): the carried-total
  rewrite removed the second lineitem scan, so the input-row
  denominator halved — read sh/in movements against the absolute
  columns whenever a change removes redundant scans.
- The r14 optimization round cut the absolute shuffle budget of every
  row it touched: `basket_brand_affinity` 2.37M → 296k shuffle rows
  (the order-key SortMergeJoin replaced by map-side pair generation),
  `dedup_minhash_lsh` sh/in 16.5 → 5.8 (signatures computed once),
  `prepare_training_corpus` 26.4k → 15.0k, `sketch_overlap_yoy`
  79k → 15k, `semantic_dedup_keep` 14.3k → 12.3k. The exact-dedup
  family's sh/in went UP (e.g. `dedup_keep_canonical` 35 → 51) for
  the q18 reason: their irreducible pair traffic is unchanged while
  the redundant tokenize/scan passes that used to inflate the input
  denominator are gone.
- `window_trailing_30d` = 1.0 by necessity: a per-key time-range window
  must co-locate each key's rows once. Irreducible, and exactly 1× —
  no accidental double exchange.
- documents/embeddings queries carry a +1.0 tax from the small-file
  fan-out `repartition` in the loader (one parquet file at test SF —
  at warehouse scale inputs arrive pre-partitioned and that branch is
  a no-op, see sources/testdata.py). minhash's ratio is dominated by
  band-signature rows (4/doc) and candidate-verification traffic —
  ~100× less than an exploded-shingle formulation.
- `ivf_search_persisted` (< 1.0): searching the parquet-persisted IVF
  index shuffles only probed-list candidates into the per-probe top-k
  exchange — the corpus-side index rows themselves stay where the
  partitioned-by-list parquet put them. The inline-rebuild gate query
  (no longer benched) additionally paid the index-build shuffles every
  run.

Audited non-headline rows (VERDICT r3 item 7 — plan-pinned claims,
now measured):

- `grouping_sets_mart` ≈ 0: ONE Expand + partial aggregation — the
  whole cube ships only its group rows, confirming the single-Expand
  plan pin.
- `zorder_clustering_locality` ≈ 0: the Morton-key locality AUDIT is a
  scan-side aggregate; the clustering write itself (the
  repartitionByRange) is in `clustered_write_skipping`'s budget.
- `cross_source_dup_matrix` (~0.5): only shingle-bucket candidate rows
  cross the network — half of input at test SF, bounded by band width
  not corpus size.
- `span_dedup_documents` (~27 vs 5k DOC inputs): the unit crossing the
  exchange is the PARAGRAPH span (~27 spans/doc here), each exactly
  once into the span-hash groupBy — there is no per-pair or windowed
  traffic, so it scales with corpus token count, not doc count².
- `text_unigram_logprob` (~2.4 since the round-14 bigram upgrade; was
  ~1.1 unigram-only): TWO counting passes over the train slice — token
  rows into the bounded (V=256) vocab aggregate, pair rows into the
  bounded (B=512) bigram aggregate — both map-side-partial, both
  carrying (token/pair, count) never documents; the interpolated
  scoring pass itself adds ZERO shuffle rows (literal maps inside
  array HOFs — the model ships in the plan, not over the network).
- `dedup_components_star` (~52 vs keep_canonical's 35): the log-round
  guarantee costs ~1.5× the propagation variant's traffic on easy
  graphs (each star round re-materializes the full edge set both
  directions plus the fixpoint subtract) — the premium that buys
  O(log n) rounds when a chain-shaped cluster would stall min-label
  propagation at O(diameter).
- `gopher_quality_gates` / `text_char_entropy` at exactly 1.000: the
  gates themselves add ZERO shuffle rows — the measured 1.0 is
  entirely the documents loader's small-file fan-out (same tax as
  text_quality_stats; absent at warehouse scale), confirming the
  map-only plan pin.
- `ann_pq_adc_topk` (~1.2): the embeddings loader tax plus the
  per-probe top-k rows; encode and LUT scoring contribute nothing —
  candidate vectors never cross the network, only their 4-code rows
  into the final window.
- `retention_cohort_weekly` (0.06): user-keyed aggregate + distinct +
  join co-partition under one exchange family; only per-user week
  rows move, never events.
- Round-5 rows:
  - `prepare_training_corpus` (1.40): the full-recipe composite after
    inlining the Gopher/repetition gates as map-side predicates —
    round 5 first measured it at 10.8 sh/in with doc_id semi-joins
    against the registered gate queries, and the inline rewrite cut
    the shuffle budget 12× (310.7k → 26.4k rows). What remains is the
    irreducible set: SemDeDup's within-cluster pairs + drop anti-join,
    the content-hash dedup window, and the packing prefix sum.
  - `incremental_dedup_survivors` / `_components` (~16-19): the
    REGISTERED gates deliberately include the old-corpus label
    bootstrap (so the oracle can demand equality with a from-scratch
    recompute); their budget is therefore ≈ the full dedup chain's.
  - `incremental_dedup_step` (6.1, audit-only): the recurring DAILY
    increment measured against materialized yesterday-labels — 155k
    shuffle rows vs the bootstrap-included 578k, i.e. the per-ingest
    cost is ~27% of a full recompute at a 20%-of-corpus batch and
    scales with the batch (+ its matched old docs), not the corpus:
    the old side is pruned by a broadcast semi-join on the batch's
    shingle vocabulary before anything shuffles.
  - `ann_ivf_pq_topk` (1.06): embeddings loader tax + per-probe top-k
    rows only — the composed index's candidates cross as 4-code rows
    restricted to probed lists (vs ann_pq_adc_topk's 1.2 over ALL
    candidates; the gap widens with nlist).
  - `approx_ntile_price_quartiles` (0.000): one percentile_approx
    partial-aggregation pass (25 sketch rows crossed) + a broadcast
    boundary join — the whole point vs the exact window's full sort.
  - `pq_codebook_learned` (2.1): m×iters Lloyd passes over (id,
    subvector) rows; bounded by m · iters · corpus, never pairs.
- Round-5 late additions:
  - `ann_ivf_pq_residual_topk` (1.25 vs raw ivfpq's 1.06): same
    codes-only candidate traffic; the extra ~0.2 is the residual
    build's assignment-frame join to the broadcast centroid set
    (encode happens on the joined frame). Scan/search cost is
    otherwise identical to the raw variant — the recall difference,
    not the traffic, is the decision axis (measured by
    `ivfpq_residual_recall_audit`).
  - `ivf_incremental_append` (0.79): centroid build on the old 90% +
    one per-id max-by over batch rows; the old inverted list is never
    re-shuffled. In production only the |new batch| assignment moves.
  - `embedding_pca_claim` (1.02): the loader fan-out plus TWO 1-row
    exchanges (the moment pass and the projection-variance pass) —
    the covariance itself crosses the network as one dim(dim+3)/2
    scalar row per partition, invisible at this precision.
  - `heavy_hitters_sketch` (48.9k rows) vs `text_heavy_hitters`
    (24.6k): on THIS corpus the exact path shuffles LESS — the
    per-source vocabulary (~1.2k terms) is far below the sketch's
    partitions × keys × capacity envelope, so the MG machinery can't
    pay for itself. That is exactly the claim structure the row
    exists to pin: the sketch's traffic is CAPACITY-bounded
    (independent of vocabulary), the exact path's is
    VOCABULARY-bounded — at a web-scale billion-term vocabulary the
    exact groupBy's post-combine shuffle grows without limit while
    the sketch's stays partitions × capacity. Both rows are measured
    so the crossover is arithmetic, not assertion.
- Round-5 analytics-gate rows:
  - `pareto_abc_brands` (0.000), `anomaly_daily_revenue` (0.03),
    `ewma_customer_spend` / `rfm_customer_scores` (0.10),
    `sketch_overlap_yoy` (0.26): all collapse the fact table to
    entity/day/brand/year rows before any ordered or pairwise work —
    the shuffles carry aggregates, never facts.
  - `event_transition_matrix` (1.00) and `customer_order_gap_stats`
    (1.10): per-entity sequence windows — every event/order crosses
    once into its entity's partition, the irreducible cost of
    ordering a history; everything downstream is |types|²- or
    |customers|-sized.
  - `basket_brand_affinity` (1.29): the DISTINCT (order, brand)
    reduction is the mitigation — the pair join shuffles basket-brand
    rows (≤ brands per basket), not lineitems, and the 1.29 is
    dominated by the distinct itself over the widest fact table.
  - `dup_cluster_size_histogram` (35.1): inherits the FULL
    pair→components chain budget (same class as
    incremental_dedup_survivors' 16.4 — shingle fan-out + banded
    pairs + star rounds against a small doc-count denominator); the
    histogram itself adds only two tiny aggregations on top of the
    chain it summarizes, and in production it reads the ALREADY
    MATERIALIZED labels (the incremental_dedup_step path) instead of
    recomputing them.
- Round-6 rows:
  - `io_contract_battery` (0.25): the contract checks ride ONE
    aggregate pass over the conformed CSV read; the shuffle is
    entirely the exact PK-uniqueness countDistinct (one row per
    distinct orderkey after map-side partials — the irreducible cost
    of an EXACT uniqueness proof; at warehouse scale swap in
    approx_count_distinct or the HLL mart for a sketch-sized check).
    Input counts the schema-inference pass too: inference costs one
    extra full scan of the files, which is why the loaders prefer
    explicit schemas everywhere else.
  - `history_length_audit` (0.10): per-entity count rows only — the
    guard that certifies grouped-collect folds costs one
    map-side-combined aggregate, nothing entity-history-sized.
- Round-8 rows:
  - `stream_sliding_bench` (1.0): each event crosses the exchange into
    the state store EXACTLY ONCE across all 8 triggers — the sh/in of
    1.000 IS the incremental-state claim in row units. The naive
    recompute-per-arrival twin shuffles the cumulative corpus every
    refresh (N·(K+1)/2 = 4.5× the rows at K=8, growing linearly in K);
    its seconds-side premium at toy scale is per-trigger machinery
    (BASELINE.md round-8 section), but THIS column is the one that
    scales: streaming state keeps shuffle volume arrival-bounded while
    the naive path's is history-bounded.
  - The round-8 pixel-decode gates (`png_pixel_decode_stats`,
    `jpeg_pixel_decode_stats`) and the structured-corpus recall audit
    are correctness gates, not suite rows: the decoders are map-only
    Arrow passes (zero shuffle by construction) and the audit's
    shuffle shape is identical to `ivfpq_residual_recall_audit` above.
  - Same for the round-9 media tier (`multimodal_resize` — real
    decode→box-downscale→re-encode, `multimodal_frame_sample` — real
    container walk + per-frame decode, `jpeg_subsampled_decode_stats`,
    `palette_png_decode_stats`): all are single mapInPandas passes
    whose only exchange is load_table's 8-byte-id fan-out; payload
    bytes never cross a stage boundary, which is the plan property
    that matters at 100 TB (SCALE.md, media bullet).
- Round-11 rows:
  - The audio tier (`adpcm_decode_stats`, `flac_decode_stats`) and the
    JPEG tail (`jpeg_311_decode_stats`, `jpeg12_progressive_stats`)
    measure exactly like their media siblings: **0.0 MB exchanged**,
    sh/in ≈ 0.08 — the only shuffle rows are the loader's 8-byte-id
    fan-out plus the per-doc stats rows entering the final collect.
    The stateful decoders (ADPCM's predictor walk, FLAC's Rice +
    prediction + CRC + MD5 pipeline) are pure per-payload CPU; state
    never spans rows, so nothing ever crosses the network.
  - `line_dedup_boilerplate` (sh/in 2.7, 3.8 MB written at sf0.1):
    the irreducible line-frequency exchange — lines explode ~3× per
    doc map-side and are hashed BEFORE shuffling, so the exchange
    carries (sha256, doc_id) pairs, never line text; the corpus-size
    term rides a broadcast 1-row aggregate and the boilerplate drop
    join broadcasts the (tiny) frequent-line set. At 100 TB the
    shuffle is line-count-bounded at ~40 bytes/line vs the multi-KB
    documents that stay put.
- Round-13/14 rows:
  - `dedup_edit_distance_pairs` (sh/in exactly 1.000, 0.9 MB at
    sf0.1): ONE row per document enters the exchange — (id, block
    key, 40-char ASCII-folded prefix), never full text; the
    within-block self-join reads the same exchange twice (w 0.9 /
    r 1.8 MB). The quadratic lives inside blocks after the exchange
    and is bounded by block size (tools/edit_blocking_probe.py's
    linear-vs-quadratic table).
  - `avi_mjpeg_decode_stats` (sh/in 0.059, 0.0 MB): video joins the
    media tier's zero-exchange shape — the AVI tree walk and the
    per-frame JPEG entropy decode are per-payload CPU inside one
    Arrow pass; only the loader's 8-byte-id fan-out and per-frame
    stats rows move.
  - `training_order_shuffle` (sh/in 1.002, 0.8 MB): the irreducible
    epoch-shuffle exchange — each row crosses ONCE as (doc_id,
    64-char hash) into the range exchange; the dense-rank offsets ride
    a partition-counts collect (rows = partitions, not data) and a
    broadcast join; the shard stripe is a map-side expression. At
    100 TB this is the floor for a global deterministic permutation:
    one row-width-bounded pass, no global window.
  - `image_ahash_dedup` (sh/in 2.257, 0.7 MB): pixels never leave the
    Arrow decode pass — the exchanges carry (doc_id, 64-char hash)
    into the per-hash windows plus the round-14c banded multi-index
    hamming join's irreducible fan-out: 4 (band, 16-char slice) rows
    per document (read by both sides of the self-join) and the
    surviving near-dup pairs. The per-bucket quadratic is
    bucket-bounded BY FIXTURE DESIGN TOO: the first fixture's
    `3x+5y+7g` lattice differed across groups only by a brightness
    shift — invisible to aHash by design — so most of the corpus
    collapsed into a few giant hash classes and the join measured
    sh/in 47; the quadratic `x²(g%11)+y²(g%13)` terms restore the
    realistic regime (max hash class 3, max band bucket 24 at sf0.1).
    The degenerate-mass lesson generalizes: on a corpus with massive
    EXACT duplication, collapse exact-hash classes first
    (exact_dup_groups) and radius-pair the distinct hashes.
    `multimodal_frame_sample` with the AVI leg stays at sh/in 0.143,
    0.0 MB; `audio_downsample_stats` with the round-14c VAD leg stays
    a zero-exchange map pass (sh/in 0.091, 0.0 MB — the VAD counts
    ride the same per-clip Arrow pass), and the scene-cut columns
    leave `avi_mjpeg_decode_stats` at its media-tier shape (sh/in
    0.059, 0.0 MB — frame diffs computed inside the batch, no raster
    self-join).""")
    finally:
        shutil.rmtree(event_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
