"""The wave-synchronous crawl loop (SURVEY.md §3.2).

Each wave is ONE iteration of the driver-side Python loop (Catalyst has
no fixpoint operator; SURVEY.md §4.3) and every iteration reads its
input state from the previous wave's committed snapshot and writes the
next snapshot. That design makes every wave a resume: lineage truncates
at the parquet boundary (plans never grow across waves), and killing
the process between any two commits and restarting provably continues
identically — the resume test is just the crawl loop itself.

Wave w dataflow (all lazy until the snapshot writes):

  frontier_w ──budget_select──▶ selected ──⋈ pagestore──▶ fetched
       │                           │                         │
       │                           └──anti-join──┐     decode_validate
       │                                         │           │
       │              trace_w ◀──with_global_seq─┼───────────┤
       │              (one combined output:      │     extract_candidates
       │               seq + page verdicts +     │           │
       │               partition_id lineage)     │           │
       │                          new = candidates ∖ seen (bloom-accelerated)
       │                                         │
  frontier_{w+1} = (frontier_w ∖ selected) ∪ robots_gate(new)   [salted]
  seen_{w+1}    += new            bloom_{w+1} = bloom_w | bits(new)

Per-wave Spark actions are a deliberately minimal FIVE on the steady
path (VERDICT.md r4 next-round #1 — the fixed per-wave job floor is
the scale-killer class at high parallelism): one materialize job
(fetch+validate+probe, with the fetch count riding an observe() and
the bloom-positive pid collect riding the same action), the seen /
frontier / bloom state writes, and one combined output write
(trace ⊇ pages ⊇ metrics; see :func:`read_pages` /
:func:`read_metrics`).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import DEFAULT_BUDGET
from ..functions.spark_udfs import canonicalize_udf, domain_col, url_hash_col
from ..operators.fetch import (
    SyntheticPagestore,
    decode_validate,
    fetch_join,
    synthetic_fetch_validate,
)
from ..operators.links import extract_candidates
from ..operators.politeness import PRIORITY_COLS, budget_select, robots_gate
from ..operators.cuckoo import (
    delete_cuckoo,
    empty_cuckoo,
    grow_saturated_cuckoo,
    probe_cuckoo,
    update_cuckoo,
)
from ..operators.seen import (
    empty_bloom,
    exact_new,
    grow_saturated_shards,
    new_candidates,
    probe_bloom,
    update_bloom,
    with_pid,
    zeroed_like,
)
from ..operators.seq import with_global_seq
from ..sources.tableio import SnapshotStore

FRONTIER_COLS = ["url", "url_hash", "domain", "depth", "discovered_wave"]


def _run_concurrently(jobs) -> None:
    """Submit independent Spark jobs from driver threads (supported by
    the Spark scheduler) so their fixed costs overlap. Exceptions from
    any job propagate."""
    from concurrent.futures import ThreadPoolExecutor

    profile = os.environ.get("TS_CRAWL_PROFILE") == "1"

    def timed(j):
        if not profile:
            return j

        def wrapper():
            t0 = time.time()
            try:
                return j()
            finally:
                print(f"    [job {j.__name__}] {time.time() - t0:.2f}s",
                      flush=True)
        return wrapper

    with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        futures = [ex.submit(timed(j)) for j in jobs]
        for f in futures:
            f.result()

PAGESTORE_COLS = [
    "url", "url_hash", "image_id", "bytes", "w", "h", "fmt",
    "caption", "ref_caption", "phash", "ref_bytes", "html",
]

# page-verdict columns carried by the combined `trace` output table
# (one physical write per wave — VERDICT.md r4 next-round #1)
PAGE_COLS = [
    "wave", "url", "url_hash", "image_id", "caption", "fmt", "w", "h",
    "status", "n_bytes", "decode_ok", "psnr", "psnr_ok",
    "phash_match", "caption_ok", "valid",
]


def read_pages(spark: SparkSession, store: "SnapshotStore") -> DataFrame:
    """Per-page fetch/validation verdicts across all committed waves —
    a column selection of the combined ``trace`` output table."""
    return store.read_outputs(spark, "trace").select(*PAGE_COLS)


def read_metrics(spark: SparkSession, store: "SnapshotStore") -> DataFrame:
    """Per-partition lineage + metrics (A18) across all committed waves,
    rolled up from the combined ``trace`` table's ``partition_id``
    lineage column (captured from the wave's verdict cache before the
    trace sort reshuffles rows)."""
    tr = store.read_outputs(spark, "trace")
    return (
        tr.groupBy("wave", "partition_id")
        .agg(
            F.count("*").alias("fetched"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("missing"),
            F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("decoded"),
            F.sum(F.when(F.col("valid"), 1).otherwise(0)).alias("valid_rows"),
            F.sum("n_bytes").alias("bytes"),
            F.min(F.when(F.col("status") == 200, F.col("psnr"))).alias("psnr_min"),
        )
    )


@dataclass(frozen=True)
class CrawlConfig:
    max_waves: int = 8
    default_budget: int = DEFAULT_BUDGET
    use_bloom: bool = True
    bloom_shards: int = 8
    bloom_bits: int = 1 << 16     # per shard; size for ~14 bits/key at scale
    bloom_k: int = 5
    # which probabilistic prefilter backs the seen check when use_bloom
    # is on: "bloom" (operators/seen.py) or "cuckoo" (operators/
    # cuckoo.py — adds deletion for seed revocation; BASELINE.json:6
    # "partitioned cuckoo/bloom"). Same pid sharding, same exact
    # residual, same snapshot lifecycle; the state table is named after
    # the filter.
    seen_filter: str = "bloom"
    cuckoo_buckets: int = 1 << 12  # per shard; 4 slots each
    salt_buckets: int = 0         # >1 enables two-phase budget top-k
    frontier_salt: int = 8        # salted repartition width (A17)
    pagestore_buckets: int = 0    # >0: pagestore is bucket-partitioned (DPP)
    # waves up to this size sort the trace in ONE window task (cheapest:
    # no range-sampler/count mini-jobs); larger waves use the scalable
    # range-partitioned with_global_seq. Round 1 hard-coded 2M, which
    # put a 125k-row single-task sort on the scaling bench's hot path
    # (VERDICT.md "What's wrong" #3; ADVICE.md) — now a tunable with a
    # default small enough that every bench-scale wave parallelizes.
    trace_single_task_rows: int = 50_000
    # Salted phase-1 budget top-k only engages above this frontier row
    # count (VERDICT.md r4 next-round #2): phase 1 exists to bound a
    # single hot domain's window input, which only matters when one
    # domain can hold millions of rows — below this threshold the extra
    # (domain, salt) window stage is pure fixed cost that dilutes
    # scaling efficiency (measured: budget_select phase eff 0.21 at
    # (6,24)). Selection is provably identical either way (phase 1
    # keeps a superset of every domain's true top-budget; pytest pins
    # salted == exact and the golden tests force the salted path with
    # salt_min_frontier_rows=0).
    salt_min_frontier_rows: int = 5_000_000
    # budget_select window shuffle width = ceil(frontier_rows / this):
    # data-proportional like state_rows_per_file, so both legs of an
    # (N, 4N) pair run the same window task count for the same rows
    # instead of spark.sql.shuffle.partitions empty-ish tasks.
    select_rows_per_task: int = 400_000
    # Snapshot writes size their file count from DATA VOLUME, not task
    # count (VERDICT.md r3 next-round #2): the measured anti-scaling
    # component was the per-wave state writes, whose file count used to
    # track shuffle/cache partitioning — more threads → more small
    # files → more fsync/commit work on erratic virtio, so state_chain
    # GREW with parallelism while carrying identical bytes. With width
    # = ceil(rows / state_rows_per_file), both legs of an (N, 4N) pair
    # write the same files for the same data, and at 10^10 scale the
    # width still grows linearly with the frontier. ~150-250 B rows →
    # ~40-60 MB files at the default.
    state_rows_per_file: int = 250_000
    # Auto-maintenance between waves (both default OFF so existing
    # traces, the golden tiers, and the frozen scaling protocol are
    # byte-for-byte untouched):
    # compact the `seen` delta chain (SnapshotStore.compact — the
    # Iceberg rewrite_data_files analogue) whenever the number of live
    # delta dirs above the compacted base reaches this. The chain
    # length is the read cost that grows with crawl age — O(dirs)
    # listings + footer opens per wave — so a fixed threshold caps it
    # at O(compact_every) forever; rewrite work is O(seen) per
    # compaction, i.e. O(waves/compact_every) full rewrites over the
    # crawl (the scheduled-maintenance cadence Iceberg deployments
    # use; a tiered/LSM layout would trade that to O(log waves)
    # rewrites at the cost of multi-level read fan-in).
    compact_every: int | None = None
    # expire state snapshots (frontier + the seen filter) older than
    # the trailing N versions after each wave (SnapshotStore.
    # expire_state_snapshots). Every state version is a FULL copy —
    # O(waves × state size) storage if never expired — while resume
    # only ever reads the last committed wave. None = keep all (full
    # time travel).
    retain_state_snapshots: int | None = None
    # Frontier representation. "full" (default): every wave writes the
    # complete next frontier — simple, but the write is O(|frontier|)
    # per wave, which at a 10^10-URL frontier rewrites ~TBs every wave
    # while the wave's real work is budget-bounded. "delta": each wave
    # writes ONLY its changes — the selected rows as tombstones plus
    # the robots-gated inserts, O(wave) rows — and reads resolve the
    # chain (live inserts anti-join tombstones; see
    # :func:`_resolve_frontier_chain` for why the resolution needs no
    # version ordering). Requires ``compact_every``: compaction folds
    # the chain into a base (SnapshotStore.compact with the resolver
    # transform), which bounds both the read fan-in and the tombstone
    # anti-join's broadcast side at O(compact_every × wave). Traces are
    # bit-identical across modes (tests/test_frontier_delta.py); the
    # default stays "full" so existing goldens and the frozen scaling
    # protocol are untouched.
    frontier_mode: str = "full"


def _file_width(rows: int, cfg: "CrawlConfig") -> int:
    """Snapshot-write width from row count (see state_rows_per_file)."""
    return max(1, (int(rows) + cfg.state_rows_per_file - 1)
               // cfg.state_rows_per_file)


def _resolve_frontier_chain(chain: DataFrame) -> DataFrame:
    """Live frontier rows from a delta chain (``frontier_mode="delta"``).

    The chain holds insert rows (``tombstone=false``, full FRONTIER_COLS)
    and tombstone rows (``tombstone=true``, written for every selected
    URL when its wave fetches it). Resolution is an ORDER-FREE anti-join
    — no version ordering, no window — which is valid because the crawl
    maintains "at most one live insert and at most one tombstone per
    url_hash, tombstone logically after its insert":

    * an insert requires the URL to be absent from ``seen`` (exact
      anti-join), and every frontier row is in ``seen`` from the moment
      it is queued (``frontier ⊆ seen``), so a tombstoned key — which
      stays in ``seen`` — can never be re-inserted by the crawl;
    * :func:`revoke_urls` is the only path that removes keys from
      ``seen`` (making them re-discoverable) or re-queues fetched keys
      (reseed), and in delta mode it ALWAYS compacts the chain first,
      stripping every tombstone that could shadow the later re-insert.

    The tombstone side is broadcast: compaction (required in delta
    mode) bounds it at O(compact_every × per-wave budget) keys.
    Used both for per-wave reads and as the compaction transform (the
    output keeps the ``tombstone`` column, all-false, matching the
    table's schema sidecar)."""
    tombs = chain.filter(F.col("tombstone")).select("url_hash")
    return chain.filter(~F.col("tombstone")).join(
        F.broadcast(tombs), "url_hash", "left_anti"
    )


def _read_frontier(
    spark: SparkSession, store: SnapshotStore, cfg: "CrawlConfig", wave: int
) -> DataFrame:
    """The live frontier as of ``wave`` under either representation."""
    if cfg.frontier_mode != "delta":
        return store.read(spark, "frontier", wave)
    return _resolve_frontier_chain(
        store.read_upto(spark, "frontier", wave)
    ).drop("tombstone")


def _obs_count(obs, cached_df: DataFrame, name: str = "n") -> int:
    """Observation count with an AQE-empty-pruning fallback.

    Observations filled by a collect/count ACTION (unlike the
    observe-riding-write pattern, which always executes its full plan —
    verified empirically) can hit a Spark edge: when the observed input
    is empty behind a shuffle, AQE's empty-relation propagation prunes
    the stage carrying the CollectMetrics node, the metrics accumulator
    never updates, and the JVM Observation hands back a schemaless
    ``Row.empty`` that ``Observation.get`` cannot convert
    (``PythonSQLUtils.toPyRow`` asserts ``GenericRowWithSchema``). The
    fallback counts the warm cache — near-free precisely in the empty
    case that triggers it."""
    from py4j.protocol import Py4JJavaError

    try:
        return int(obs.get[name])
    except Py4JJavaError:
        return cached_df.count()


def load_pagestore(
    spark: SparkSession, path: str, buckets: int = 0
) -> DataFrame:
    """Read the pagestore and attach the join keys.

    Only the fetch-path columns are selected so Catalyst prunes
    ``out_links`` (and on a columnar store, any column a stage does not
    touch — the biggest I/O lever on an image table, SURVEY.md §4.2).
    """
    ps = spark.read.parquet(path)
    ps = ps.withColumn("url_hash", url_hash_col("url"))
    cols = list(PAGESTORE_COLS)
    if buckets > 0:
        if "bucket" not in ps.columns:
            ps = ps.withColumn(
                "bucket", F.pmod(F.col("url_hash"), F.lit(buckets)).cast("int")
            )
        cols.append("bucket")
    return ps.select(*cols)


def load_seeds_text(spark: SparkSession, path: str) -> DataFrame:
    """A1 seed ingestion from a plain seed-list text file or directory
    of files (one URL per line) via ``spark.read.text`` — the
    reference's seed source shape (SURVEY.md §2.A A1).

    Blank lines are dropped. No line-order column is carried: seed
    dedup is keyed wholly on the canonical URL and every derived
    column is a function of it (see :func:`canonical_seeds`), so file
    order, split packing, and multi-file layout provably cannot affect
    the canonical frontier — order-independence by construction rather
    than by tiebreak. (VERDICT.md r4 next-round #7 asked for a guard
    on the old min-seq tiebreak's cross-file ordering; code-review r5
    found the aggregated seq was never consumed downstream, so the
    guard became the stronger "there is nothing order-dependent to
    protect", pinned by the two-file equivalence test.)"""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter(F.length("url") > 0)
    )


def canonical_seeds(seeds: DataFrame) -> DataFrame:
    """Canonicalize + dedup seeds (A1/A9). Every output column is a
    function of the canonical URL alone (hash, domain, depth=0,
    wave=0), so the dedup is a plain ``distinct`` — there is no
    tiebreak to choose and the result is independent of seed order."""
    dedup = seeds.select(
        canonicalize_udf(F.col("url")).alias("url")
    ).distinct()
    return dedup.select(
        "url",
        url_hash_col("url").alias("url_hash"),
        domain_col("url").alias("domain"),
        F.lit(0).cast("int").alias("depth"),
        F.lit(0).cast("int").alias("discovered_wave"),
    )


def init_state(
    spark: SparkSession,
    store: SnapshotStore,
    seeds: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig,
) -> None:
    """Write the wave-0 snapshot (frontier/seen/bloom) and commit it."""
    canon = canonical_seeds(seeds).persist()
    n_canon = canon.count()
    width = _file_width(n_canon, cfg)
    # seen deltas are physically bucketed by pid = pmod(url_hash, shards)
    # — the same sharding the bloom uses — so every later wave's residual
    # dup-check scan partition-prunes to the touched buckets (seen.py)
    seen0 = with_pid(
        canon.select("url_hash", F.lit(0).cast("int").alias("wave_added")),
        cfg.bloom_shards,
    ).repartition(min(cfg.bloom_shards, max(width, 1)), "pid")
    frontier0 = robots_gate(canon, robots).select(*FRONTIER_COLS)
    if cfg.frontier_mode == "delta":
        frontier0 = frontier0.withColumn("tombstone", F.lit(False))
    store.write(frontier0.repartition(width), "frontier", 0)
    store.write(seen0, "seen", 0, partition_by="pid")
    if cfg.use_bloom:
        if cfg.seen_filter == "cuckoo":
            flt0 = update_cuckoo(
                empty_cuckoo(spark, cfg.bloom_shards, cfg.cuckoo_buckets),
                store.read(spark, "seen", 0),
                cfg.bloom_shards,
            )
            store.write(flt0, "cuckoo", 0)
        else:
            bloom0 = update_bloom(
                empty_bloom(
                    spark, cfg.bloom_shards, cfg.bloom_bits, cfg.bloom_k
                ),
                store.read(spark, "seen", 0),
                cfg.bloom_shards,
            )
            store.write(bloom0, "bloom", 0)
    n_frontier = store.read(spark, "frontier", 0).count()
    n_seen = store.read(spark, "seen", 0).count()
    canon.unpersist()
    store.commit(0, {"frontier_count": n_frontier, "seen_total": n_seen})


def run_wave(
    spark: SparkSession,
    store: SnapshotStore,
    pagestore: DataFrame,
    robots: DataFrame,
    politeness: DataFrame,
    cfg: CrawlConfig,
    wave: int,
    prev_seen_total: int,
    prev_frontier_count: int,
):
    """Execute wave ``wave`` (state w → state w+1 + outputs).

    Returns ``(info, finish_outputs)``: ``info`` has the wave's counts
    and is available as soon as the STATE chain (seen/frontier/bloom
    writes) lands — everything wave w+1 depends on — while
    ``finish_outputs()`` runs the output writes (trace/pages/metrics)
    and releases the wave's caches. The caller overlaps
    ``finish_outputs`` with wave w+1's fetch (see :func:`run_crawl`):
    the output writes read only this wave's cached verdicts, so they
    soak up cores the next wave's barrier phases leave idle instead of
    serializing behind a commit barrier (VERDICT.md next-round #2c).
    """
    profile = os.environ.get("TS_CRAWL_PROFILE") == "1"
    _marks: list[tuple[str, float]] = [("start", time.time())]

    def mark(label: str) -> None:
        # always recorded (4 clock reads/wave): the spans feed the
        # crawl summary's per-wave fixed-vs-scalable decomposition
        # (VERDICT.md r2 next-round #8); `profile` only gates printing
        _marks.append((label, time.time()))

    frontier = _read_frontier(spark, store, cfg, wave)
    seen = store.read_upto(spark, "seen", wave)
    # `flt` is whichever probabilistic prefilter the config selected
    # (bloom bitmaps or cuckoo fingerprint tables — same pid sharding,
    # same snapshot lifecycle, state table named after the filter)
    flt = (
        store.read(spark, cfg.seen_filter, wave) if cfg.use_bloom else None
    )

    # salted phase-1 gate + data-proportional window width (see the
    # CrawlConfig field docs); both are pure physical-plan choices —
    # the selected set is identical at any (salt, width)
    salt = (
        cfg.salt_buckets
        if prev_frontier_count >= cfg.salt_min_frontier_rows
        else 0
    )
    sel_width = max(
        1,
        (int(prev_frontier_count) + cfg.select_rows_per_task - 1)
        // cfg.select_rows_per_task,
    )
    selected = budget_select(
        frontier, politeness, cfg.default_budget, salt, width=sel_width
    )
    if cfg.pagestore_buckets > 0 and isinstance(pagestore, DataFrame):
        selected = selected.withColumn(
            "bucket",
            F.pmod(F.col("url_hash"), F.lit(cfg.pagestore_buckets)).cast("int"),
        )
    sel_obs = None
    if cfg.frontier_mode == "delta":
        # rides the wave's single materialize action (the probe/seen
        # pipeline scans `selected` exactly once to fill the caches), so
        # the selected-row count is known driver-side by the time
        # job_frontier sizes its delta write — zero extra jobs
        from pyspark.sql import Observation

        sel_obs = Observation()
        selected = selected.observe(sel_obs, F.count(F.lit(1)).alias("n"))
    selected = selected.persist()
    mark("budget_select")

    if isinstance(pagestore, SyntheticPagestore):
        # production fetch shape: mapInPandas "network", O(wave) cost,
        # FUSED with validation so payload bytes never leave the Python
        # worker. Repartition FIRST: the frontier rows are ~150 bytes,
        # so AQE coalesces them into a handful of partitions — but each
        # row expands into tens of KB of payload and milliseconds of
        # fetch+decode compute, and a narrow fetch stage idles the
        # cluster. The shuffle moved here is tiny (keys only,
        # pre-expansion). Width scales with cluster size (8 tasks per
        # core — at ~2k rows × 12 ms/row a coarser split makes each
        # task a 20 s monolith and the last scheduling round a long
        # straggler tail).
        width = max(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            spark.sparkContext.defaultParallelism * 8,
        )
        validated = synthetic_fetch_validate(
            selected.repartition(width, "url_hash"), pagestore.cfg
        )
    else:
        validated = decode_validate(fetch_join(selected, pagestore))
    # Cache the wave's verdicts in ~1 partition per core, whatever the
    # fetch stage's width was: the fetch wants hundreds of fine-grained
    # tasks for load balance, but every downstream job (trace, pages,
    # metrics, link extraction) re-reads this cache, and a 256-partition
    # cache made each of those jobs pay 256 scheduler+file-commit
    # overheads for a few hundred KB of data. The verdict rows are ~1 KB
    # (no image payload), so this extra shuffle is a few hundred MB at
    # most.
    from pyspark.sql import Observation

    # ONE materialize action on the wave's critical path (VERDICT.md r4
    # next-round #1 — the old layout paid a dedicated count job PLUS a
    # dedicated pid-collect job per wave, pure scheduler floor that
    # never shrank with cores): on the bloom path the pid collect IS
    # the materialize job — fetch + validate + extract + probe run
    # end-to-end exactly once, filling both caches, and the collect is
    # bounded by the shard count (~200 small ints at 10^10 scale). The
    # fetch-row count is NOT needed by the state chain at all — it is
    # taken from the warm cache inside the background output job (a
    # partition-count scan, no recompute) and lands in the manifest via
    # the ordered commit.
    validated = validated.repartition(
        spark.sparkContext.defaultParallelism
    ).persist()

    # link extraction → candidates (deduped, min-depth) → truly new URLs
    candidates = extract_candidates(
        validated.filter(F.col("status") == 200), next_wave=wave + 1
    )
    if cfg.use_bloom:
        # the shared production path (operators/seen.py::new_candidates
        # — the same code the pruning tests assert on): probe → persist
        # → distinct-pid collect (fills the cache) → pruned exact
        # residual. The probe fn is injected per the config's filter.
        new, probe_cache = new_candidates(
            candidates, seen, flt, cfg.bloom_shards, use_bloom=True,
            probe_fn=(
                probe_cuckoo if cfg.seen_filter == "cuckoo"
                else probe_bloom
            ),
        )
    else:
        # exact path: no probe stage — the first action over the
        # caches is job_seen's write itself (fetch span folds into
        # state_chain; tests-only path)
        probe_cache = None
        new = exact_new(candidates, seen)
    new = new.persist()
    mark("fetch_validate")

    def job_outputs():
        # ONE combined output write per wave (VERDICT.md r4 next-round
        # #1; was three: trace + pages + metrics over the same cache).
        # The physical table is `trace` carrying the full page-verdict
        # columns plus a `partition_id` lineage column (A18/A20):
        # :func:`read_pages` is a column selection of it and
        # :func:`read_metrics` a per-(wave, partition_id) rollup — same
        # information, two fewer Spark jobs and two fewer fsync'd
        # directories per wave. seq (A20): global priority order within
        # the wave, 1-based. Adaptive: a small wave sorts in one window
        # task; larger waves use the scalable range-partitioned
        # sequence operator, sized so each sort task stays under the
        # single-task threshold (data-proportional file count).
        from pyspark.sql import Window

        # trivial on the warm cache (partition-count scan, no
        # recompute): the state chain already materialized every
        # partition, and this job runs overlapped with the next wave's
        # fetch, off the critical path
        n_fetched = validated.count()
        base = validated.select(
            "url", "url_hash", "depth", "discovered_wave", "status",
            "image_id", "caption", "fmt", "w", "h", "n_bytes",
            "decode_ok", "psnr", "psnr_ok", "phash_match", "caption_ok",
            "valid", F.spark_partition_id().alias("partition_id"),
        )
        seq_cache = None
        if n_fetched <= cfg.trace_single_task_rows:
            w = Window.orderBy(*PRIORITY_COLS)
            trace = base.withColumn("seq", F.row_number().over(w))
        else:
            # each range-sort task carries ≤ the single-task threshold
            # of rows: the job's cost (and file count) tracks the
            # wave's data at every master, not the core count — it
            # overlaps the next wave's fetch either way
            n_parts = (
                (n_fetched + cfg.trace_single_task_rows - 1)
                // cfg.trace_single_task_rows
            )
            trace = with_global_seq(base, PRIORITY_COLS,
                                    num_partitions=n_parts)
            seq_cache = getattr(trace, "_seq_cache")
        trace_out = trace.select(
            F.lit(wave).cast("int").alias("wave"),
            F.col("seq").cast("long").alias("seq"),
            "url", "url_hash",
            F.col("depth").cast("int").alias("depth"),
            F.col("status").cast("int").alias("status"),
            "image_id", "caption", "fmt", "w", "h", "n_bytes",
            "decode_ok", "psnr", "psnr_ok", "phash_match", "caption_ok",
            "valid", "partition_id",
        )
        store.write(trace_out, "trace", wave)
        if seq_cache is not None:
            seq_cache.unpersist()
        return n_fetched

    new_counts: dict[str, int] = {}

    def job_seen():
        obs = Observation()
        # observe() rides the write — n_new costs no separate count job.
        # The delta is written bucket-partitioned by pid (same layout as
        # wave 0) so future waves' residual checks partition-prune. The
        # explicit pid repartition pins the write to ≤ bloom_shards
        # tasks AND files at any master (r3's layout inherited the
        # probe pipeline's shuffle width — shards files but a
        # master-dependent army of empty commit tasks).
        store.write(
            with_pid(
                new.select(
                    "url_hash", F.lit(wave + 1).cast("int").alias("wave_added")
                ),
                cfg.bloom_shards,
            )
            .repartition(cfg.bloom_shards, "pid")
            .observe(obs, F.count(F.lit(1)).alias("n")),
            "seen",
            wave + 1,
            partition_by="pid",
        )
        new_counts["n"] = int(obs.get["n"])

    frontier_counts: dict[str, int] = {}

    def job_frontier_delta(inserts):
        # frontier_mode="delta": write ONLY the wave's changes — every
        # selected row as a tombstone (it leaves the frontier whether
        # its fetch succeeded or 404'd, exactly the full-mode anti-join
        # semantics) plus the robots-gated inserts. O(wave) rows and
        # files instead of full mode's O(|frontier|) rewrite; reads
        # resolve the chain (:func:`_resolve_frontier_chain`) and
        # run_crawl's compaction keeps the chain and the tombstone
        # broadcast bounded. Tombstones carry the full selected row, so
        # the salted (domain, _salt) repartition spreads hot domains
        # across files for BOTH row kinds (A17).
        obs = Observation()
        # filled by the materialize action (pos_pids collect / job_seen
        # write); falls back to the warm cache if AQE pruned the node
        n_sel = _obs_count(sel_obs, selected)
        width = _file_width(n_sel + new_counts["n"], cfg)
        delta = (
            selected.select(*FRONTIER_COLS)
            .withColumn("tombstone", F.lit(True))
            .unionByName(inserts.withColumn("tombstone", F.lit(False)))
            .withColumn(
                "_salt",
                F.pmod(F.xxhash64("url"), F.lit(cfg.frontier_salt)).cast("int"),
            )
            .repartition(width, "domain", "_salt")
            .drop("_salt")
            # exact live count, riding the write: prev − tombstones +
            # inserts (frontier rows are unique per url_hash — inserts
            # are anti-joined against seen and frontier ⊆ seen — so the
            # arithmetic is exact, matching full mode's observed count)
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("tombstone").cast("long")).alias("nt"),
            )
        )
        store.write(delta, "frontier", wave + 1)
        n_rows, n_tomb = int(obs.get["n"]), int(obs.get["nt"] or 0)
        frontier_counts["n"] = (
            int(prev_frontier_count) - n_tomb + (n_rows - n_tomb)
        )

    def job_frontier():
        inserts = robots_gate(new, robots).select(*FRONTIER_COLS)
        if cfg.frontier_mode == "delta":
            return job_frontier_delta(inserts)
        # frontier_{w+1}: remaining ∪ robots-allowed new links, salted
        # repartition on (domain, salt) → hot domains spread over tasks (A17)
        # broadcast the (politeness-bounded) selected keys so the
        # frontier state table is scanned, never shuffled, for removal
        remaining = frontier.join(
            F.broadcast(selected.select("url_hash")), "url_hash", "left_anti"
        )
        obs = Observation()
        # Write width tracks the frontier's SIZE (previous count plus
        # this wave's exact new-URL count — job_seen has already
        # finished, so n_new is known driver-side), not the shuffle
        # width: r3 pinned this repartition at
        # spark.sql.shuffle.partitions, so every wave wrote 64 frontier
        # files for ~20 MB of rows — the dominant state-chain file count
        # and a per-master constant instead of a per-data one. The
        # salted hash distribution (hot domains spread over tasks, A17)
        # is unchanged — only the partition count is sized to the data.
        width = _file_width(prev_frontier_count + new_counts["n"], cfg)
        frontier_next = (
            remaining.select(*FRONTIER_COLS)
            .unionByName(inserts)
            .withColumn(
                "_salt",
                F.pmod(F.xxhash64("url"), F.lit(cfg.frontier_salt)).cast("int"),
            )
            .repartition(width, "domain", "_salt")
            .drop("_salt")
            # observe() rides the write job — the commit record's frontier
            # count costs no extra scan of the written snapshot
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        store.write(frontier_next, "frontier", wave + 1)
        frontier_counts["n"] = int(obs.get["n"])

    def job_filter_cuckoo():
        # cuckoo twin of job_filter_bloom: insert the delta, guard on a
        # driver-side load estimate (cfg.cuckoo_buckets UNDERestimates
        # capacity once shards have grown, so post-saturation waves keep
        # the exact occupancy check — conservative), rebuild saturated
        # or degraded shards from the pruned seen scan at doubled size.
        # A shard that degraded below the gate stays correctness-safe
        # (its probe answers all-true → exact fallback) until the gate
        # fires and rebuilds it.
        upd = update_cuckoo(flt, new, cfg.bloom_shards)
        total_keys = int(prev_seen_total) + new_counts["n"]
        est_load = total_keys / (cfg.bloom_shards * cfg.cuckoo_buckets * 4)
        guarded = est_load >= 0.6
        if guarded:
            final = grow_saturated_cuckoo(
                spark, upd, seen, new, cfg.bloom_shards
            )
        else:
            final = upd
        shard_bytes = cfg.bloom_shards * cfg.cuckoo_buckets * 8
        width = max(1, shard_bytes // (64 << 20))
        store.write(final.repartition(width), "cuckoo", wave + 1)
        if guarded:
            upd.unpersist()
            # the saturation rebuild caches its key scan so the
            # distinct-pid probe and the rebuild share one
            # materialization; release it with the write done (absent
            # when the guard found nothing saturated)
            kc = getattr(final, "_keys_cache", None)
            if kc is not None:
                kc.unpersist()

    def job_filter_bloom():
        import math

        # delta = the cached `new` DF — identical rows to the seen delta
        # job_seen persists, without waiting on (or re-reading) that write
        bloom_upd = update_bloom(flt, new, cfg.bloom_shards)
        # Saturation guard, GATED so it is free until genuinely needed:
        # the expected per-shard fill is computable driver-side from the
        # running key count (job_seen has finished, so n_new is known)
        # with zero Spark jobs — 1-exp(-k·n/(shards·nbits)). Only when
        # that estimate crosses 0.3 (safety margin under the 0.4 rebuild
        # trigger; pmod(xxhash64) spreads keys tightly enough that no
        # shard can exceed the trigger while the mean estimate sits
        # under the gate) does the exact popcount job + possible rebuild
        # run. cfg.bloom_bits UNDERestimates nbits once shards have
        # grown, so post-saturation waves keep the exact check — the
        # conservative direction. A/B-profiled: ungated, the popcount
        # job added ~1-2 s to every wave's state chain at bench scale.
        total_keys = int(prev_seen_total) + new_counts["n"]
        est_fill = 1.0 - math.exp(
            -cfg.bloom_k * (total_keys / cfg.bloom_shards) / cfg.bloom_bits
        )
        guarded = est_fill >= 0.3
        if guarded:
            # guard persists bloom_upd (popcount + write share one
            # computation of the merge); released after the write
            bloom_final = grow_saturated_shards(
                spark, bloom_upd, seen, new, cfg.bloom_shards
            )
        else:
            bloom_final = bloom_upd
        # bound the snapshot's file count by bitmap BYTES (shards rows of
        # nbits/8 each): the cogroup merge runs at shuffle width, but the
        # write needs ~64 MB files, not one file per merge task
        shard_bytes = cfg.bloom_shards * (cfg.bloom_bits // 8)
        bloom_width = max(1, shard_bytes // (64 << 20))
        store.write(bloom_final.repartition(bloom_width), "bloom", wave + 1)
        if guarded:
            # unpersist whenever the guard persisted, INCLUDING the
            # no-saturation path where bloom_final IS bloom_upd — the
            # old identity check leaked one cached bloom (shards ×
            # bitmap bytes) per wave once est_fill stayed ≥ 0.3, which
            # is permanent after any shard grows (ADVICE.md r4)
            bloom_upd.unpersist()
            # same release for the rebuild's cached key scan (cuckoo
            # twin in job_filter_cuckoo; absent when nothing saturated)
            kc = getattr(bloom_final, "_keys_cache", None)
            if kc is not None:
                kc.unpersist()

    # ---- STATE chain: everything wave w+1 needs. job_seen runs FIRST
    # and alone: its write materializes the cached `new` end-to-end
    # (candidate pipeline + bloom probe + seen scan run exactly once);
    # the frontier/bloom writes then fork concurrently over the warm
    # cache. Launching all three cold would race each job into
    # recomputing the probe pipeline's broadcast inputs.
    job_seen()
    dependents = [job_frontier]
    if cfg.use_bloom:
        dependents.append(
            job_filter_cuckoo if cfg.seen_filter == "cuckoo"
            else job_filter_bloom
        )
    _run_concurrently(dependents)
    n_new = new_counts["n"]
    mark("state_chain")

    selected.unpersist()
    new.unpersist()
    if probe_cache is not None:
        probe_cache.unpersist()
    info = {
        "frontier_count": frontier_counts["n"],
        "seen_total": int(prev_seen_total) + n_new,
        # "fetched" is filled by finish_outputs (warm-cache count inside
        # the background output job) BEFORE the ordered manifest commit
        "new_urls": n_new,
        # per-phase wall spans for the wave's state chain; popped (not
        # committed to the manifest) by run_crawl into the summary —
        # they decompose each wave into the fetch/join/validate work
        # that SHOULD scale with cores vs the budget-select + seen/
        # frontier/bloom state writes whose scheduling+fsync floor does
        # not (store-join evidence, VERDICT.md r2 next-round #8)
        "spans": {
            _marks[i][0]: round(_marks[i][1] - _marks[i - 1][1], 2)
            for i in range(1, len(_marks))
        },
    }

    def finish_outputs():
        # OUTPUT write: nothing downstream in the crawl depends on
        # it — it runs while wave w+1 is already fetching. It also
        # fills info["fetched"]; run_crawl commits info AFTER this
        # returns, so the manifest always carries the count.
        info["fetched"] = int(job_outputs())
        validated.unpersist()
        mark("outputs")
        if profile:
            prev = _marks[0][1]
            spans = []
            for label, tt in _marks[1:]:
                spans.append(f"{label}={tt - prev:.2f}s")
                prev = tt
            print(f"[wave {wave}] " + " ".join(spans), flush=True)

    return info, finish_outputs


def run_crawl(
    spark: SparkSession,
    store: SnapshotStore,
    pagestore: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    politeness: DataFrame,
    cfg: CrawlConfig = CrawlConfig(),
) -> dict:
    """Run (or resume) the crawl until frontier exhaustion or max_waves.

    Resume needs no special casing: if a committed snapshot exists the
    loop simply continues from it (BASELINE.json:14 "resumable restarts").
    """
    from concurrent.futures import ThreadPoolExecutor

    # LOUD on malformed dimension tables, once per run (two tiny agg
    # jobs — not per wave): the reference simulator's dicts keep one
    # entry per domain, while the engine's broadcast joins would fan
    # out every frontier row of a duplicated domain — duplicate fetches
    # with distinct seq values, a silent trace divergence the
    # equivalence tests exist to prevent.
    for dim_name, dim in (("robots", robots), ("politeness", politeness)):
        dup = (
            dim.groupBy("domain").count()
            .filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"{dim_name} table has {dup[0]['count']} rows for domain "
                f"{dup[0]['domain']!r}; dimension tables must be unique "
                "per domain (the reference keeps one entry per domain)"
            )
    if cfg.frontier_mode == "delta" and cfg.compact_every is None:
        # without compaction the delta chain — and with it the tombstone
        # set the per-wave resolution BROADCASTS — grows with every wave
        # fetched; the mode's O(wave) write cost is only honest with the
        # read side bounded too
        raise ValueError(
            'frontier_mode="delta" requires compact_every (the chain '
            "resolution broadcasts the un-compacted tombstones; "
            "compaction bounds them at O(compact_every × wave))"
        )
    if store.last_wave() is None:
        init_state(spark, store, seeds, robots, cfg)
    wave = store.last_wave()
    first_wave = wave
    state = store.manifest(wave)
    seen_total = int(state["seen_total"])
    frontier_count = int(state["frontier_count"])
    wave_secs: list[float] = []
    wave_spans: list[dict] = []
    # Single background worker so output writes + commits stay strictly
    # wave-ordered (the manifest commit point must never reorder) while
    # overlapping with the NEXT wave's fetch. A crash before a pending
    # commit simply resumes from the last committed wave; the stale
    # uncommitted dirs are overwritten on retry (tableio docstring).
    bg = ThreadPoolExecutor(max_workers=1)
    pending = []

    def expire_states() -> None:
        # deletes only versions below the trailing retained window —
        # the wave about to run reads exactly the last committed
        # version, always inside it — and a pending commit just makes
        # last_wave() smaller, i.e. the deletion floor conservative
        if cfg.retain_state_snapshots is None:
            return
        # delta-mode frontier dirs carry LIVE rows (the chain IS the
        # state) — they are expired by compaction, never by the
        # state-snapshot window
        tables = [] if cfg.frontier_mode == "delta" else ["frontier"]
        if cfg.use_bloom:
            tables.append(cfg.seen_filter)
        if tables:
            store.expire_state_snapshots(tables, cfg.retain_state_snapshots)

    try:
        while wave < cfg.max_waves:
            if frontier_count == 0:
                break
            if (
                cfg.compact_every is not None
                and store.delta_dirs_above_base("seen", wave)
                >= cfg.compact_every
            ):
                # maintenance runs BETWEEN waves with the output thread
                # drained: compaction expires the very dirs an in-flight
                # read could be scanning, so nothing may be reading
                # `seen` while it rewrites. State-snapshot expiry below
                # only deletes versions older than the trailing window
                # (nothing reads those), but it rides the same drained
                # point for the fresh last_wave().
                while pending:
                    pending.pop(0).result()
                store.compact(
                    spark, "seen", wave, width=_file_width(seen_total, cfg)
                )
            if (
                cfg.frontier_mode == "delta"
                and cfg.compact_every is not None
                and store.delta_dirs_above_base("frontier", wave)
                >= cfg.compact_every
            ):
                # same drained-maintenance point: fold the frontier
                # delta chain into a base of live rows (the resolver IS
                # the transform — tombstones and the rows they killed
                # vanish), keeping reads at base + O(compact_every)
                # deltas and the resolution's broadcast side bounded
                while pending:
                    pending.pop(0).result()
                store.compact(
                    spark,
                    "frontier",
                    wave,
                    width=_file_width(frontier_count, cfg),
                    transform=_resolve_frontier_chain,
                )
            expire_states()
            t0 = time.time()
            info, finish_outputs = run_wave(
                spark, store, pagestore, robots, politeness, cfg, wave,
                prev_seen_total=seen_total,
                prev_frontier_count=frontier_count,
            )
            wave_spans.append(info.pop("spans", {}))
            # Drain the PREVIOUS wave's outputs+commit before queueing
            # this one (ADVICE.md r2): at most one overlapped wave is
            # ever in flight — that bounds the cached `validated`
            # backlog to one wave — and a failed output write or commit
            # for wave w raises HERE, before wave w+1's commit is even
            # submitted, so the manifest sequence can never have a hole
            # (last_wave() would otherwise resume past a missing wave).
            while pending:
                pending.pop(0).result()
            pending.append(bg.submit(
                lambda fin=finish_outputs, w=wave + 1, i=info: (
                    fin(), store.commit(w, i)
                )
            ))
            wave_secs.append(round(time.time() - t0, 2))
            seen_total = int(info["seen_total"])
            frontier_count = int(info["frontier_count"])
            wave += 1
        for f in pending:
            f.result()
        # final maintenance pass at the now-committed last wave, so the
        # retained window is anchored at the crawl's true end state
        expire_states()
    finally:
        bg.shutdown(wait=True)
    # per-wave fetch counts come from the committed manifests: the count
    # is taken inside each wave's background output job (off the state
    # chain's critical path), so it is only authoritative post-drain
    wave_fetched = [
        int(store.manifest(w).get("fetched", 0))
        for w in range(first_wave + 1, store.last_wave() + 1)
    ]
    total_fetched = sum(wave_fetched)
    final = store.manifest(store.last_wave())
    return {
        "waves_run": store.last_wave(),
        "fetched_total": total_fetched,
        "seen_total": final["seen_total"],
        "frontier_left": final["frontier_count"],
        "wave_secs": wave_secs,
        "wave_fetched": wave_fetched,
        "wave_spans": wave_spans,
    }



def revoke_urls(
    spark: SparkSession,
    store: SnapshotStore,
    urls: DataFrame,
    cfg: CrawlConfig = CrawlConfig(),
    reseed: bool = False,
    robots: DataFrame | None = None,
) -> dict:
    """Seed revocation — the end-to-end consumer of the cuckoo filter's
    DELETION capability (BASELINE.json:6 "cuckoo/bloom"; deletion is
    exactly what the cuckoo variant adds over the bloom,
    operators/cuckoo.py), published as a normal committed wave so
    :func:`run_crawl` resumes from it with no special casing.

    ``urls``: a DataFrame with a ``url`` column (raw — canonicalized
    here with the same A4 rules the crawl applies), semi-joined against
    the seen set first (broadcast from the revocation list, never a
    shuffle of the 10^10-row seen table): revoking an unknown URL is a
    no-op, and only previously-inserted keys may reach the cuckoo
    delete (its contract is one stored fingerprint per inserted key).

    Two modes, chosen to preserve the crawl's two standing invariants —
    ``frontier ⊆ seen`` (else a queued URL rediscovered via links is
    double-queued) and ``filter ⊇ seen`` (a false negative re-inserts a
    seen URL):

    * ``reseed=False`` — **forget**: the URLs leave the seen set, the
      filter, AND the frontier together — "as if never discovered" — so
      both invariants hold with the keys simply gone; the crawl fetches
      them (again) only IF some later wave's links rediscover them
      (content purged upstream, a seed list withdrawn). A revoked URL
      still queued must leave the frontier too: left behind it would
      both fetch the just-revoked content next wave and, being absent
      from seen, be re-discoverable by links while queued — the exact
      double-queue ``frontier ⊆ seen`` exists to prevent.
      Steps, in durability order:

      1. seen rewrite via :meth:`SnapshotStore.compact` with an
         anti-join transform — one atomically-published base dir
         holding "seen minus revoked" (which also collapses the
         O(waves) delta-dir union every later wave would re-pay). A
         crash after this step leaves the store resumable at wave ``w``
         with the keys already forgotten from seen but possibly still
         queued (``frontier ⊆ seen`` transiently broken): the stale
         filter's extra fingerprints are mere false positives (the
         exact residual decides), and re-running the revocation
         converges — the zero-in-seen early return probes the frontier
         for still-queued keys (broadcast semi-join, bounded output)
         and, finding any, republishes ``w+1`` with them unqueued and
         the filter carried forward (the ``repaired`` audit field).
      2. filter at ``w+1``: the cuckoo path DELETES in place —
         O(revoked) work touching only the affected shards regardless
         of crawl age (a key inserted while its shard was degraded has
         no stored fingerprint; ``_delete`` no-ops on it, safe because
         degraded shards probe as maybe-seen anyway). The bloom path
         cannot delete, so it REBUILDS from the compacted seen set — a
         full scan, the documented cost of choosing bloom.
      3. frontier carried to ``w+1`` minus the revoked keys (broadcast
         anti-join — the revocation list is the small side, collected
         driver-side up front so no post-compaction step carries
         lineage into the expired delta dirs); manifest commit with the
         recounted ``seen_total`` and a ``frontier_count`` observed on
         the write itself (no second scan), plus a ``revoked`` audit
         field.

    * ``reseed=True`` — **recrawl now**: the URLs are re-queued at
      depth 0 (dedup-guarded against rows already in the frontier) so
      the next wave re-fetches them immediately. They stay in the seen
      set and the filter — removing them there while they sit in the
      frontier would break both invariants (equivalently: this mode IS
      forget + instant rediscovery, with no false-negative window in
      between). Nothing to compact or delete; the filter state is
      carried forward to ``w+1`` for the resume read. Pass the crawl's
      ``robots`` table to apply the A10 gate to the re-queued rows —
      every other frontier-insert path (init_state, job_frontier) gates
      on robots, and a URL whose rules changed since discovery must not
      re-enter the queue; with ``robots=None`` the rows are re-queued
      ungated (explicit operator override). Reseeding URLs that a
      CRASHED forget already removed from seen raises instead of
      guessing: repair with ``reseed=False`` first (the keys must be in
      seen for reseed's invariants to hold).
    """
    w = store.last_wave()
    if w is None:
        raise ValueError("revoke_urls needs a committed crawl snapshot")
    # The revocation list is small by contract (a withdrawn seed file, a
    # takedown notice) — materialize the canonicalized keys driver-side
    # ONCE and rebuild them as a local-backed frame. Downstream steps
    # broadcast this frame, so nothing executed after the compaction
    # carries lineage into the seen delta dirs compaction expires (a
    # cache-evicted executor recomputing such lineage would hit deleted
    # files), and the seen-membership probe scans the 10^10-row seen
    # table once with a broadcast hash side instead of shuffling it (a
    # left-semi with the tiny side on the LEFT cannot broadcast its
    # build side).
    keys_pdf = (
        urls.select(canonicalize_udf(F.col("url")).alias("url"))
        .distinct()
        .select("url", url_hash_col("url").alias("url_hash"))
        .toPandas()
    )
    manifest = store.manifest(w)
    if len(keys_pdf) == 0:
        return {"revoked": 0, "wave": w,
                "seen_total": int(manifest["seen_total"])}
    keys = spark.createDataFrame(keys_pdf, "url string, url_hash long")
    key_hashes = F.broadcast(keys.select("url_hash"))
    seen = store.read_upto(spark, "seen", w)
    in_seen = {
        r.url_hash
        for r in seen.join(key_hashes, "url_hash", "left_semi")
        .select("url_hash").distinct().collect()
    }
    n_rev = len(in_seen)
    frontier = _read_frontier(spark, store, cfg, w)
    if n_rev == 0:
        # Nothing in seen: EITHER a true no-op (unknown URLs) OR the
        # repair half of a crashed forget run — the seen compaction's
        # base-dir publish is durable BEFORE the w+1 frontier write and
        # commit, so a crash between them leaves the keys gone from
        # seen but still queued (`frontier ⊆ seen` broken), and the
        # membership gate above would wave a naive re-run through as a
        # no-op. Probe the frontier (broadcast semi, bounded output) to
        # tell the two apart; re-running the revocation then converges
        # as the forget contract documents.
        queued_n = frontier.join(
            key_hashes, "url_hash", "left_semi"
        ).count()
        if queued_n == 0:
            return {"revoked": 0, "wave": w,
                    "seen_total": int(manifest["seen_total"])}
        if reseed:
            # queued-but-not-seen is exactly the crashed-forget state;
            # silently unqueueing here would execute the OPPOSITE of the
            # requested reseed and mislabel the manifest audit. Reseed
            # needs the keys in seen (its whole point is keeping them
            # there) — make the operator repair first, explicitly.
            raise ValueError(
                f"reseed revocation: {queued_n} key(s) are queued but "
                "absent from seen — the store shows a crashed forget "
                "revocation. Re-run with reseed=False to repair "
                "(unqueue), then reseed."
            )
        frontier = frontier.join(key_hashes, "url_hash", "left_anti")
        # the crash may also have preceded the filter's w+1 write; carry
        # wave w's filter forward (stale fingerprints are mere false
        # positives — the exact residual decides)
        if cfg.use_bloom:
            store.write(
                store.read(spark, cfg.seen_filter, w), cfg.seen_filter, w + 1
            )
        seen_total = seen.count()  # manifest w's count predates the crash
        out: dict = {"revoked": 0, "repaired": int(queued_n), "wave": w + 1}
        return _publish_revocation(
            spark, store, frontier, manifest, w, 0, seen_total, reseed, cfg,
            out,
        )
    rev = spark.createDataFrame(
        keys_pdf[keys_pdf["url_hash"].isin(in_seen)],
        "url string, url_hash long",
    )
    out = {"revoked": n_rev, "wave": w + 1}
    if reseed:
        # dedup guard against rows already queued — phrased as "probe
        # the frontier with the BROADCAST revocation list" (map-side,
        # result bounded by the revocation list) rather than an
        # anti-join with the tiny side on the left, which cannot
        # broadcast and would shuffle the 10^10-row frontier
        queued = [
            r.url_hash
            for r in frontier.join(
                F.broadcast(rev.select("url_hash")), "url_hash", "left_semi"
            ).select("url_hash").distinct().collect()
        ]
        re_rows = (
            rev.filter(~F.col("url_hash").isin(queued)) if queued else rev
        ).select(
            "url",
            "url_hash",
            domain_col("url").alias("domain"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(w).cast("int").alias("discovered_wave"),
        )
        if robots is not None:
            # the A10 gate every other frontier-insert path applies;
            # a rule that now disallows the URL keeps it out of the
            # queue (it stays in seen either way)
            re_rows = robots_gate(re_rows, robots)
        frontier = frontier.select(*FRONTIER_COLS).unionByName(
            re_rows.select(*FRONTIER_COLS)
        )
        seen_total = int(manifest["seen_total"])
        if cfg.use_bloom:
            store.write(
                store.read(spark, cfg.seen_filter, w), cfg.seen_filter, w + 1
            )
    else:
        # forget = as if never discovered: a revoked URL still queued
        # leaves the frontier in the same step it leaves seen, else the
        # next wave fetches the just-revoked content and (absent from
        # seen) links could re-queue it while queued — the double-queue
        # `frontier ⊆ seen` exists to prevent. Anti-join on ALL input
        # keys (not just the in-seen subset) so a re-run over a
        # partially-applied earlier attempt heals the frontier in the
        # same pass.
        frontier = frontier.join(key_hashes, "url_hash", "left_anti")
        out["compaction"] = store.compact(
            spark,
            "seen",
            w,
            width=_file_width(int(manifest.get("seen_total", 0)) or 1, cfg),
            transform=lambda df: df.join(
                key_hashes, "url_hash", "left_anti"
            ),
        )
        # seen rows are unique per url_hash by construction (every wave
        # delta is an exact anti-join against seen, wave-0 seeds are
        # deduped), so the post-revocation count is exactly derivable —
        # no third full scan of the 10^10-row table
        seen_total = int(manifest["seen_total"]) - n_rev
        if cfg.use_bloom:
            if cfg.seen_filter == "cuckoo":
                flt = delete_cuckoo(
                    store.read(spark, "cuckoo", w), rev, cfg.bloom_shards
                )
                # file count bounded by shard BYTES, not the delete's
                # shuffle width (the job_filter_cuckoo write rule)
                shard_bytes = cfg.bloom_shards * cfg.cuckoo_buckets * 8
                store.write(
                    flt.repartition(max(1, shard_bytes // (64 << 20))),
                    "cuckoo", w + 1,
                )
            else:
                # rebuild seeded from zeroed-out copies of wave w's
                # shards so saturation-grown nbits survive revocation —
                # resetting to cfg.bloom_bits would re-pack the full
                # seen set into undersized bitmaps and push their fill
                # toward 1.0 (every probe → exact residual) until the
                # next saturation rebuild
                flt = update_bloom(
                    zeroed_like(spark, store.read(spark, "bloom", w)),
                    store.read_upto(spark, "seen", w),
                    cfg.bloom_shards,
                )
                shard_bytes = cfg.bloom_shards * (cfg.bloom_bits // 8)
                store.write(
                    flt.repartition(max(1, shard_bytes // (64 << 20))),
                    "bloom", w + 1,
                )
    return _publish_revocation(
        spark, store, frontier, manifest, w, n_rev, seen_total, reseed, cfg,
        out,
    )


def _publish_revocation(
    spark: SparkSession,
    store: SnapshotStore,
    frontier: DataFrame,
    manifest: dict,
    w: int,
    n_rev: int,
    seen_total: int,
    reseed: bool,
    cfg: CrawlConfig,
    out: dict,
) -> dict:
    """Shared tail of :func:`revoke_urls`: publish the ``w+1`` frontier
    (file width sized to the EXPECTED rows — reseed grows the frontier
    by up to ``n_rev``, forget/repair only shrink it), ride the row
    count on the write via ``observe`` (the job_frontier pattern — no
    second scan of the just-written snapshot), and commit.

    ``frontier_mode="delta"`` publishes by COMPACTING the chain into a
    base of the revised rows instead of writing a version dir — the one
    frontier mutation path that must not be a tombstone delta, because
    forget makes revoked keys re-discoverable and reseed re-queues
    fetched keys: either way a later insert for the same url_hash is
    now legal, and an old tombstone left in the chain would shadow it
    under the order-free resolution (:func:`_resolve_frontier_chain`).
    Compaction strips every such tombstone in the same atomic step."""
    from pyspark.sql import Observation

    width = _file_width(
        int(manifest["frontier_count"]) + (n_rev if reseed else 0), cfg
    )
    obs = Observation()
    if cfg.frontier_mode == "delta":
        # the transform ignores the chain argument: `frontier` is the
        # already-revised resolved view, whose lineage reads the same
        # delta dirs compact unions — consumed during the base write,
        # before those dirs are expired (the seen-compaction pattern)
        out["frontier_compaction"] = store.compact(
            spark,
            "frontier",
            w,
            width=width,
            transform=lambda _chain: frontier.select(*FRONTIER_COLS)
            .withColumn("tombstone", F.lit(False))
            .observe(obs, F.count(F.lit(1)).alias("n")),
        )
    else:
        store.write(
            frontier.select(*FRONTIER_COLS)
            .repartition(width)
            .observe(obs, F.count(F.lit(1)).alias("n")),
            "frontier",
            w + 1,
        )
    n_frontier = int(obs.get["n"])
    store.commit(
        w + 1,
        {
            "frontier_count": n_frontier,
            "seen_total": seen_total,
            "revoked": n_rev,
            "repaired": int(out.get("repaired", 0)),
            "reseeded": bool(reseed),
        },
    )
    out.update({"seen_total": seen_total, "frontier_count": n_frontier})
    return out
