"""The crawl plan: an iterative, checkpointed, wave-synchronous BFS driver.

Spark restatement of the reference's single-threaded FIFO loop
(site-crawler.service.js:142-178). Correctness argument for bit-identity
with that loop (tested against the Python oracle in tests/test_crawl_identity.py):

1. The FIFO queue with dedup-at-enqueue is level-ordered: every URL's
   queue position (``enqueue_seq``) is fixed at first discovery, and the
   single-threaded loop visits URLs in strictly increasing enqueue_seq.
2. A wave-synchronous loop that each iteration visits the lowest-seq
   queued rows (all of them, or any budget-capped prefix) therefore visits
   URLs in exactly the same global order — budgets only move wave
   boundaries, never reorder.
3. New discoveries are appended in (parent visit order, in-page link
   order); per-seed ``enqueue_seq`` = previous max + rank over
   (parent_seq, link_idx), which is the same append order.
4. depth > maxDepth rows are popped-and-skipped without consuming the
   maxPages budget (:145-147); they still exist in the discovered set.

Every wave checkpoints frontier state + fetched pages to SnapshotTables
with per-partition lineage (rows per seed_host) and fetch/dedup metrics in
the snapshot summary → a killed run resumes from the last complete wave
(north_rule resumability).

Scale design: all joins/windows partition by seed_host (embarrassingly
parallel across sites); the seen-set anti-join is Bloom-pre-pruned; the
fetch stage is salted across executors to break hot-host skew.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from web_crawler_spark.lake import SnapshotTable
from web_crawler_spark.operators import frontier as FR
from web_crawler_spark.sources.fetch import fetch_pages
from web_crawler_spark.synthetic.web import SyntheticWeb

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seed_host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("enqueue_seq", T.LongType(), False),
        T.StructField("wave_discovered", T.IntegerType(), False),
        T.StructField("lineage", T.StringType(), True),  # parent url
        T.StructField("status", T.StringType(), False),  # queued|visited|depth_skipped|error|robots_blocked
        T.StructField("wave_visited", T.IntegerType(), True),
        T.StructField("visit_seq", T.LongType(), True),
    ]
)


@dataclass
class CrawlConfig:
    max_pages: int = 50          # per seed (site-crawler.service.js:130)
    max_depth: int = 3           # :131
    host_wave_budget: int | None = None  # politeness cap per host per wave
    wave_seconds: float | None = None    # crawl-delay → per-wave host budget
    check_robots: bool = False   # reference checks robots in extract phase
    use_bloom: bool = True
    salt_partitions: int | None = None
    keep_snapshots: int = 3
    ordering: str = "strict"     # strict = bit-identical; fast = hash order


class CrawlDriver:
    """Runs the wave loop over a SyntheticWeb, checkpointing to ``workdir``."""

    def __init__(self, spark: SparkSession, web: SyntheticWeb, workdir: str,
                 config: CrawlConfig | None = None):
        self.spark = spark
        self.web = web
        self.cfg = config or CrawlConfig()
        self.workdir = workdir
        self.frontier_tbl = SnapshotTable(os.path.join(workdir, "frontier"))
        self.pages_tbl = SnapshotTable(os.path.join(workdir, "pages"))
        self.bloom_tbl = SnapshotTable(os.path.join(workdir, "seen_bloom"))
        self.state_path = os.path.join(workdir, "crawl_state.json")

    # ------------------------------------------------------------ state ---
    def _save_state(self, wave: int, done: bool) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"wave": wave, "done": done}, fh)
        os.replace(tmp, self.state_path)

    def load_state(self) -> dict | None:
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as fh:
            return json.load(fh)

    # ------------------------------------------------------------ seeds ---
    def _seed_frontier(self) -> DataFrame:
        rows = [
            (url, url.split("//", 1)[1].split("/", 1)[0], 0, 0, 0, None, "queued", None, None)
            for url in self.web.seed_urls()
        ]
        return self.spark.createDataFrame(rows, FRONTIER_SCHEMA)

    # ------------------------------------------------------------- run ----
    def run(self, resume: bool = False, max_waves: int = 100) -> DataFrame:
        """Run (or resume) the crawl; returns the final frontier DataFrame."""
        spark = self.spark
        if resume and self.frontier_tbl.exists():
            state = self.load_state()
            wave = state["wave"] if state else 0
            frontier = self.frontier_tbl.read(spark)
            if state and state.get("done"):
                return frontier
        else:
            wave = 0
            frontier = self._seed_frontier()
            self.frontier_tbl.overwrite(
                frontier, summary={"wave": 0, "op": "seed"}, lineage_key="seed_host"
            )
            self._save_state(0, done=False)

        robots_df = None
        if self.cfg.check_robots or self.cfg.wave_seconds:
            from web_crawler_spark.schemas import ROBOTS

            robots_df = spark.createDataFrame(
                [self.web.robots(h) for h in range(self.web.n_hosts)], ROBOTS
            )

        while wave < max_waves:
            wave += 1
            progressed = self._run_wave(frontier, wave, robots_df)
            frontier = self.frontier_tbl.read(spark)
            if not progressed:
                self._save_state(wave, done=True)
                break
            self._save_state(wave, done=False)
        return frontier

    def _run_wave(self, frontier: DataFrame, wave: int, robots_df) -> bool:
        """One wave: budgeted visit of lowest-seq queued rows → fetch →
        link expansion → seen anti-join → append. Returns False when no
        work remains (all budgets exhausted or queue drained)."""
        cfg = self.cfg

        queued = frontier.filter(F.col("status") == "queued")
        # depth gate (W6): popped-and-skipped, no budget consumed
        too_deep = queued.filter(F.col("depth") > cfg.max_depth)
        visitable = queued.filter(F.col("depth") <= cfg.max_depth)

        # remaining per-seed maxPages budget (small aggregate)
        visited_counts = (
            frontier.filter(F.col("status").isin("visited", "error", "robots_blocked"))
            .groupBy("seed_host")
            .count()
        )
        all_seeds = frontier.select("seed_host").distinct()
        remaining = (
            all_seeds.join(visited_counts, "seed_host", "left")
            .select(
                "seed_host",
                (F.lit(cfg.max_pages) - F.coalesce(F.col("count"), F.lit(0))).alias("remaining"),
            )
        )

        take = FR.take_budgeted(
            visitable, remaining, cfg.host_wave_budget,
            robots=robots_df if cfg.wave_seconds else None,
            wave_seconds=cfg.wave_seconds,
        )
        take = take.withColumn("wave", F.lit(wave)).withColumn("visit_seq", F.col("enqueue_seq"))

        if robots_df is not None and cfg.check_robots:
            take, blocked = FR.robots_gate(take, robots_df)
            blocked = blocked.persist()
            n_blocked = blocked.count()
        else:
            blocked, n_blocked = None, 0

        fetched = fetch_pages(take, self.web, cfg.salt_partitions).persist()
        n_fetched = fetched.count()
        if n_fetched == 0 and n_blocked == 0 and too_deep.isEmpty():
            if blocked is not None:
                blocked.unpersist()
            fetched.unpersist()
            return False

        ok_pages = fetched.filter(F.col("fetch_ok"))

        # ---- link expansion on successfully fetched pages ----------------
        links = (
            FR.parse_links(ok_pages)
            .select(
                "seed_host",
                F.col("enqueue_seq").alias("parent_seq"),
                F.col("url").alias("parent_url"),
                F.col("depth").alias("parent_depth"),
                "link_idx",
                "href",
            )
        )
        cand = FR.clean_candidate_links(links)
        cand = FR.first_occurrence_per_page(cand)
        # persisted: feeds the anti-join, the dedup metric, and (via
        # new_frontier_rows) the frontier overwrite — one computation, not 3
        cand = FR.dedup_first_discoverer(cand).persist()
        bloom = (
            self.bloom_tbl.read(self.spark)
            if cfg.use_bloom and self.bloom_tbl.exists()
            else None
        )
        new = FR.anti_join_seen(cand, frontier, bloom=bloom)

        max_seq = frontier.groupBy("seed_host").agg(F.max("enqueue_seq").alias("max_seq"))
        if cfg.ordering == "strict":
            new = FR.assign_enqueue_seq(new, max_seq)
        else:
            # fast mode: any deterministic unique seq works; avoid the
            # per-seed sort entirely (throughput benchmarking)
            new = new.join(F.broadcast(max_seq), "seed_host", "left").withColumn(
                "enqueue_seq",
                F.coalesce(F.col("max_seq"), F.lit(0))
                + 1
                + F.pmod(F.xxhash64("url"), F.lit(2**40)),
            ).drop("max_seq")

        new_frontier_rows = new.select(
            "url",
            "seed_host",
            (F.col("parent_depth") + 1).alias("depth"),
            "enqueue_seq",
            F.lit(wave).alias("wave_discovered"),
            F.col("parent_url").alias("lineage"),
            F.lit("queued").alias("status"),
            F.lit(None).cast("int").alias("wave_visited"),
            F.lit(None).cast("long").alias("visit_seq"),
        ).persist()

        # ---- frontier state transition ------------------------------------
        visited_keys = fetched.select(
            "seed_host", "url", F.col("fetch_ok").alias("_ok"),
            F.col("visit_seq").alias("_vseq"),
        )
        if blocked is not None:
            visited_keys = visited_keys.unionByName(
                blocked.select(
                    "seed_host", "url", F.lit(None).cast("boolean").alias("_ok"),
                    F.col("visit_seq").alias("_vseq"),
                )
            )
        updated = (
            frontier.join(visited_keys, ["seed_host", "url"], "left")
            .withColumn(
                "status",
                F.when(F.col("_vseq").isNotNull() & F.col("_ok"), F.lit("visited"))
                .when(F.col("_vseq").isNotNull() & ~F.col("_ok"), F.lit("error"))
                .when(F.col("_vseq").isNotNull() & F.col("_ok").isNull(), F.lit("robots_blocked"))
                .otherwise(F.col("status")),
            )
            .withColumn(
                "wave_visited",
                F.when(F.col("_vseq").isNotNull(), F.lit(wave)).otherwise(F.col("wave_visited")),
            )
            .withColumn(
                "visit_seq",
                F.when(F.col("_vseq").isNotNull(), F.col("_vseq")).otherwise(F.col("visit_seq")),
            )
            .drop("_ok", "_vseq")
        )
        # depth-skipped rows: mark so they stop being candidates
        deep_keys = too_deep.select("seed_host", F.col("url").alias("_durl"))
        updated = (
            updated.join(
                deep_keys.withColumnRenamed("_durl", "url").withColumn("_deep", F.lit(True)),
                ["seed_host", "url"],
                "left",
            )
            .withColumn(
                "status",
                F.when(
                    F.col("_deep").isNotNull() & (F.col("status") == "queued"),
                    F.lit("depth_skipped"),
                ).otherwise(F.col("status")),
            )
            .drop("_deep")
        )

        next_frontier = updated.unionByName(new_frontier_rows)

        # ---- metrics + checkpoint (Iceberg-style snapshot summary) --------
        n_new = new_frontier_rows.count()
        n_cand = cand.count()
        summary = {
            "wave": wave,
            "pages_fetched": n_fetched,
            "robots_blocked": n_blocked,
            "candidates": n_cand,
            "deduped_out": n_cand - n_new,
            "new_urls": n_new,
        }
        # pages first, frontier second: the frontier snapshot is the commit
        # point of the wave. A crash between the two leaves a duplicate
        # pages append for a wave that will re-run — readers dedup on
        # (seed_host, url), so the duplicate is harmless.
        self.pages_tbl.append(
            fetched,
            summary={"wave": wave, "rows": n_fetched},
            lineage_key="seed_host",
        )
        if cfg.use_bloom:
            # incremental seen-set sketch: OR the new URLs into the side
            # table (north_rule: partitioned Bloom persisted next to the
            # frontier). Cheap: touches only buckets with new URLs.
            from web_crawler_spark.operators import seen_filter as SF

            delta_src = new_frontier_rows.select("url")
            if not self.bloom_tbl.exists():
                delta_src = delta_src.unionByName(frontier.select("url"))
            delta = SF.build_bloom(delta_src)
            merged = (
                SF.merge_blooms(self.bloom_tbl.read(self.spark), delta)
                if self.bloom_tbl.exists()
                else delta
            )
            self.bloom_tbl.overwrite(merged, summary={"wave": wave})
        self.frontier_tbl.overwrite(next_frontier, summary=summary, lineage_key="seed_host")
        self.frontier_tbl.expire_snapshots(self.cfg.keep_snapshots)
        self.pages_tbl.expire_snapshots(self.cfg.keep_snapshots)
        self.bloom_tbl.expire_snapshots(self.cfg.keep_snapshots)

        fetched.unpersist()
        cand.unpersist()
        new_frontier_rows.unpersist()
        if blocked is not None:
            blocked.unpersist()
        # progress iff we visited, blocked, or retired deep rows
        return True

    # ------------------------------------------------------------ results -
    def visit_order(self) -> DataFrame:
        """Fetched pages in reference FIFO order, per seed."""
        f = self.frontier_tbl.read(self.spark)
        return f.filter(F.col("status").isin("visited", "error")).orderBy(
            "seed_host", "visit_seq"
        )

    def discovered(self) -> DataFrame:
        return self.frontier_tbl.read(self.spark).orderBy("seed_host", "enqueue_seq")

    def prioritized(self) -> DataFrame:
        """Phase-2 prioritized URL list (W1 bucket sort)."""
        return FR.priority_rank(self.frontier_tbl.read(self.spark)).orderBy(
            "seed_host", "priority_rank"
        )
