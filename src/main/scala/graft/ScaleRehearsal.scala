package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale rehearsal (round-10 verdict item 5): measure one decade of
  * scaling (sf0.1 → sf1-equivalent) for the flagship dedup and ANN
  * families, turning the 100 TB plan-shape arguments into evidence.
  *
  * The driver ships no sf1 fixtures, so a 10× corpus is DERIVED from
  * sf0.1 deterministically (no RNG): ten copies of documents/embeddings
  * with copy k ≥ 1 perturbed so copies are NOT near-duplicates of each
  * other — texts get a per-(word, copy) md5 salt suffixed to every
  * word (vocabulary scales ~10×, token-frequency shape preserved, the
  * within-copy duplicate structure of the original corpus replicates
  * proportionally), and embeddings rotate by k dimensions (norm exactly
  * preserved, distribution shape intact). That keeps candidate-pair
  * density comparable per copy instead of planting a 10-deep
  * everything-matches-everything cluster, which would measure the
  * degenerate-bucket guard rather than the operator.
  *
  * Usage: `sbt "runMain graft.ScaleRehearsal"` — stages the scaled dir
  * under java.io.tmpdir, times each family query at both scales
  * (median of `SPARK_GRAFT_SCALE_REPS`, default 2), and prints a table
  * with per-query scaling exponents (log10 of the time ratio across
  * the 10× decade; 1.0 = linear). Results are recorded in PLANS.md.
  */
object ScaleRehearsal {

  val Families: Seq[String] = Seq(
    "dedup_minhash_lsh", "dedup_simhash", "dedup_substring_removal",
    "dedup_winnowing", "dedup_containment", "multimodal_phash_dedup",
    "sim_ann_ivfpq", "sim_ann_ivfpq_persisted", "sim_ann_ivfpq_incremental",
    // round 13 (verdict items 2+3): the expensive join family and the
    // two capstone pipelines — the remaining argued-but-unmeasured
    // 100× shapes
    "join_interval_overlap", "join_range_band", "join_skew_salted",
    "curate_full_pipeline", "multimodal_full_pipeline",
    // round 13: the tokenizer trainers' Heaps-law claim (cost linear in
    // DISTINCT words after one corpus word-count) measured directly —
    // the salted derivation grows the vocabulary ×factor, the exact
    // stress. BPE/WordPiece re-run their full chains per rep (no
    // memoized artifacts), so the trainer cost is what's timed;
    // unigram's judged tokenize serves from Staging-memoized artifacts,
    // so its median measures the SERVE path (broadcast word→pieces
    // join) with the one-time train/segment build reported in the
    // table's shared(b/X) column.
    "text_bpe_train", "text_wordpiece_train", "text_unigram_tokenize",
    // round 13: budget-constrained curation — the distributed prefix
    // sum (globalRunningSum) under a genuinely reshuffled total order
    "curate_token_budget",
    // round 14 (verdict items 1+2+5): the spectral family (Gram
    // explode-aggregate + the int64-rescale headroom claim under a
    // genuinely ×100 corpus), the incremental-containment PROBE path
    // (index build lands in the shared(b/X) column; the median times
    // the batch-vs-index join the O(batch) claim is about), and the
    // standalone k-means train/serve pair. All serve from Staging
    // artifacts, so their medians measure the SERVE path with builds
    // reported separately (the unigram-tokenize stance).
    "vec_pca_power", "vec_pca_project", "dedup_containment_incremental",
    "vec_kmeans_train", "vec_kmeans_assign",
    // round 14: the two new corpus-pass consumers — hybrid retrieval
    // (BM25 scan leg + dense top-k leg + broadcast fusion) and the
    // cluster-stratified budget (scoring scan + one cluster-key
    // window shuffle off the shared k-means assignment)
    "retrieval_hybrid_rrf", "curate_cluster_budget",
    // round 15: the persisted corpus-LM's serve path — batch bigram
    // explode + frozen-model join + one doc_id aggregate; the
    // one-time ×100 model train (two corpus aggregates) lands in the
    // shared(b/X) column via the lm_model onceDir build
    "doc_lm_score_persisted",
    // round 15: histogram-FFD packing — the claim that the solve
    // rides the (lang, length) histogram (corpus-size-independent
    // classes; driver walk linear only in PACKS) while the corpus
    // pays one aggregate + one rank window + a broadcast slot join
    "doc_pack_bestfit",
    // round 16 (verdict task 3): the two round-15 production shapes —
    // the bloom ingest gate (build is the O(corpus) side, landing in
    // the shared(b/X) column via the bloomidx onceDir; the median
    // times the probe + exact-confirm join) and the MinHash index
    // APPEND (both sides scale ×factor: standing index AND arrivals —
    // the dedup_containment_incremental discipline); plus task 6's
    // codebook maintenance (day-1 stats build shared, the median
    // times the day-2 stats pass + merge + full-corpus re-assign)
    "dedup_bloom_seen", "dedup_bloom_seen_persisted",
    "dedup_minhash_index_append", "vec_kmeans_update",
    // round 16: the delete rolls — O(tombstones) anti-join on the
    // persisted index at serve time (minhash: directional under the
    // cap; ivfpq: exact, lists uncapped)
    "dedup_minhash_index_delete", "sim_ann_ivfpq_delete",
    // round 16: the counting-bloom forget roll — treeAggregate build
    // in the shared column, O(deletes) decrement maintenance — and
    // the containment posting index's anti-join roll
    "dedup_bloom_seen_delete", "dedup_containment_index_delete",
    // round 16: the mergeable-statistics maintenance wave — the
    // k-means forget roll (exact stats subtraction; day-tombstone pass
    // + k·d-row merge, median times the survivor re-assign), the LM
    // count-form rolls (update = day-2 fold, forget = tombstone
    // subtraction; medians time the batch serve off the merged model),
    // and the BM25 inverted-index lifecycle (persisted serve should be
    // near corpus-size-INDEPENDENT thanks to the term-pruned postings
    // scan; append/delete add the merge/anti-join on top)
    "vec_kmeans_delete", "doc_lm_update", "doc_lm_forget",
    "retrieval_bm25_persisted", "retrieval_bm25_index_append",
    "retrieval_bm25_index_delete",
    // round 16: the PCA moment-form rolls (centered Gram re-expanded
    // exactly from merged uncentered moments; medians time the
    // O(day/tombstones) moment pass + the d²-row solve, with the
    // standing moment build in the shared column) and the online LM
    // forget (a full stream run per rep: v0 artifact write + two
    // subtract rolls + the held-out serve — the honest nightly cost)
    "vec_pca_update", "vec_pca_delete", "stream_lm_forget",
    // round 16: the containment index's EXACT append roll — day-2
    // shingle pass + vocab-sized df merge + the re-pruned union serve
    // (day-1 artifact build in the shared column; the median times the
    // roll + probe, both sides ×100)
    "dedup_containment_index_append",
    // round 16: the online BM25 append — a full stream run per rep
    // (v0 stats write + two batch-keyed posting rolls + the serve)
    "stream_bm25_index_append",
    // round 16: the simhash index lifecycle — probe (both sides ×100),
    // append roll (recap of day-1 ∪ day-2), delete roll (broadcast
    // anti-join); index builds land in the shared column
    "dedup_simhash_incremental", "dedup_simhash_index_append",
    "dedup_simhash_index_delete",
    // round 17: the two new lifecycle closers — the MinHash recap
    // (scheduled compaction that restores exactness after directional
    // deletes; expect ~the index-build exponent, the honest cost of a
    // recap window) and the LM log-and-compact roll (4 O(batch)
    // appends + one vocab-sized compaction; the artifact build lands
    // in the shared column, the median times the compacted serve)
    "dedup_minhash_index_recap", "doc_lm_compact",
    // round 17 over-delivery: the remaining two directional families'
    // recaps — same scheduled-compaction story (simhash: re-cap over
    // survivors; containment: survivor-df re-prune), expect ~their
    // index-build exponents
    "dedup_simhash_index_recap", "dedup_containment_index_recap",
    // round 17: the ONLINE log-and-compact (full stream run per rep:
    // 4 append triggers + one compaction + the serve — vs
    // stream_lm_forget's 2 read-modify-write triggers) and the
    // combined nightly roll (tombstone anti-join + arrival union +
    // re-cap in one O(index + batch) pass; the standing-index build
    // lands in the shared column)
    "stream_lm_compact", "dedup_minhash_index_roll",
    // round 18: the ONLINE nightly roll — a full stream run per rep
    // (4 O(batch) logging triggers: tombstone ids + arrival
    // sign-and-band) + the batch roll's fold + the serve; expect the
    // batch roll's class plus the arrival signature pass (the
    // standing-index build lands in the shared column)
    "stream_minhash_index_roll",
    // round 18 over-delivery: the second capped family's roll pair
    // (batch fold + the online twin) and the posting index's online
    // exact append (two O(batch) shingle+df logging triggers + one
    // vocab-sized df-merge fold + the re-pruned serve)
    "dedup_simhash_index_roll", "stream_simhash_index_roll",
    "stream_containment_index_append",
    // round 18: the last two streaming-maintenance cells — the
    // counting-bloom online forget (2 O(batch) treeAggregate triggers
    // + one cell-wise merge/subtract + the probe serve; artifact build
    // in the shared column) and the IVFADC online append (per-trigger
    // frozen-codebook assign+encode, O(batch); the day-1 train runs
    // in-query per rep, the incremental twin's honest cost)
    "stream_bloom_forget", "stream_ann_ivfpq_append",
    // round 18: the k-means online codebook roll (2 O(batch)
    // stats-reduction triggers + one k·d-row merge + the full-corpus
    // re-assign serve; day-1 stats/codebook builds in the shared
    // column)
    "stream_kmeans_update",
    // round 18: the spectral family's online moment roll (2 O(batch)
    // S1/S2/count reduction triggers + one d + d(d+1)/2-row merge +
    // the exact centered-Gram re-expansion and solve; day-1 moment
    // build in the shared column)
    "stream_pca_update")

  /** Families reading the relational fixture (events/orders/customer)
    * rather than documents/embeddings — routed to [[stageScaledRel]]. */
  private val RelFamilies: Set[String] =
    Set("join_interval_overlap", "join_range_band", "join_skew_salted")

  /** Build the 10× derived dir (documents + embeddings only — these
    * families read nothing else). Idempotent per JVM via onceDir. */
  def stageScaled(spark: SparkSession, sfDir: String, factor: Int): String =
    Staging.onceDir(spark, s"scaled_x$factor", sfDir) { base =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val copies = (0 until factor).map(lit(_))
      val docsX = docs
        .withColumn("k", explode(array(copies: _*)))
        .withColumn("doc_id", col("doc_id") + col("k") * 10000000L)
        .withColumn("text",
          when(col("k") === 0, col("text")).otherwise(
            array_join(transform(split(col("text"), " "),
              w => concat(w, substring(md5(concat(w, col("k"))), 1, 2))), " ")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("k")
      val dim = 64
      // copy k rotates by k mod dim; copies ≥ dim additionally negate
      // (norm preserved, and copy dim is −copy 0, not a duplicate) —
      // keeps every pair of copies non-near-dup up to factor 128
      val embsX = embs
        .withColumn("k", explode(array(copies: _*)))
        .withColumn("vec_id", col("vec_id") + col("k") * 10000000L)
        .withColumn("r", pmod(col("k"), lit(dim)))
        .withColumn("embedding",
          when(col("k") === 0, col("embedding")).otherwise(
            concat(slice(col("embedding"), col("r") + 1, lit(dim) - col("r")),
              slice(col("embedding"), lit(1), col("r")))))
        .withColumn("embedding",
          when(col("k") >= dim, transform(col("embedding"), x => -x))
            .otherwise(col("embedding")))
        .drop("k", "r")
      docsX.repartition(32).write.mode("overwrite").parquet(s"$base/documents.parquet")
      embsX.repartition(8).write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    }

  /** The relational twin of [[stageScaled]] (round 13): a ×factor
    * events/orders/customer fixture for the join family. The same
    * non-degeneracy principle as the document salting applies, adapted
    * to band semantics: copy k shifts `value` by +k·1000 — the fixture
    * values span [0, ~560], so 1000-wide strips keep every copy's
    * band/interval pairs strictly LOCAL to its own strip (band width
    * 0.05 and interval lengths ≤ 0.16 never bridge the gaps; a +k
    * shift was the first attempt and silently piled up to `factor`
    * copies inside the shared low-value region — a factor² pair
    * blow-up the first ×100 run surfaced as a stuck join). Copying
    * values in place would likewise densify a FIXED support ×factor
    * and measure the intrinsic ~factor² growth of the answer itself
    * (pair density is quadratic in per-band density — a property of
    * the QUERY, not the plan); the disjoint-strip model is the
    * production analog where new data occupies new key/value regions,
    * and keeps the expected output ~factor× so the exponent measures
    * the operator. Join keys shift by k·10⁹ (event_id,
    * o_custkey/c_custkey), preserving each copy's skew profile for
    * the salted join while keeping copies disjoint. `ts` round-trips
    * raw (readRawEvents) so the derived fixture keeps the source
    * encoding. */
  def stageScaledRel(spark: SparkSession, sfDir: String, factor: Int): String =
    Staging.onceDir(spark, s"scaled_rel_x$factor", sfDir) { base =>
      val copies = (0 until factor).map(lit(_))
      def fan(df: DataFrame): DataFrame =
        df.withColumn("k", explode(array(copies: _*)))
      fan(graft.Tables.readRawEvents(spark, s"$sfDir/events.parquet"))
        .withColumn("event_id", col("event_id") + col("k") * 1000000000L)
        .withColumn("value", col("value") + col("k") * lit(1000.0))
        .drop("k")
        .repartition(32).write.mode("overwrite").parquet(s"$base/events.parquet")
      fan(spark.read.parquet(s"$sfDir/orders.parquet"))
        .withColumn("o_custkey", col("o_custkey") + col("k") * 1000000000L)
        .withColumn("o_orderkey", col("o_orderkey") + col("k") * 1000000000L)
        .drop("k")
        .repartition(32).write.mode("overwrite").parquet(s"$base/orders.parquet")
      fan(spark.read.parquet(s"$sfDir/customer.parquet"))
        .withColumn("c_custkey", col("c_custkey") + col("k") * 1000000000L)
        .drop("k")
        .repartition(8).write.mode("overwrite").parquet(s"$base/customer.parquet")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // round-12 (verdict item 5): a SECOND decade — the same derivation
    // at ×100 — for the families whose ×10 ratios sat highest; factor
    // and family selection are env-driven so the deep run stays scoped
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    // factor=1 would divide the exponent by log10(1)=0; factor<1 is
    // nonsense for a scale-UP rehearsal — reject the config up front
    // (round-12 ADVICE, the same degenerate-config hazard Bench guards).
    // Upper bound: the derivations space copies 10^7 ids apart while
    // multimodal_full_pipeline plants twins at id + 10^9 — at factor
    // 101+ a high copy's base ids collide with copy-0's twin ids and
    // the banding/survivorship counts corrupt SILENTLY; embeddings'
    // rotate-then-negate scheme likewise guarantees non-near-dup
    // copies only up to 2·dim = 128.
    require(factor > 1 && factor <= 100,
      s"SPARK_GRAFT_SCALE_FACTOR must be in [2, 100] (id-spacing and " +
        s"rotation-derivation invariants), got $factor")
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").map(_.trim).toSet)
    // a typo'd selector silently matching no families would run nothing
    // and print a headline-free table — mirror Bench's BENCH_ONLY guard
    only.foreach { sel =>
      val unknown = sel -- Families.toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_SCALE_ONLY names unknown families: ${unknown.mkString(",")}")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = Families.filter(q => only.forall(_.contains(q)))
    // stage lazily: only the fixtures the selected families read
    lazy val scaledDocs = {
      val p = stageScaled(spark, sfDir, factor)
      println(s"[scale] staged ${factor}x documents/embeddings at $p"); p
    }
    lazy val scaledRel = {
      val p = stageScaledRel(spark, sfDir, factor)
      println(s"[scale] staged ${factor}x events/orders/customer at $p"); p
    }
    def scaledDirFor(q: String): String =
      if (RelFamilies.contains(q)) scaledRel else scaledDocs
    def time(name: String, dir: String): (Double, Long, Double) = {
      val fn = SparkEntry.queries(name)
      var lastDf: DataFrame = null
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        lastDf = df
        (System.nanoTime() - t0) / 1e9
      }
      // Staging.frame/onceDir artifacts build once per (JVM, dir) —
      // inside the FIRST rep — and later reps serve from the memo, so
      // the median alone under-reports families with shared inputs
      // (the Bench shared_staging discipline). The build seconds that
      // landed during these reps are reported as a separate column;
      // memoized families' exponents then explicitly measure the
      // SERVE path (ivfpq_persisted's long-standing stance).
      val shared0 = Staging.sharedBuildSeconds.values.sum
      def sample(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val secs = once()
        (secs, Staging.buildCompletedIn(t0, System.nanoTime()))
      }
      val all = List.fill(reps)(sample())
      // a rep that paid a once-per-JVM Staging build is EXCLUDED from
      // the median whenever a clean rep exists (Bench's discipline —
      // otherwise the build lands in the median AND in the shared
      // column, double-counted); under reps=1, or when every rep paid
      // a build, the contaminated sample is all there is
      val clean = { val c = all.filterNot(_._2); if (c.nonEmpty) c else all }
      val runs = clean.map(_._1).sorted
      val sharedBuilt = Staging.sharedBuildSeconds.values.sum - shared0
      // row count untimed, from the last materialized frame — a sanity
      // check that the scaled corpus produces non-degenerate output
      val n = lastDf.count()
      System.gc()
      (runs(runs.size / 2), n, sharedBuilt)
    }
    // fitted exponent: t ∝ N^e over the measured span ⇒
    // e = log(tX/t1) / log(factor); 1.0 = linear, < 1 = sub-linear
    println(f"${"query"}%-28s ${"t(sf0.1)"}%9s ${s"t(x$factor)"}%9s ${"ratio"}%6s ${"exponent"}%8s  rows0.1 rowsX  shared(b/X)")
    selected.foreach { q =>
      val (t1, n1, b1) = time(q, sfDir)
      val (tX, nX, bX) = time(q, scaledDirFor(q))
      val ratio = tX / t1
      val expo = math.log10(ratio) / math.log10(factor.toDouble)
      println(f"$q%-28s $t1%9.2f $tX%9.2f $ratio%6.2f $expo%8.2f  $n1%7d $nX%6d  $b1%.1f/$bX%.1f")
    }
    spark.stop()
  }
}
