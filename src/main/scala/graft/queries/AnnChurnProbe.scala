package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Diagnostics main (round-18 verdict task 4; NOT part of the judged
  * surface): the ANN QUALITY-AFTER-MAINTENANCE dial. The IVFPQ
  * append/delete rolls are exact w.r.t. the tombstone-serve
  * (sim_ann_ivfpq_incremental / _delete gates), but their codebooks
  * stay FROZEN — after sustained append+delete churn the coarse
  * centroids and PQ codebooks describe a corpus that partly departed.
  * This probe measures what that staleness actually costs, the way the
  * recap-cadence dial priced the directional-delete gap:
  *
  * For churn fraction c (appends c% + deletes c% of the corpus):
  *   base    B = vec_id%100 ∉ [50, 50+c)      (what the codebooks saw)
  *   deletes D = vec_id%100 ∈ [50−c, 50)      (departed training data)
  *   standing S = (B ∖ D) ∪ A = vec_id%100 ∉ [50−c, 50)
  *   STALE index: coarse+fine trained on B, ALL of S assigned+encoded
  *     off the frozen codebooks (exactly the maintained artifact the
  *     judged rolls produce);
  *   FRESH index: coarse+fine retrained on S (the scheduled rebuild).
  * Both serve the same 20 query vectors (vec_id < 20 ⊂ B ∖ D — stable
  * across cells so only INDEX quality moves) at nprobe=2, ADC
  * shortlist 50, exact re-rank top-5; recall@5 against the brute-force
  * exact top-5 over S. recall(fresh) − recall(stale) at each c is the
  * retrain dividend; where it rises is the retrain cadence.
  *
  * Everything is deterministic (Lloyd from fixed seeds, integer
  * arithmetic), so this is a QUALITY dial, not a timing — reps are
  * unnecessary. Results → PLANS.md.
  *
  * Usage: `sbt "runMain graft.queries.AnnChurnProbe"` (env
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CHURNS="5,10,25").
  */
object AnnChurnProbe {

  private val NQueries = 20

  /** Residual sub-vector frame (vec_id, s, sub, sn2) — the
    * VectorQueries2.ivfpqResiduals shape (private there). */
  private def residuals(v: DataFrame, coarse: DataFrame, asg: DataFrame): DataFrame = {
    val resid = v.join(asg, Seq("vec_id"))
      .join(broadcast(coarse.select(col("c_id").as("cluster"), col("cq"))), Seq("cluster"))
      .select(col("vec_id"), zip_with(col("q"), col("cq"), (a, b) => a - b).as("r"))
    resid.select(col("vec_id"), posexplode(array(
        (0 until 8).map(t => slice(col("r"), t * 8 + 1, 8)): _*)).as(Seq("s", "sub")))
      .withColumn("sn2", qdot(col("sub"), col("sub")))
  }

  /** ivfProbes with a parameterized query set (the shared one pins
    * vec_id < 5; 20 queries give the dial 100 neighbor slots). */
  private def probesOf(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("c_id"))
    queries.crossJoin(broadcast(cents))
      .withColumn("csim", cosineFromQ(qdot(col("q"), col("cq")), col("n2"), col("cn2")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("c_id").as("cluster"))
  }

  /** IVFADC serve (the VectorQueries2.ivfpqServe shape, query set
    * parameterized): per-(query, probed-cell) residual LUT, ADC sum,
    * top-50 shortlist, exact re-rank, top-5 ids per query. */
  private def serve(vS: DataFrame, queries: DataFrame, coarse: DataFrame,
      fine: DataFrame, codes: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = probesOf(queries, coarse, nprobe)
    val qres = probes
      .join(queries.select(col("vec_id").as("q_id"), col("q")), Seq("q_id"))
      .join(broadcast(coarse.select(col("c_id").as("cluster"), col("cq"))), Seq("cluster"))
      .select(col("q_id"), col("cluster"),
        zip_with(col("q"), col("cq"), (a, b) => a - b).as("r"))
    val qsubs = qres.select(col("q_id"), col("cluster"), posexplode(array(
        (0 until 8).map(t => slice(col("r"), t * 8 + 1, 8)): _*)).as(Seq("s", "sub")))
      .withColumn("sn2", qdot(col("sub"), col("sub")))
    val lut = qsubs.join(broadcast(fine), Seq("s"))
      .withColumn("d2", col("sn2") + col("cn2") - lit(2L) * qdot(col("sub"), col("csub")))
      .select(col("q_id"), col("cluster"), col("s"), col("c_id").as("code"), col("d2"))
    val cand = probes.join(codes, Seq("cluster")).filter(col("vec_id") =!= col("q_id"))
    val adc = cand.join(broadcast(lut), Seq("q_id", "cluster", "s", "code"))
      .groupBy(col("q_id"), col("vec_id")).agg(sum(col("d2")).as("adc"))
    val wS = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    val short = adc.withColumn("srn", row_number().over(wS)).filter(col("srn") <= 50)
      .select(col("q_id"), col("vec_id"))
    val qa = queries.select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"))
    val scored = short.join(broadcast(qa), Seq("q_id")).join(vS, Seq("vec_id"))
      .withColumn("cosine", cosineFromQ(qdot(col("qq"), col("q")), col("qn2"), col("n2")))
    val wR = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(wR)).filter(col("rnk") <= 5)
      .select(col("q_id"), col("vec_id"))
  }

  /** Brute-force exact top-5 over the standing corpus. */
  private def exact(vS: DataFrame, queries: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qa = queries.select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"))
    val pairs = vS.join(broadcast(qa), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineFromQ(qdot(col("q"), col("qq")), col("n2"), col("qn2")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("q_id"), col("vec_id"))
  }

  private def recallAt5(ann: DataFrame, ex: DataFrame): Double = {
    val hits = ex.join(ann, Seq("q_id", "vec_id"), "left_semi").count()
    hits.toDouble / ex.count()
  }

  /** One dial cell: (recall@5 of the STALE maintained index, recall@5
    * of the FRESH retrain, |S|) at churn percent `c` per side. Also
    * the AnnChurnSpec entry point — the spec gates the frozen-encode
    * maintenance mechanism's quality floor at the 25%+25% cell. */
  private[graft] def recallPair(spark: SparkSession, sfDir: String,
      c: Int): (Double, Double, Long) = {
    require(c > 0 && c <= 25,
      "churn percent must be in (0, 25] so deletes/arrivals stay disjoint " +
        s"and the $NQueries query vectors stay standing")
    val v = VectorQueries.ivfCorpus(spark, sfDir).localCheckpoint()
    val res = pmod(col("vec_id"), lit(100L))
    val vB = v.filter(res < 50 || res >= 50 + c).localCheckpoint()
    val vS = v.filter(res < 50 - c || res >= 50).localCheckpoint()
    val queries = vS.filter(col("vec_id") < NQueries).localCheckpoint()
    val ex = exact(vS, queries).localCheckpoint()

    def buildAndServe(train: DataFrame): Double = {
      val coarse = VectorQueries.lloydCentroids(train, 8).localCheckpoint()
      val asgTrain = VectorQueries.ivfAssign(train, coarse)
      val fine = VectorQueries.lloydSubCentroids(
        residuals(train, coarse, asgTrain), 16).localCheckpoint()
      // the maintained artifact: the FULL standing corpus encoded off
      // these codebooks (per-vector pure — exactly what the judged
      // append/delete rolls leave on disk)
      val asgS = VectorQueries.ivfAssign(vS, coarse)
      val codes = VectorQueries.pqEncode(residuals(vS, coarse, asgS), fine)
        .join(asgS, Seq("vec_id")).localCheckpoint()
      recallAt5(serve(vS, queries, coarse, fine, codes, nprobe = 2), ex)
    }

    (buildAndServe(vB), buildAndServe(vS), vS.count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val churns = sys.env.getOrElse("SPARK_GRAFT_CHURNS", "5,10,25")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"churn%"}%7s ${"appends+deletes"}%16s ${"|S|"}%8s ${"recall_stale"}%13s ${"recall_fresh"}%13s ${"dividend"}%9s")
    churns.foreach { c =>
      val (stale, fresh, nS) = recallPair(spark, sfDir, c)
      println(f"${c * 2}%7d ${s"$c% + $c%"}%16s $nS%8d $stale%13.3f $fresh%13.3f ${fresh - stale}%+9.3f")
    }
    spark.stop()
  }
}
