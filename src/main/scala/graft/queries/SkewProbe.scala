package graft.queries

import graft.ScaleRehearsal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 verdict item 4: settle `join_skew_salted`'s near-linear
  * ×10→×100 marginal decade (0.91 — the closest to linear in the
  * roster) with a direct A/B on the SAME ×100 derived workload:
  *
  *   - `salt`  — the judged plan (ScaleOps.saltedJoin, manual salt 8),
  *   - `aqe`   — the plain equi-join under stock AQE (skew-join
  *               handling on, default broadcast threshold),
  *   - `aqe_nobc` — plain join with broadcast disabled, isolating
  *               AQE's skew-split SortMergeJoin from a broadcast win.
  *
  * Variants interleave (salt, aqe, nobc, salt, …, `SPARK_GRAFT_SKEW_REPS`
  * rounds, default 3) so JIT/page-cache warmup cannot bias one arm;
  * per-variant medians print at the end, plus a one-time value-parity
  * check (salting only reroutes rows — all three must agree) and the
  * aqe variant's executed-plan skew markers. Findings are recorded in
  * PLANS.md and the winner keeps the judged query's body.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SKEW_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = ScaleRehearsal.stageScaledRel(spark, sfDir, factor)
    println(s"[skew-probe] staged x$factor rel fixture at $dir")

    def orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"))
    def cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    def agg(j: DataFrame): DataFrame = j
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment"))

    def salted(): DataFrame =
      agg(graft.operators.ScaleOps.saltedJoin(orders, cust, "o_custkey", salt = 8))
    def plain(): DataFrame = agg(orders.join(cust, Seq("o_custkey")))

    // conf applies at EXECUTION time (ConfScope's contract), so each
    // variant both builds AND materializes inside its own scope
    def noBc[T](body: => T): T = graft.operators.ConfScope.withConf(spark,
      Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"))(body)
    val variants: Seq[(String, () => Unit)] = Seq(
      "salt" -> (() => salted().write.format("noop").mode("overwrite").save()),
      "aqe" -> (() => plain().write.format("noop").mode("overwrite").save()),
      "aqe_nobc" -> (() => noBc(
        plain().write.format("noop").mode("overwrite").save())))

    // value parity first (and a warm pass for all arms)
    val rows = Seq(
      "salt" -> salted().collect().toSeq,
      "aqe" -> plain().collect().toSeq,
      "aqe_nobc" -> noBc(plain().collect().toSeq))
    rows.sliding(2).foreach { case Seq((na, a), (nb, b)) =>
      require(a == b, s"variant results differ: $na vs $nb") }
    println(s"[skew-probe] value parity across ${rows.size} variants: OK (${rows.head._2.size} rows)")

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f()
      val secs = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ secs
      println(f"[skew-probe] round $r $name%-8s $secs%6.2f s")
    }
    variants.foreach { case (name, _) =>
      val sorted = times(name).sorted
      println(f"[skew-probe] MEDIAN $name%-8s ${sorted(sorted.size / 2)}%6.2f s  (all: ${times(name).map(t => f"$t%.2f").mkString(", ")})")
    }
    // did AQE actually see and split skew? The write executes a
    // SEPARATE QueryExecution, so the marker must come from a plan
    // this same QE executed — toRdd.count() finalizes AQE on it
    // (PlanShapeSpec's AQE-test discipline; the pre-fix readout
    // inspected a never-executed QE and was structurally always 0,
    // round-14 review finding)
    val pNobc = noBc {
      val qe = plain().queryExecution
      qe.toRdd.count()
      qe.executedPlan.toString
    }
    println(s"[skew-probe] aqe_nobc plan: skewMarkers=${"skew=true".r.findAllIn(pNobc).size}, " +
      s"smj=${pNobc.contains("SortMergeJoin")}, bhj=${pNobc.contains("BroadcastHashJoin")}")
    spark.stop()
  }
}
