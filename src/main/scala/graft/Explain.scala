package graft
import org.apache.spark.sql.SparkSession
/** Plan evidence dumper for PLANS.md — defaults to the JUDGED bench
  * configuration (local[32], shuffle=32, sf0.1) so the recorded plans
  * are the plans the bench actually runs; override via
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR for ad-hoc inspection. */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"================ $name")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
