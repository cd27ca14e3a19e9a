package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators — the UDAF surface row of SURVEY.md §2
  * Part B. Kept integer-exact so results stay oracle-comparable.
  */
object Udafs {

  /** Exact long sum via the Aggregator API (the typed custom-agg
    * extension point; functionally sum(), here to exercise and pin the
    * API surface with an oracle-checkable result). */
  object SumCents extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b + a
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** (count, sum) running pair → exact integer mean floor — a
    * multi-field buffer Aggregator. */
  object MeanCentsFloor extends Aggregator[Long, (Long, Long), Long] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Long): (Long, Long) = (b._1 + 1, b._2 + a)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) = (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Long =
      if (r._1 == 0) 0L else Math.floorDiv(r._2, r._1)
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
