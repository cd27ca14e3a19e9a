package graft.operators

/** The ONE probe interface over the engine's two persisted bloom
  * kinds — Spark's bit [[org.apache.spark.util.sketch.BloomFilter]]
  * (append-only, bit-OR merge) and the deletable [[CountingBloom]]
  * (counter cells, subtractable). The seen-fingerprint family's three
  * serve paths (batch, streaming, post-delete) all probe through
  * [[graft.expressions.BloomMightContain]], a single registered native
  * expression taking a `Broadcast[BloomProbe]` — one definition, so
  * the call sites cannot drift (round-16 verdict task 6; previously
  * each QueryDef body closed over its own `udf(...)`).
  *
  * Contract: `contains(fp)` is the sketch's might-contain — false
  * positives allowed at the sized fpp, false negatives never (for the
  * counting variant: never for items currently in the set). Callers
  * treat a positive as a CANDIDATE and confirm with the exact join —
  * the family's standing discipline, so fpp is a cost knob, not a
  * correctness one.
  */
trait BloomProbe extends Serializable {
  def contains(fp: String): Boolean
}

/** Adapter over Spark's bit bloom. `mightContainString` hashes the
  * UTF-8 bytes — the same bytes the builder's `stat.bloomFilter` on a
  * string column inserted. */
final class SparkBloomProbe(private val b: org.apache.spark.util.sketch.BloomFilter)
    extends BloomProbe {
  override def contains(fp: String): Boolean = b.mightContainString(fp)
}

/** Driver-side handle registry backing the SQL surface of
  * `graft_might_contain(fp, 'handle')`: a query registers its
  * broadcast under a name BEFORE building the plan; the function
  * builder resolves the handle AT ANALYSIS TIME (on the driver, where
  * the map lives) and bakes the `Broadcast` into the expression — the
  * broadcast handle is what ships with the task, so executors fetch
  * the artifact through the block manager exactly like the DataFrame
  * path. The registry itself never leaves the driver. */
object BloomRegistry {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.broadcast.Broadcast[BloomProbe]]()

  /** Register (or replace — re-staged fixtures rebuild their blooms)
    * and return the handle for SQL use. */
  def register(handle: String,
      bc: org.apache.spark.broadcast.Broadcast[BloomProbe]): String = {
    m.put(handle, bc)
    handle
  }

  def resolve(handle: String): org.apache.spark.broadcast.Broadcast[BloomProbe] = {
    val v = m.get(handle)
    require(v != null,
      s"no bloom registered under handle '$handle' - call BloomRegistry.register first")
    v
  }
}
