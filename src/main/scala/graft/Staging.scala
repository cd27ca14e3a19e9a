package graft

/** Per-(prefix, input-path) local staging roots for the round-trip /
  * streaming queries. The name is the SANITIZED path (readable) plus a
  * short md5 of the RAW path: sanitization alone is not injective
  * ('/a/b' and '/a_b' collide), so the hash pins distinct input dirs to
  * distinct staging roots — concurrent runs over colliding sf dirs can
  * never clobber each other's staging (same scheme as the bucketed
  * table names in Relational3.join_bucketed).
  */
object Staging {

  /** Short collision-resistant suffix for `raw` (sanitized + md5-8). */
  def suffix(raw: String): String =
    raw.replaceAll("[^A-Za-z0-9]", "_").toLowerCase + "_" +
      java.security.MessageDigest.getInstance("MD5").digest(raw.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)

  /** Staging root `<tmpdir>/graft_q_<prefix>_<suffix(raw)>`. */
  def dir(prefix: String, raw: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_q_${prefix}_${suffix(raw)}"
}
