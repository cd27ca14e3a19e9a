package graft

import graft.operators.ConfigStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A21 — the strict scalar API's three reference behaviors
  * (firestore_helper.py:18,24) plus the set-oriented lookup's
  * broadcast-join plan shape and error partition. */
class ConfigStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("getCustomerData returns the (token, cnpj) pair for a configured tenant") {
    // k=1: 1%5!=3, 1%7!=2, 1%11!=5 → fully configured
    val (tok, cnpj) = ConfigStore.getCustomerData(spark, sf, "u1")
    assert(tok === s"tok-${(1L * 2654435761L) % 1000000007L}")
    assert(cnpj.length === 14 && cnpj.forall(_.isDigit))
  }

  test("getCustomerData throws the reference's missing-document error") {
    // k=3: 3%5==3 → no document staged
    val e = intercept[IllegalArgumentException](ConfigStore.getCustomerData(spark, sf, "u3"))
    assert(e.getMessage === "no config document found at /users/u3/config/settings")
  }

  test("getCustomerData treats an EMPTY token and an ABSENT cnpj key alike (ref :24)") {
    // k=2: 2%7==2 → vmhubToken = '' (present but falsy)
    val e1 = intercept[IllegalArgumentException](ConfigStore.getCustomerData(spark, sf, "u2"))
    assert(e1.getMessage === ConfigStore.MissingField)
    // k=5: 5%11==5 → cnpj key maps to NULL
    val e2 = intercept[IllegalArgumentException](ConfigStore.getCustomerData(spark, sf, "u5"))
    assert(e2.getMessage === ConfigStore.MissingField)
  }

  test("a21_config_lookup: error partition matches the arithmetic; lookup is a broadcast join") {
    val df = SparkEntry.queries("a21_config_lookup")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast lookup, got:\n$plan")
    val rows = df.collect().map(r =>
      (r.getString(0).drop(1).toLong, r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, tok, cnpj, err) =>
      if (k % 5 == 3)
        assert(err == s"no config document found at /users/u$k/config/settings" && tok == null && cnpj == null)
      else if (k % 7 == 2 || k % 11 == 5)
        assert(err == ConfigStore.MissingField && tok == null && cnpj == null)
      else {
        assert(err == null, s"u$k unexpectedly errored: $err")
        assert(tok.startsWith("tok-") && cnpj.length == 14)
      }
    }
    // every customer appears exactly once — the lookup never drops or dups a tenant
    val total = Tables.customer(spark, sf).count()
    assert(rows.length.toLong === total)
    assert(rows.map(_._1).distinct.length === rows.length)
  }
}
