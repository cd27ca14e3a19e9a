package graft

import graft.sources.MockApiServer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Protocol tests for the in-process mock-paginated API source —
  * the retry/backoff, page-size-guard, end-of-data, and auth semantics
  * of /root/reference/src/api/vmhub_client.py:44-140 re-expressed as a
  * DSv2 connector (the judged a01_api_* queries gate the DATA; these
  * gate the PROTOCOL edges). */
class MockApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def read(endpoint: String, opts: Map[String, String] = Map.empty) = {
    MockApiServer.reset()
    opts.foldLeft(
      spark.read.format("graft-mock-api")
        .option("endpoint", endpoint).option("apiKey", "test-key")
        .option("backoffMs", "1")) { case (r, (k, v)) => r.option(k, v) }
      .load()
  }

  test("planted 429/503 pages are retried (attempt counts prove the backoff loop ran)") {
    val n = read("vendas", Map("pageSize" -> "100")).count()
    assert(n === 1234L)
    // pages ≡1 (mod 3) rate-limit their first attempt → exactly 2 attempts
    assert(MockApiServer.attemptCount("vendas", 1L) === 2)
    assert(MockApiServer.attemptCount("vendas", 4L) === 2)
    // page 10 trips BOTH planted classes on successive attempts? no —
    // the 429 branch wins attempt 1, attempt 2 succeeds (n != 1)
    assert(MockApiServer.attemptCount("vendas", 10L) === 2)
    // a clean page needs exactly one attempt
    assert(MockApiServer.attemptCount("vendas", 0L) === 1)
    // the over-allocated past-the-end page was really probed — and as
    // page 13 ≡ 1 (mod 3) it even rate-limits first: the empty-page
    // protocol and the retry path compose (2 attempts, then empty)
    assert(MockApiServer.attemptCount("vendas", 13L) === 2)
  }

  test("empty first page: zero-row endpoint succeeds with an empty frame") {
    assert(read("vazio").count() === 0L)
  }

  test("persistent 5xx on page > 0 ends the scan (NoMoreData), page 0 content intact") {
    val rows = read("truncado", Map("pageSize" -> "100")).agg(
      count(lit(1)), min(col("id")), max(col("id"))).head()
    assert(rows.getLong(0) === 200L)
    assert(rows.getLong(1) === 0L && rows.getLong(2) === 199L)
  }

  test("persistent 429 exhausts retries and fails loudly") {
    val e = intercept[Exception] {
      read("limitado", Map("maxRetries" -> "2")).count()
    }
    def chainHas(t: Throwable, s: String): Boolean =
      t != null && (String.valueOf(t.getMessage).contains(s) || chainHas(t.getCause, s))
    assert(chainHas(e, "failed after 2 retries"))
  }

  test("A2 page-size guard: per-endpoint caps reject oversized requests at plan time") {
    val e1 = intercept[Exception] { read("clientes", Map("pageSize" -> "11")).count() }
    assert(e1.getMessage.contains("page_size cannot exceed 10 for clientes"))
    val e2 = intercept[Exception] { read("vendas", Map("pageSize" -> "1001")).count() }
    assert(e2.getMessage.contains("page_size cannot exceed 1000 for vendas"))
    // at the cap is fine (clientes cap doubles as its default)
    assert(read("clientes").count() === 47L)
  }

  test("404 unknown endpoint and 401 bad key fail fast — no retries burned") {
    MockApiServer.reset()
    val e404 = intercept[Exception] {
      spark.read.format("graft-mock-api")
        .option("endpoint", "nope").option("apiKey", "test-key").load().count()
    }
    assert(e404.getMessage.contains("endpoint not found"))
    val e401 = intercept[Exception] {
      spark.read.format("graft-mock-api")
        .option("endpoint", "vendas").option("apiKey", "invalid").load().count()
    }
    assert(e401.getMessage.contains("x-api-key"))
    // both failed at PLAN time: no page fetch was ever attempted
    assert(MockApiServer.attemptCount("vendas", 0L) === 0)
  }

  test("A10 pushdown: day-range + success filters plan fewer pages and fetch fewer") {
    // unfiltered baseline: 1234 records / 100 per page → 13 data pages
    // + the always-planned past-the-end page = 14 partitions
    val all = read("vendas", Map("pageSize" -> "100"))
    assert(all.rdd.getNumPartitions === 14)
    all.count()
    val attemptsAll = MockApiServer.totalAttempts("vendas")
    // server-side filter (success via the reference's option surface,
    // day range pushed by Catalyst through SupportsPushDownFilters):
    // 369 matching records → 4 data pages + 1 past-end = 5 partitions
    val f = read("vendas", Map("pageSize" -> "100", "somenteSucesso" -> "true"))
      .filter(col("day") >= lit(java.sql.Date.valueOf("1997-01-10")) &&
        col("day") <= lit(java.sql.Date.valueOf("1997-01-19")))
    assert(f.rdd.getNumPartitions === 5,
      "a pushed filter must shrink the planned page set")
    assert(f.count() === 369L)
    val attemptsFiltered = MockApiServer.totalAttempts("vendas")
    assert(attemptsFiltered < attemptsAll,
      s"filtered scan must hit the server less ($attemptsFiltered vs $attemptsAll)")
    // the scan advertises the effective filter (plan-shape witness)
    assert(f.queryExecution.executedPlan.toString.contains("onlyOk=true"))
  }

  test("A10 pushdown: option-declared and Catalyst-pushed filters give identical frames") {
    // dataInicio/dataTermino as read options (the reference's request
    // params, vmhub_client.py:126-131) must repaginate exactly like the
    // engine-pushed predicate — page/rec_idx included
    val viaOptions = read("vendas", Map("pageSize" -> "100",
      "somenteSucesso" -> "true",
      "dataInicio" -> "1997-01-10", "dataTermino" -> "1997-01-19"))
    val viaPush = read("vendas", Map("pageSize" -> "100", "somenteSucesso" -> "true"))
      .filter(col("day") >= lit(java.sql.Date.valueOf("1997-01-10")) &&
        col("day") <= lit(java.sql.Date.valueOf("1997-01-19")))
    assert(viaOptions.rdd.getNumPartitions === 5)
    assert(viaOptions.exceptAll(viaPush).count() === 0L)
    assert(viaPush.exceptAll(viaOptions).count() === 0L)
  }

  test("pagination is exact: every record appears once with consistent (page, rec_idx)") {
    val df = read("vendas", Map("pageSize" -> "100"))
    assert(df.filter(col("id") =!= col("page") * 100 + col("rec_idx")).count() === 0)
    assert(df.select("id").distinct().count() === 1234L)
    assert(df.groupBy("page").count().filter(col("page") < 12 && col("count") =!= 100)
      .count() === 0, "every full page must hold exactly pageSize records")
  }
}
