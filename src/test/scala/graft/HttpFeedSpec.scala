package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpFeed
import graft.operators.IngestOps

/** Live ingestion end-to-end against a loopback fake of the carbon
  * API (reference etl_job.py:96-137): payload shape, retry-with-
  * backoff semantics (fail-twice-then-succeed, exhaust-and-throw),
  * the distributed many-endpoint sweep, and the documented
  * socket → parse → validate composition. */
class HttpFeedSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val feedJson =
    """{"from": "2024-05-21T19:00Z", "intensity": {"actual": 18342, "forecast": 18000}}"""
  private val forecastOnlyJson =
    """{"from": "2024-05-21T20:00Z", "intensity": {"actual": null, "forecast": 17500}}"""

  private def withServer(routes: Map[String, HttpExchange => Unit])
                        (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => handler(ex))
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("fetchOne lands the feed document in a one-row frame") {
    withServer(Map("/intensity" -> (respond(_, 200, feedJson)))) { base =>
      val df = HttpFeed.fetchOne(spark, s"$base/intensity", baseDelayMs = 1L)
      val r = df.collect().head
      assert(df.count() == 1)
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[String]("payload") == feedJson)
      assert(r.getAs[Int]("attempts") == 1)
    }
  }

  test("retry: two failures then success, reference backoff shape") {
    val calls = new AtomicInteger(0)
    val flaky: HttpExchange => Unit = { ex =>
      if (calls.incrementAndGet() <= 2) respond(ex, 500, "boom")
      else respond(ex, 200, feedJson)
    }
    withServer(Map("/flaky" -> flaky)) { base =>
      val r = HttpFeed.fetchOne(spark, s"$base/flaky", baseDelayMs = 1L)
        .collect().head
      assert(r.getAs[Int]("attempts") == 3, "third attempt succeeds")
      assert(r.getAs[String]("payload") == feedJson)
      assert(calls.get() == 3)
    }
  }

  test("retry: exhausting MaxRetries rethrows like the reference") {
    val calls = new AtomicInteger(0)
    val dead: HttpExchange => Unit = { ex =>
      calls.incrementAndGet(); respond(ex, 503, "down")
    }
    withServer(Map("/dead" -> dead)) { base =>
      val e = intercept[java.io.IOException] {
        HttpFeed.fetchOne(spark, s"$base/dead", baseDelayMs = 1L)
      }
      assert(e.getMessage.contains("HTTP 503"))
      assert(calls.get() == HttpFeed.MaxRetries, "exactly MaxRetries attempts")
    }
  }

  test("fetchMany sweeps endpoints distributed; a dead one becomes a row, not a task failure") {
    withServer(Map(
      "/a" -> (respond(_, 200, feedJson)),
      "/b" -> (respond(_, 200, forecastOnlyJson)),
      "/dead" -> (respond(_, 500, "nope")))) { base =>
      val urls = Seq(s"$base/a", s"$base/b", s"$base/dead")
      val rows = HttpFeed.fetchMany(spark, urls, parallelism = 2,
          maxAttempts = 2, baseDelayMs = 1L)
        .collect().map(r => r.getAs[String]("url") -> r).toMap
      assert(rows.size == 3)
      assert(rows(s"$base/a").getAs[Int]("status") == 200)
      assert(rows(s"$base/b").getAs[String]("payload") == forecastOnlyJson)
      val dead = rows(s"$base/dead")
      assert(dead.getAs[Int]("status") == -1)
      assert(dead.getAs[String]("payload") == null)
      assert(dead.getAs[String]("error").contains("HTTP 500"))
    }
  }

  test("socket → parse → validate: the documented live composition") {
    withServer(Map(
      "/intensity" -> (respond(_, 200, feedJson)),
      "/forecast" -> (respond(_, 200, forecastOnlyJson)))) { base =>
      val parsed = HttpFeed.fetchMany(spark,
          Seq(s"$base/intensity", s"$base/forecast"), baseDelayMs = 1L)
        .transform(IngestOps.parsePayloads("url", "payload"))
        .collect().map(r => r.getAs[String]("url") -> r).toMap
      val actual = parsed(s"$base/intensity")
      assert(actual.getAs[Long]("intensity") == 18342L,
        "actual wins over forecast")
      assert(actual.getAs[java.time.LocalDateTime]("window_start").getHour == 19)
      // 183.42 is inside the reference's 0..1000 intensity bounds
      assert(actual.getAs[Boolean]("intensity_valid"))
      val fallback = parsed(s"$base/forecast")
      assert(fallback.getAs[Long]("intensity") == 17500L,
        "null actual falls back to forecast (etl_job.py:106)")
    }
  }
}
