package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.config.LoaderConfig
import graft.loader.Loader
import graft.sources.RestSource
import graft.sources.RestSource.RestConfig
import graft.table.{GraftCatalog, TableIdent}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** REST source (S6) against a loopback HTTP server: list/non-list/error
  * response semantics from `examples/rest_adapter.py:9-35`, pagination,
  * and the end-to-end REST → loader → table round trip.
  */
class RestSourceSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def withServer(routes: Map[String, HttpExchange => (Int, String)])(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => {
        val (code, payload) = handler(ex)
        val bytes = payload.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("list response yields one batch of records, field order preserved") {
    withServer(Map("/items" -> (_ =>
        (200, """[{"id":1,"name":"a"},{"id":2,"name":"b","extra":true}]""")))) { base =>
      val batches = RestSource.getData(s"$base/items").toSeq
      batches.size shouldBe 1
      val recs = batches.head
      recs.size shouldBe 2
      recs.head shouldBe Seq("id" -> 1L, "name" -> "a")
      recs(1) shouldBe Seq("id" -> 2L, "name" -> "b", "extra" -> true)
    }
  }

  test("non-list response is wrapped in a single-record batch") {
    withServer(Map("/one" -> (_ => (200, """{"id":9,"nested":{"a":1}}""")))) { base =>
      val recs = RestSource.getData(s"$base/one").toSeq.head
      recs.size shouldBe 1
      recs.head.head shouldBe ("id" -> 9L)
      // nested dict stays a Map for JsonIngest to JSON-stringify (S4)
      recs.head(1)._2 shouldBe a[Map[_, _]]
    }
  }

  test("non-2xx raises, like raise_for_status") {
    // 4xx: client error, never retried — raises on the first attempt
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/bad" -> (_ => { calls.incrementAndGet(); (404, """{"err":"no"}""") }))) { base =>
      val ex = intercept[java.io.IOException] {
        RestSource.getData(s"$base/bad").toSeq
      }
      ex.getMessage should include("HTTP 404")
      calls.get() shouldBe 1
    }
  }

  test("5xx exhausting retries raises the transient failure") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/down" -> (_ => { calls.incrementAndGet(); (503, """{"err":"unavail"}""") }))) { base =>
      val ex = intercept[java.io.IOException] {
        RestSource.getData(s"$base/down",
          RestConfig(maxRetries = 2, retryBackoffMs = 5)).toSeq
      }
      ex.getMessage should include("HTTP 503")
      calls.get() shouldBe 3 // initial + 2 retries
    }
  }

  test("flaky endpoint: fail-then-succeed ingests exactly once, auth header sent") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val auths = new java.util.concurrent.atomic.AtomicReference[String]("")
    withServer(Map("/flaky" -> (ex => {
      auths.set(ex.getRequestHeaders.getFirst("Authorization"))
      if (calls.incrementAndGet() <= 2) (500, """{"err":"boom"}""")
      else (200, """[{"id":1,"name":"ada"},{"id":2,"name":"bob"}]""")
    }))) { base =>
      val cat = GraftCatalog(spark, Files.createTempDirectory("graft-flaky").toString)
      val res = new Loader(cat).loadRest(s"$base/flaky", TableIdent("ns", "flaky"),
        rest = RestConfig(maxRetries = 3, retryBackoffMs = 5,
          bearerToken = Some("sekret")))
      res.rowsLoaded shouldBe 2
      calls.get() shouldBe 3 // two failures + one success, no re-fetch after success
      auths.get() shouldBe "Bearer sekret"
      cat.load(TableIdent("ns", "flaky")).scan().count() shouldBe 2 // exactly once
    }
  }

  test("pagination fetches pages lazily until an empty batch") {
    val pagesServed = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/paged" -> (ex => {
      pagesServed.incrementAndGet()
      val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
      val payload = page match {
        case 1 => """[{"id":1},{"id":2}]"""
        case 2 => """[{"id":3}]"""
        case _ => "[]"
      }
      (200, payload)
    }))) { base =>
      val it = RestSource.getData(s"$base/paged",
        RestConfig(pageParam = Some("page")))
      pagesServed.get() shouldBe 0 // nothing fetched before consumption
      val batches = it.toSeq
      batches.map(_.size) shouldBe Seq(2, 1)
      pagesServed.get() shouldBe 3 // stops at the first empty page
    }
  }

  test("end-to-end: REST endpoint -> loader -> graft table") {
    withServer(Map("/users" -> (_ =>
        (200,
          """[{"id":1,"name":"ada","score":9.5},
             |{"id":2,"name":"bob","score":7.0},
             |{"id":3,"name":"cyd"}]""".stripMargin.replace("\n", ""))))) { base =>
      val cat = GraftCatalog(spark, Files.createTempDirectory("graft-rest").toString)
      val res = new Loader(cat).loadRest(s"$base/users", TableIdent("ns", "users"))
      res.rowsLoaded shouldBe 3
      res.batchesProcessed shouldBe 1
      val rows = cat.load(TableIdent("ns", "users")).scan()
        .orderBy("id").collect()
      rows.map(_.getAs[Long]("id")).toSeq shouldBe Seq(1L, 2L, 3L)
      rows.map(_.getAs[String]("name")).toSeq shouldBe Seq("ada", "bob", "cyd")
      rows(2).isNullAt(rows(2).fieldIndex("score")) shouldBe true // missing key -> null
    }
  }
}
