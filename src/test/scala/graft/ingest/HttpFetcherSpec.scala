package graft.ingest

import graft.SparkSpec

class HttpFetcherSpec extends SparkSpec {

  // one shared server for the suite; stopped in afterAll
  private lazy val (server, base) = FixtureHttpServer.start()
  private val cfg = FetchConfig(connectTimeoutMs = 1000, readTimeoutMs = 400,
    maxBytes = 1 << 20)

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  test("fetches a complete 2xx body verbatim") {
    val (path, expected) = FixtureHttpServer.articles.head
    val got = HttpFetcher.fetch(base + path, cfg)
    assert(got.isDefined)
    assert(got.get.status == 200)
    assert(got.get.body == expected)
    assert(got.get.url == base + path)
  }

  test("404 drops to None") {
    assert(HttpFetcher.fetch(base + "/missing", cfg).isEmpty)
  }

  test("302 redirect is followed to the target body") {
    val got = HttpFetcher.fetch(base + "/moved", cfg)
    assert(got.isDefined)
    assert(got.get.body == FixtureHttpServer.articles.head._2)
  }

  test("read timeout drops to None (stalled server never hangs the task)") {
    val t0 = System.nanoTime()
    assert(HttpFetcher.fetch(base + "/slow", cfg).isEmpty)
    val ms = (System.nanoTime() - t0) / 1e6
    // bounded by the 400ms read timeout, not the server's 5s stall
    assert(ms < 3000, s"took ${ms}ms")
  }

  test("Content-Length truncation drops to None (never parsed as complete)") {
    assert(HttpFetcher.fetch(base + "/truncated", cfg).isEmpty)
  }

  test("oversized declared body drops to None before reading it") {
    assert(HttpFetcher.fetch(base + FixtureHttpServer.articles.head._1,
      cfg.copy(maxBytes = 10)).isEmpty)
  }

  test("malformed and unreachable URLs drop to None") {
    assert(HttpFetcher.fetch("not a url", cfg).isEmpty)
    assert(HttpFetcher.fetch("http://127.0.0.1:1/nope",
      cfg.copy(connectTimeoutMs = 300)).isEmpty)
  }

  test("fetchPages: distributed fetch keeps exactly the complete articles") {
    val urls = (FixtureHttpServer.articles.map(_._1) ++
      Seq("/missing", "/slow", "/truncated")).map(base + _)
    val rows = HttpFetcher.fetchPages(spark, urls, cfg, slices = 6)
      .collect().sortBy(_.url)
    assert(rows.length == FixtureHttpServer.articles.size)
    val bodies = rows.map(_.body).toSet
    assert(bodies == FixtureHttpServer.articles.map(_._2).toSet)
  }
}
