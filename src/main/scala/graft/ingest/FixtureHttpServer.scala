package graft.ingest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback HTTP server serving the CNBC/Reddit-shaped article fixtures
  * (FIXTURES.md §A2/§A3) plus deliberate failure endpoints — real sockets,
  * zero egress. This is the test double for the reference's live scrape
  * targets (reference ai_powered_financial_analysis.py:10-29,99-122): the
  * fetch path exercises actual HTTP semantics (status codes, timeouts,
  * Content-Length truncation) instead of an in-process function fixture.
  *
  * Endpoints:
  *   /articles/<name>.json → 200, the fixture body
  *   /missing              → 404
  *   /slow                 → 200 after a 5 s stall (outlasts any sane read timeout)
  *   /truncated            → declares 4096 bytes, sends 16, closes
  */
object FixtureHttpServer {

  /** CNBC-shaped line-JSON article bodies (FIXTURES.md §A2), keyed by
    * served path. Deterministic bytes — the q174 oracle pins their parse.
    */
  val articles: Seq[(String, String)] = Seq(
    "/articles/cnbc-1.json" ->
      """{"url":"https://www.cnbc.com/2025/04/15/fed.html","title":"Fed holds rates steady","date":"2025-04-15 00:00:00","content":"The Federal Reserve held its benchmark rate steady, citing <b>cooling inflation</b> and a resilient labor market."}""",
    "/articles/cnbc-2.json" ->
      """{"url":"https://www.cnbc.com/2025/04/16/chips.html","title":"Chipmakers rally on AI demand","date":"2025-04-16 00:00:00","content":"Semiconductor stocks jumped as data-center orders topped $1,200 per accelerator; analysts raised targets."}""",
    "/articles/reddit-1.json" ->
      """{"url":"https://www.reddit.com/r/wallstreetbets/comments/abc123","title":"To all you excited boneheads","date":"2025-04-19 18:20:40","content":"Rates, chips, and YOLO calls: a thread. Upvotes: 1126, comments: 365."}""")

  /** Start on an ephemeral loopback port; returns (server, baseUrl).
    * Caller stops it with `server.stop(0)` once fetches are materialized.
    */
  def start(): (HttpServer, String) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, status: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(status, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    }
    articles.foreach { case (path, body) =>
      server.createContext(path, (ex: HttpExchange) =>
        reply(ex, 200, body.getBytes(StandardCharsets.UTF_8)))
    }
    server.createContext("/missing", (ex: HttpExchange) =>
      reply(ex, 404, "not here".getBytes(StandardCharsets.UTF_8)))
    // 302 to the first article — same-protocol redirects must be followed
    // (news URLs redirect constantly; a fetcher that drops them loses
    // live coverage, reference py:54-70 follows via requests/newspaper)
    server.createContext("/moved", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Location", articles.head._1)
      reply(ex, 302, Array.emptyByteArray)
    })
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(5000)
      reply(ex, 200, "finally".getBytes(StandardCharsets.UTF_8))
    })
    server.createContext("/truncated", (ex: HttpExchange) => {
      // lie about the length, send a fragment, close: the client must
      // treat the short read as a failed fetch, not a complete document
      ex.sendResponseHeaders(200, 4096)
      ex.getResponseBody.write("{\"title\":\"cut".getBytes(StandardCharsets.UTF_8))
      ex.close()
    })
    // handlers sleep (the /slow stall); a small pool keeps concurrent
    // fetches from serializing behind it. Daemon threads: server.stop
    // does not shut down a user-supplied executor, and a lingering
    // non-daemon pool would pin the whole JVM open after the query ends
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "fixture-http")
      t.setDaemon(true)
      t
    }))
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }
}
