package graft.ingest

import java.net.{HttpURLConnection, URI}

import scala.util.control.NonFatal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Fetch policy: bounded timeouts and body size — at 1000 executors an
  * unbounded read timeout turns one dead server into a hung stage, and an
  * unbounded body turns one pathological URL into an executor OOM.
  */
final case class FetchConfig(
    connectTimeoutMs: Int = 2000,
    readTimeoutMs: Int = 5000,
    maxBytes: Long = 10L << 20,
    userAgent: String = "graft-fetch/1.0")

/** A successfully fetched page (2xx, complete body within bounds). */
final case class FetchedPage(url: String, status: Int, body: String)

/** Executor-side HTTP fetch — the real implementation behind the `Source`
  * fetch mechanism (SURVEY.md §2.1 O4). The reference fetches CNBC pages
  * with newspaper3k inside `parallelize(urls).map(...)` and maps every
  * failure to a dropped element (reference ai_powered_financial_analysis
  * .py:54-70); this mirrors that contract exactly: timeout, non-2xx,
  * truncated body, oversized body, malformed URL — all `None`, never an
  * exception escaping to fail the task. Pure JDK `HttpURLConnection`, so
  * the closure ships to executors with zero library baggage.
  */
object HttpFetcher {

  def fetch(url: String, cfg: FetchConfig = FetchConfig()): Option[FetchedPage] =
    try {
      val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestProperty("User-Agent", cfg.userAgent)
      conn.setInstanceFollowRedirects(true)
      try {
        val status = conn.getResponseCode
        if (status < 200 || status >= 300) None
        else {
          val declared = conn.getContentLengthLong
          if (declared > cfg.maxBytes) None
          else readBody(conn, cfg.maxBytes, declared).map(FetchedPage(url, status, _))
        }
      } finally conn.disconnect()
    } catch { case NonFatal(_) => None }

  /** Read the full body; None if it exceeds `maxBytes` or ends short of a
    * declared Content-Length (a truncated transfer parsed as a complete
    * document is silent data corruption — the one failure mode worse than
    * a dropped element).
    */
  private def readBody(conn: HttpURLConnection, maxBytes: Long,
      declared: Long): Option[String] = {
    val in = conn.getInputStream
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var total = 0L
      var over = false
      var n = in.read(chunk)
      while (n >= 0 && !over) {
        total += n
        if (total > maxBytes) over = true
        else { buf.write(chunk, 0, n); n = in.read(chunk) }
      }
      if (over) None
      else if (declared >= 0 && total != declared) None
      else Some(new String(buf.toByteArray, "UTF-8"))
    } finally in.close()
  }

  /** Distributed fetch: URLs parallelized across executors, each fetched
    * with [[fetch]], failures dropped — `Sources.fetched` with the real
    * network behind it. `slices` bounds concurrent connections per the
    * whole job (at scale: requests-per-second politeness × executors).
    */
  def fetchPages(spark: SparkSession, urls: Seq[String],
      cfg: FetchConfig = FetchConfig(), slices: Int = 8): Dataset[FetchedPage] = {
    import spark.implicits._
    Sources.fetched(spark, urls, (u: String) => fetch(u, cfg), slices)
  }
}
