package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory

/** SPARQL endpoint → DataFrame source (sparql.py:21-90).
  *
  * The reference sends exactly one query per frame, driver-side, and
  * parses the CSV reply against a declared schema; the Spark
  * translation fetches on the driver at call time and parses with the
  * distributed CSV reader over a one-element Dataset[String] per
  * line. Retry: exponential backoff, <=30 tries, interval capped at
  * 120s; WDQS embedded-timeout bodies are treated as timeouts and
  * retried; slow queries are logged (>5s) or warned (>45s).
  */
object Sparql {

  /** query → raw CSV bytes; pluggable so tests use canned fixtures. */
  type Fetch = String => Array[Byte]

  final case class Config(
      endpoint: String = "https://query.wikidata.org/sparql",
      userAgent: String = s"GraftBot/1.0 Scala/${util.Properties.versionNumberString}",
      maxTries: Int = 30,
      maxIntervalSec: Int = 120,
      connectTimeoutMs: Int = 1000,
      readTimeoutMs: Int = 90000,
      slowLogSec: Double = 5.0,
      slowWarnSec: Double = 45.0)

  private val log = LoggerFactory.getLogger(getClass)

  /** Driver-side POST with the reference's retry envelope. */
  def httpFetch(cfg: Config = Config()): Fetch = { query =>
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(cfg.connectTimeoutMs))
      .build()
    var attempt = 0
    var out: Array[Byte] = null
    while (out == null) {
      attempt += 1
      val t0 = System.nanoTime()
      try {
        val body = "query=" + java.net.URLEncoder.encode(query, "UTF-8")
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(cfg.endpoint))
          .timeout(java.time.Duration.ofMillis(cfg.readTimeoutMs))
          .header("Accept", "text/csv")
          .header("User-Agent", cfg.userAgent)
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val r = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        val text = new String(r.body(), java.nio.charset.StandardCharsets.UTF_8)
        // WDQS quirk: timeouts surface as 200s with an embedded Java
        // exception in the body (sparql.py:39-40)
        if (text.contains("java.util.concurrent.TimeoutException"))
          throw new java.io.IOException("embedded TimeoutException")
        if (r.statusCode() >= 400)
          throw new java.io.IOException(s"HTTP ${r.statusCode()}")
        val duration = (System.nanoTime() - t0) / 1e9
        if (duration > cfg.slowWarnSec)
          log.warn(f"::warning title=SlowQueryWarning::sparql: $duration%,.2fs")
        else if (duration > cfg.slowLogSec) log.info(f"sparql: $duration%,.2fs")
        out = r.body()
      } catch {
        case e: Exception if attempt < cfg.maxTries =>
          val backoffSec = math.min(1L << math.min(attempt - 1, 20), cfg.maxIntervalSec.toLong)
          log.info(s"sparql retry ${e.getMessage}; sleeping ${backoffSec}s")
          Thread.sleep(backoffSec * 1000)
        case e: Exception => throw e
      }
    }
    out
  }

  /** Declared-schema SPARQL source. Columns-only form defaults every
    * column to string (sparql.py:74-75). Header names are asserted
    * against the schema (the reference maps by name).
    */
  def sparql(spark: SparkSession, query: String,
             schema: StructType = null, columns: Seq[String] = Nil,
             fetch: Fetch): DataFrame = {
    val st =
      if (schema != null) schema
      else {
        require(columns.nonEmpty, "missing schema")
        StructType(columns.map(c => StructField(c, StringType)))
      }
    val csv = new String(fetch(query), java.nio.charset.StandardCharsets.UTF_8)
    val lines = csv.split("\r?\n", -1).toSeq.filter(_.nonEmpty)
    require(lines.nonEmpty, "empty SPARQL response")
    val header = lines.head.split(",").map(_.trim).toSeq
    require(header == st.fields.map(_.name).toSeq,
      s"SPARQL csv header $header does not match declared schema ${st.fieldNames.toSeq}")
    import spark.implicits._
    spark.read.schema(st).option("header", "true").option("mode", "FAILFAST")
      .csv(spark.createDataset(lines))
  }
}
