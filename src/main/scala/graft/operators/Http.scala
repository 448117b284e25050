package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory

import graft.functions.ColumnOps.fmt

/** The reference engine's signature design: HTTP modeled as columnar
  * expressions over nested struct columns (polars_requests.py:49-66,
  * 90-194, 224-248). A request is a Struct{url, headers} column, a
  * response a Struct{status, headers, data} column, and "call the
  * API" is a frame transform.
  *
  * Spark-first translation:
  *  - `prepareRequest`/`responseText` stay pure Column expressions.
  *  - `request` is a `mapPartitions` transform — the direct analog of
  *    the reference's `map_batches` boundary: per-partition client
  *    session, strictly sequential within a partition, per-request
  *    rate floor, retry with exponential backoff, status
  *    classification. mapPartitions is also an analysis barrier, so
  *    Catalyst can never push a filter past the side-effecting HTTP
  *    call or duplicate it across projections (SURVEY.md §4.1).
  *  - Aggregate request rate = partitions × sequential rate; the
  *    `parallelism` knob repartitions (parallelism=1 reproduces the
  *    reference's single sequential loop exactly — SURVEY.md §3.3).
  */
object Http {

  val HeaderType: StructType = StructType(Seq(
    StructField("name", StringType), StructField("value", StringType)))
  val RequestType: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("headers", ArrayType(HeaderType))))
  val ResponseType: StructType = StructType(Seq(
    StructField("status", IntegerType),
    StructField("headers", ArrayType(HeaderType)),
    StructField("data", BinaryType)))

  /** Client-visible response of one HTTP exchange. */
  final case class Exchange(status: Int, headers: Seq[(String, String)], data: Array[Byte])

  /** Pluggable transport so tests run against a local stub and
    * production uses the JDK client. GETs only, redirects NOT
    * followed (polars_requests.py:119 allow_redirects=False).
    */
  trait Transport extends Serializable {
    def get(url: String, headers: Seq[(String, String)], timeoutMs: Int): Exchange
  }

  /** java.net.http-based transport; one client per executor (lazy,
    * transient — never serialized).
    */
  object JdkTransport extends Transport {
    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
        .build()
    override def get(url: String, headers: Seq[(String, String)], timeoutMs: Int): Exchange = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs)).GET()
      headers.foreach { case (n, v) => b.header(n, v) }
      val r = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      val hs = r.headers().map().entrySet().iterator()
      val out = Seq.newBuilder[(String, String)]
      while (hs.hasNext) {
        val e = hs.next()
        e.getValue.forEach(v => out += ((e.getKey, v)))
      }
      Exchange(r.statusCode(), out.result(), r.body())
    }
  }

  /** Retry/pacing policy (polars_requests.py:173-194 defaults). */
  final case class Options(
      logGroup: String = "http",
      timeoutMs: Int = 10000,
      minTimeMs: Long = 0L,
      okStatuses: Set[Int] = Set(200),
      badStatuses: Set[Int] = Set.empty,
      retryCount: Int = 0,
      maxBatchSize: Long = 50000L,
      maxRetrySleepMs: Long = 300000L) {
    require(retryCount <= 12, "Too many retries")  // polars_requests.py:78
  }

  private def headerStruct(name: String, value: Column): Column =
    struct(lit(name).as("name"), value.cast(StringType).as("value"))

  /** headers dict as array<struct{name,value}>; empty -> null list
    * (polars_requests.py:208-212).
    */
  def httpDict(pairs: Seq[(String, Column)]): Column =
    if (pairs.isEmpty) lit(null).cast(ArrayType(HeaderType))
    else array(pairs.map { case (n, v) => headerStruct(n, v) }: _*)

  /** Build a request struct column; query string via null-propagating
    * format — a null url or field nulls the whole request, which
    * `request` then skips (polars_requests.py:224-244).
    */
  def prepareRequest(url: Column,
                     fields: Seq[(String, Column)] = Nil,
                     headers: Seq[(String, Column)] = Nil): Column = {
    val u =
      if (fields.isEmpty) url
      else fmt("{}?" + fields.map(_._1 + "={}").mkString("&"),
        (url +: fields.map(_._2)): _*)
    struct(u.as("url"), httpDict(headers).as("headers")).as("request")
  }

  /** response data as UTF-8 text (polars_requests.py:247-248). */
  def responseText(response: Column): Column =
    response.getField("data").cast(StringType).as("response_text")

  def responseStatus(response: Column): Column = response.getField("status")

  /** Execute the requests in `requestCol`, appending `responseCol`.
    *
    * Per-partition semantics mirror the reference's per-batch
    * semantics (polars_requests.py:90-170): one transport session,
    * sequential ordered loop, per-request `minTime` floor (sleep the
    * remainder), exponential-backoff retry on bad/unknown statuses
    * and transport errors, warning when a retried request's status
    * changes, hard cap on requests per partition. Null/empty URL →
    * null response, no network call.
    */
  def request(df: DataFrame, requestCol: String, opts: Options,
              transport: Transport = JdkTransport,
              responseCol: String = "response",
              parallelism: Option[Int] = None): DataFrame = {
    val in = parallelism.fold(df)(n => df.repartition(n))
    val schema = in.schema
    val reqIdx = schema.fieldIndex(requestCol)
    val outSchema = schema.add(StructField(responseCol, ResponseType))
    val o = opts
    in.mapPartitions { rows =>
      val log = LoggerFactory.getLogger("graft.http")
      log.info(s"::group::${o.logGroup}")
      var count = 0L
      rows.map { row =>
        count += 1
        require(count < o.maxBatchSize, s"Too many requests: $count")
        val req = if (row.isNullAt(reqIdx)) null else row.getStruct(reqIdx)
        val url = if (req == null || req.isNullAt(0)) null else req.getString(0)
        val resp: Row =
          if (url == null || url.isEmpty) null
          else {
            val headers: Seq[(String, String)] =
              if (req.isNullAt(1)) Nil
              else req.getSeq[Row](1).map(h => (h.getString(0), h.getString(1)))
            var attempt = 0
            var previousStatus: Option[Int] = None
            var result: Exchange = null
            var done = false
            while (!done) {
              attempt += 1
              val t0 = System.nanoTime()
              try {
                val ex = transport.get(url, headers, o.timeoutMs)
                previousStatus.filter(_ != ex.status).foreach { p =>
                  if (!o.badStatuses.contains(p))
                    log.warn(s"::warning title=StatusCodeWarning::Retried $p -> ${ex.status}")
                }
                previousStatus = Some(ex.status)
                val elapsedMs = (System.nanoTime() - t0) / 1000000L
                val sleepMs = o.minTimeMs - elapsedMs
                if (sleepMs > 0) Thread.sleep(sleepMs)
                if (o.okStatuses.contains(ex.status)) {
                  result = ex; done = true
                } else {
                  if (!o.badStatuses.contains(ex.status))
                    log.warn(s"::warning title=StatusCodeWarning::Unknown status code: ${ex.status}")
                  throw new java.io.IOException(s"HTTP ${ex.status} for $url")
                }
              } catch {
                case e: Exception if attempt < math.max(1, o.retryCount) =>
                  val backoffMs = math.min(1000L * (1L << math.min(attempt - 1, 20)),
                    o.maxRetrySleepMs)
                  log.info(s"retrying (${e.getMessage}) in ${backoffMs}ms")
                  Thread.sleep(backoffMs)
                case e: Exception => throw e
              }
            }
            Row(result.status,
              result.headers.map { case (n, v) => Row(n, v) },
              result.data)
          }
        Row.fromSeq(row.toSeq :+ resp)
      }
    }(Encoders.row(outSchema))
  }
}
