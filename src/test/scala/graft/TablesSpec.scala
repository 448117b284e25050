package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Era regression guard for the events loader (Tables.table).
  *
  * Round 5's costliest regression: an unconditional nanos→micros
  * rebuild raised DATATYPE_MISMATCH on TIMESTAMP(MICROS) data and
  * silently killed 20 queries. The loader now dispatches on the
  * arrived Spark type; this spec writes a tiny events fixture in each
  * era — ts as int64 nanos (how TIMESTAMP(NANOS) arrives under the
  * legacy nanosAsLong flag), TIMESTAMP(MICROS), and TIMESTAMP_NTZ —
  * and asserts all three normalize to the identical instants, so
  * dropping any era's rewrite goes red here, not in 20 opaque
  * downstream query failures.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two instants with sub-second precision, as epoch micros (UTC)
  private val micros = Seq(1704067200123456L, 1704070800987654L)

  private def loadEra(write: String => Unit): Seq[Long] = {
    val dir = Files.tempDir()
    write(s"$dir/events.parquet")
    val got = Tables.table(spark, dir, "events")
    assert(got.schema("ts").dataType === TimestampType,
      "every era must normalize ts to session-tz TIMESTAMP")
    got.select(unix_micros(col("ts")).as("um")).orderBy(col("um"))
      .collect().map(_.getLong(0)).toSeq
  }

  private object Files {
    def tempDir(): String =
      java.nio.file.Files.createTempDirectory("graft_events_era").toString
  }

  test("all three events ts eras load to identical instants") {
    // era 1: int64 nanos — what a TIMESTAMP(NANOS) file yields under
    // spark.sql.legacy.parquet.nanosAsLong (the loader sets the flag;
    // the reader's post-flag surface is a plain LongType column)
    val nanosEra = loadEra { path =>
      micros.map(_ * 1000L).toDF("ts").write.parquet(path)
    }
    // era 2: TIMESTAMP(MICROS), the modern era — read natively
    val microsEra = loadEra { path =>
      val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try micros.map(timestamp_micros_value).toDF("ts").write.parquet(path)
      finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    }
    // era 3: TIMESTAMP_NTZ — wall-clock micros, reinterpreted as UTC
    // instants (session tz is UTC in every entrypoint)
    val ntzEra = loadEra { path =>
      micros.map(m => java.time.LocalDateTime.ofEpochSecond(
        m / 1000000L, (m % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
        .toDF("ts").write.parquet(path)
    }
    assert(nanosEra === micros)
    assert(microsEra === micros)
    assert(ntzEra === micros)
  }

  test("an unknown ts era fails loudly at load time") {
    val dir = Files.tempDir()
    micros.map(_.toString).toDF("ts").write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.table(spark, dir, "events"))
    assert(e.getMessage.contains("events.ts arrived as"))
  }

  private def timestamp_micros_value(m: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(m / 1000L)
    t.setNanos((m % 1000000L).toInt * 1000)
    t
  }
}
