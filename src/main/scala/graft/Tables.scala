package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader. Older `events` datasets store `ts` as Parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects — for
  * those, read nanos as long (legacy flag) and rebuild a microsecond
  * timestamp with integer division (never double division: 1.7e18 ns
  * exceeds 2^53 and would lose precision). Newer datasets store
  * TIMESTAMP(MICROS), which Spark reads natively: the rebuild is
  * conditional on the column actually arriving as LongType, and a
  * TIMESTAMP_NTZ column is normalized to session-timezone TIMESTAMP
  * so downstream unix_micros()/window arithmetic behaves identically
  * in both eras.
  */
object Tables {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType =>
          // session tz is UTC in all entrypoints; the cast reinterprets
          // the NTZ wall-clock as an instant in that zone.
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case TimestampType => raw
        // a NEW dataset era must surface here, loudly, at load time —
        // not as 20 opaque per-query failures downstream (round 5)
        case other => throw new IllegalStateException(
          s"events.ts arrived as $other; teach Tables.table this era explicitly")
      }
    } else s.read.parquet(s"$dir/$name.parquet")
}
