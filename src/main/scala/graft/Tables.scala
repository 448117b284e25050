package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader. The `events` table stores `ts` as Parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects —
  * read nanos as long (legacy flag) and rebuild a microsecond
  * timestamp with integer division (never double division: 1.7e18 ns
  * exceeds 2^53 and would lose precision).
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else s.read.parquet(s"$dir/$name.parquet")
}
