package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a table once on its join key
  * so every subsequent join/aggregation on that key is co-located —
  * the zero-shuffle path for repeated big-to-big joins at 100 TB
  * (bucket counts sized so bucket ≈ one task's worth of data).
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`);
  * `bucketJoinReady` verifies the payoff — that a join of two
  * same-bucketed tables plans WITHOUT a shuffle Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Drops any prior
    * table AND its orphaned warehouse location first — a location
    * left behind by a previous session (table gone from the
    * in-memory catalog, directory still on disk) otherwise fails the
    * CREATE with LOCATION_ALREADY_EXISTS.
    */
  /** Drop a managed table AND its warehouse location — a location
    * left behind by a previous session (table gone from the in-memory
    * catalog, directory still on disk) otherwise fails the next
    * CREATE with LOCATION_ALREADY_EXISTS.
    */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    dropTableAndLocation(spark, table)
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. With equal bucket
    * counts Catalyst plans a SortMergeJoin whose children are already
    * correctly distributed — no Exchange.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True when the plan for joining the two tables contains no
    * shuffle Exchange (the co-location payoff; used by tests and as
    * a deployment sanity check).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
