package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers the native expressions for SQL") {
    // fresh session with extensions on the shared context
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val cos = spark.sql(
        "SELECT cosine_similarity(array(1.0f, 2.0f), array(1.0f, 2.0f)) AS c")
        .head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)

      val sh = spark.sql(
        "SELECT simhash(array('a','b','c')) AS s, simhash(array('a','b','c')) AS s2")
        .head()
      assert(sh.getLong(0) === sh.getLong(1))

      val mh = spark.sql(
        "SELECT size(minhash_signature(array(1L, 2L, 3L), 16, 42L)) AS n")
        .head().getInt(0)
      assert(mh === 16)
    } finally spark.stop()
  }
}
