package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps._
import graft.operators.Frames
import graft.sources.{Sparql, Wikidata}

/** OpenCritic review-score pipeline (wd_opencritic.py), Spark-first.
  * The API index is an injected DataFrame (a published parquet in
  * production, a fixture in tests); SPARQL through the pluggable
  * fetch.
  */
object WdOpenCritic {

  final case class Sources(
      sparqlFetch: Sparql.Fetch,
      apiIndex: () => DataFrame,  // opencritic.parquet: id, top_critic_score, percent_recommended, num_reviews, latest_review_date, retrieved_at
      blockedQids: Seq[String])

  val NumReviewsThreshold = 10

  val QuerySchema: StructType = StructType(Seq(
    StructField("item", StringType),
    StructField("opencritic_id", LongType),
    StructField("statement", StringType),
    StructField("review_score", StringType),
    StructField("point_in_time", StringType),
    StructField("number_of_reviews", DoubleType)))

  def query(determinationMethodQid: String): String =
    s"""SELECT ?item ?opencritic_id ?statement
       |      ?review_score ?point_in_time ?number_of_reviews WHERE {
       |  ?item wdt:P2864 ?opencritic_id.
       |  FILTER(xsd:integer(?opencritic_id))
       |  OPTIONAL {
       |    ?item p:P444 ?statement.
       |    ?statement wikibase:rank ?rank.
       |    FILTER(?rank != wikibase:DeprecatedRank)
       |    ?statement ps:P444 ?review_score.
       |    ?statement pq:P447 wd:Q21039459.
       |    ?statement pq:P459 wd:$determinationMethodQid.
       |    OPTIONAL { ?statement pq:P585 ?point_in_time. }
       |    OPTIONAL { ?statement pq:P7887 ?number_of_reviews. }
       |  }
       |}""".stripMargin

  private val AddTemplate =
    """
      |<{}> p:P444 [
      |  ps:P444 "{}";
      |  pqe:P447 wd:Q21039459;
      |  pqe:P459 wd:{};
      |  pqe:P585 "{}"^^xsd:date;
      |  pqve:P7887 [
      |    rdf:type wikibase:QuantityValue;
      |    wikibase:quantityAmount "{}"^^xsd:decimal;
      |    wikibase:quantityUnit wd:Q80698083
      |  ];
      |  prov:wasOnlyDerivedFrom [
      |    pr:P248 wd:Q21039459;
      |    pr:P2864 "{}";
      |    pr:P813 "{}"^^xsd:date
      |  ];
      |  wikidatabots:editSummary "Add OpenCritic review score"
      |].
      |""".stripMargin

  private val UpdateTemplate =
    """
      |<{}>
      |  ps:P444 "{}";
      |  pqe:P447 wd:Q21039459;
      |  pqe:P459 wd:{};
      |  pqe:P585 "{}"^^xsd:date;
      |  pqve:P7887 [
      |    rdf:type wikibase:QuantityValue;
      |    wikibase:quantityAmount "{}"^^xsd:decimal;
      |    wikibase:quantityUnit wd:Q80698083
      |  ];
      |  prov:wasOnlyDerivedFrom [
      |    pr:P248 wd:Q21039459;
      |    pr:P2864 "{}";
      |    pr:P813 "{}"^^xsd:date
      |  ];
      |  wikidatabots:editSummary "Update OpenCritic review score".
      |""".stripMargin

  /** wd_opencritic.py:82-96: SPARQL rows, drop multi-statement items
    * (keep="none"), derive qid, typed casts, wd_ prefix.
    */
  def wdReviewScores(spark: SparkSession, determinationMethodQid: String,
                     src: Sources): DataFrame = {
    val df = Sparql.sparql(spark, query(determinationMethodQid), QuerySchema,
      fetch = src.sparqlFetch)
    Frames.prefixColumns(
      Frames.uniqueKeepNone(df, Seq("item"))
        .withColumn("qid", replaceFirst(col("item"), "http://www.wikidata.org/entity/", ""))
        .withColumn("number_of_reviews", col("number_of_reviews").cast(IntegerType))
        .withColumn("point_in_time", strptimeDate(col("point_in_time"))),
      "wd_")
  }

  private def rdfStatement(determinationMethodQid: String): Column =
    when(col("wd_statement").isNull,
      fmt(AddTemplate, col("wd_item"), col("api_review_score"),
        lit(determinationMethodQid), col("api_latest_review_date"),
        col("api_num_reviews"), col("wd_opencritic_id"), col("api_retrieved_on")))
      .otherwise(
        fmt(UpdateTemplate, col("wd_statement"), col("api_review_score"),
          lit(determinationMethodQid), col("api_latest_review_date"),
          col("api_num_reviews"), col("wd_opencritic_id"), col("api_retrieved_on")))
      .as("rdf_statement")

  /** Shared spine of both score pipelines (wd_opencritic.py:133-222):
    * join wd↔api on opencritic id, filter, derive the score string,
    * keep rows that are new or stale, format RDF.
    */
  private def scorePipeline(spark: SparkSession, src: Sources,
                            determinationMethodQid: String,
                            scoreCol: String, scoreFmt: String,
                            extraFilter: Column): DataFrame = {
    val wdDf = wdReviewScores(spark, determinationMethodQid, src)
    val apiDf = Frames.prefixColumns(src.apiIndex(), "api_")
    wdDf.join(broadcast(apiDf),
        wdDf("wd_opencritic_id") === apiDf("api_id"), "left")
      .drop("api_id")
      .filter(
        !Wikidata.isBlockedItem(col("wd_qid"), src.blockedQids) &&
          col(scoreCol).isNotNull &&
          col("api_latest_review_date").isNotNull &&
          col("api_retrieved_at").isNotNull &&
          extraFilter &&
          col("api_num_reviews") > 0)
      .withColumn("api_review_score",
        fmt(scoreFmt, round(col(scoreCol), 0).cast(IntegerType)))
      .withColumn("api_retrieved_on", to_date(col("api_retrieved_at")))
      .filter(
        col("wd_review_score").isNull ||
          col("wd_number_of_reviews").isNull ||
          col("wd_review_score") =!= col("api_review_score") ||
          col("wd_number_of_reviews") + NumReviewsThreshold < col("api_num_reviews"))
      .select(rdfStatement(determinationMethodQid))
  }

  /** wd_opencritic.py:133-171. */
  def findTopCriticScore(spark: SparkSession, src: Sources): DataFrame =
    scorePipeline(spark, src, "Q114712322", "api_top_critic_score", "{}/100",
      lit(true))

  /** wd_opencritic.py:174-213 (also requires percent > 0). */
  def findPercentRecommended(spark: SparkSession, src: Sources): DataFrame =
    scorePipeline(spark, src, "Q119576498", "api_percent_recommended", "{}%",
      col("api_percent_recommended") > 0)

  /** wd_opencritic.py:216-222. */
  def fullPipeline(spark: SparkSession, src: Sources): DataFrame =
    Frames.concatFrames(Seq(
      findTopCriticScore(spark, src),
      findPercentRecommended(spark, src)))
}
