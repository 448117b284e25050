package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset-API aggregators (org.apache.spark.sql.expressions.
  * Aggregator): the Encoder-backed counterpart of the Catalyst
  * TypedImperativeAggregate path used by TopKRows — for callers
  * living in `Dataset[T]` land. Spark plans these with map-side
  * partial reduction like any declarative aggregate.
  */
object TypedAgg {

  final case class Weighted(value: Double, weight: Double)

  /** Weighted mean: sum(v*w)/sum(w); null-free domain, NaN on zero
    * total weight (the IEEE 0/0 — callers filter empty groups).
    */
  object WeightedMean extends Aggregator[Weighted, (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: Weighted): (Double, Double) =
      (b._1 + a.value * a.weight, b._2 + a.weight)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double = r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
