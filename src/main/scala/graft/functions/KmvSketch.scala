package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator
  * (X3 "custom sketch" surface; Bar-Yossef et al. 2002, "Counting distinct
  * elements in a data stream").
  *
  * State: the k smallest DISTINCT 60-bit hashes seen, kept sorted.
  * Estimator: if fewer than k distinct hashes exist the count is exact;
  * otherwise distinct ~= (k-1) * 2^60 / kthMin (hashes uniform on
  * [0, 2^60)).
  *
  * Design property that HLL lacks: the state is a deterministic function
  * of the input SET — insert and merge are idempotent and commutative, so
  * any partitioning, AQE re-plan, or merge order yields the same sketch,
  * and a SQL engine can replay the estimate bit-for-bit (the DuckDB
  * oracle for q97 does). Buffer is O(k); map-side partial aggregation
  * collapses each partition to one sketch before the shuffle.
  */
object KmvSketch extends Aggregator[Long, Seq[Long], Double] {

  val k = 64

  override def zero: Seq[Long] = Vector.empty

  private def insert(b: Seq[Long], h: Long): Seq[Long] =
    if (b.contains(h) || (b.size == k && h >= b.last)) b
    else {
      val nb = (b :+ h).sorted
      if (nb.size > k) nb.take(k) else nb
    }

  override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    y.foldLeft(x)(insert)

  override def finish(b: Seq[Long]): Double =
    if (b.size < k) b.size.toDouble
    else (k - 1).toDouble * math.pow(2.0, 60) / b.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
