package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Typed UDAF (X3): exact order-independent mean of a double column via a
  * decimal accumulator — the Aggregator form of Engine.davg, demonstrating
  * the custom-aggregate surface. reduce/merge are associative+commutative on
  * exact decimals, so the result is identical under any partitioning; finish
  * divides in double exactly like `CAST(SUM(DECIMAL) AS DOUBLE) / COUNT`.
  */
object ExactMean extends Aggregator[Double, (JBigDecimal, Long), Double] {

  override def zero: (JBigDecimal, Long) = (JBigDecimal.ZERO, 0L)

  // valueOf (Double.toString semantics) matches Spark's CAST(double AS
  // DECIMAL) exactly; `new JBigDecimal(double)` would take the exact binary
  // expansion, which rounds differently at half-way values like x.0000005.
  override def reduce(b: (JBigDecimal, Long), a: Double): (JBigDecimal, Long) =
    (b._1.add(JBigDecimal.valueOf(a).setScale(6, RoundingMode.HALF_UP)), b._2 + 1)

  override def merge(x: (JBigDecimal, Long), y: (JBigDecimal, Long)): (JBigDecimal, Long) =
    (x._1.add(y._1), x._2 + y._2)

  override def finish(r: (JBigDecimal, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.doubleValue() / r._2

  override def bufferEncoder: Encoder[(JBigDecimal, Long)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
