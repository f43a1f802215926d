package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAF (the official high-level custom-aggregate API;
  * TopKAggregate covers the lower-level TypedImperativeAggregate tier):
  * sum of squared integer cents. Deliberately integer-exact — each double
  * quantizes ONCE through floor(v·100), then all accumulation is Long
  * addition, so the result is independent of partitioning and engine
  * (the q161 oracle recomputes it bit-for-bit).
  */
object SumSqCents extends Aggregator[Double, Long, Long] {
  override def zero: Long = 0L
  override def reduce(acc: Long, v: Double): Long = {
    val c = math.floor(v * 100).toLong
    acc + c * c
  }
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
