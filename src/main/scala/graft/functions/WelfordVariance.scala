package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the `Aggregator`/UDAF surface): streaming
  * variance via Welford/Chan parallel moments — count, mean, M2 —
  * merged pairwise across partitions. This is the accumulator shape the
  * flow featurizer uses for its packet-length moments, exposed as a
  * reusable SQL-registrable aggregate.
  *
  * Numerical contract: the result is the textbook single-pass variance,
  * but MERGE ORDER affects the low bits (fp addition is non-associative
  * and partition merge order is scheduler-dependent) — so oracle-gated
  * uses must compare against an exact formulation through a tolerance,
  * never by hash (see q_welford_variance). That is inherent to every
  * distributed one-pass variance, not an implementation choice; the
  * exact-integer route (cents sums + sum of squared cents) exists for
  * when bit-determinism matters more than single-pass cost.
  */
object WelfordVariance {

  /** (count, mean, M2) — M2 = Σ(x−mean)². */
  final case class Moments(n: Long, mean: Double, m2: Double)

  val aggregator: Aggregator[Double, Moments, Double] =
    new Aggregator[Double, Moments, Double] {
      def zero: Moments = Moments(0L, 0.0, 0.0)

      def reduce(b: Moments, x: Double): Moments = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        Moments(n, mean, b.m2 + d * (x - mean))
      }

      // Chan et al. pairwise merge: exact for the moments it carries
      def merge(a: Moments, b: Moments): Moments =
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          Moments(n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
        }

      // population variance; NaN for empty input surfaces misuse
      def finish(r: Moments): Double =
        if (r.n == 0) Double.NaN else r.m2 / r.n

      def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Register as `welford_var(col)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("welford_var",
      org.apache.spark.sql.functions.udaf(aggregator))
}
