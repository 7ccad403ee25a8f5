package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed Spark `Aggregator` —
  * the engine's custom-UDAF surface (`Aggregator[IN, BUF, OUT]`
  * registered through `functions.udaf`), complementing the built-in
  * sketch family (HLL distinct counts, Greenwald-Khanna quantiles)
  * with frequent-item estimation.
  *
  * Algorithm (Misra-Gries '82, mergeable form per Agarwal et al.,
  * "Mergeable Summaries", PODS '12): k counters; a seen counter
  * increments, an unseen item claims a free counter, and when all k
  * are busy every counter decrements instead (the arriving item is
  * absorbed). Merge sums counter maps, then subtracts the (k+1)-th
  * largest count and drops non-positives — the summary stays ≤ k
  * entries under any merge tree.
  *
  * Guarantees (what Verify's invariant asserts): counts never
  * overestimate, underestimate by at most n/(k+1) (n = stream
  * length), and any item with true frequency > n/(k+1) is present in
  * the summary. WHICH sub-threshold items survive depends on
  * partition/merge order, so a query using this is declared
  * rows-only: the dump is reproducible in its guarantees, not its
  * exact survivor set (same exemption class as the GK quantile
  * sketch).
  *
  * Buffer is a plain Map[String, Long] (≤ k entries): `udaf` wraps
  * this as a TypedImperativeAggregate, so the map lives as a JVM
  * object during partial aggregation and serializes only at the
  * exchange — per-row cost is one hash probe, plus an O(k) decrement
  * sweep only when all counters are busy.
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"need at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c)            => b.updated(item, c + 1L)
      case None if b.size < k => b.updated(item, 1L)
      case None => // all counters busy: decrement-all, absorb the item
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count, drop non-positives
      val t = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.flatMap { case (tok, c) => if (c > t) Some(tok -> (c - t)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
