package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One surviving heavy-hitter candidate with its estimated count. */
final case class ItemCount(item: String, est: Long)

/** Misra-Gries heavy-hitters summary as a MERGEABLE typed aggregator
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012) — frequency estimation over unbounded-cardinality
  * streams in a FIXED buffer of `capacity` counters.
  *
  * Guarantee: for every item x with true count f(x) over N rows,
  * `est(x) <= f(x) <= est(x) + N/(capacity+1)` — items with
  * f(x) > N/(capacity+1) are ALWAYS in the summary. So `capacity = 1/s - 1`
  * finds every item above support s, with bounded under-count.
  *
  * Exactness mode: if `capacity >= |distinct items|`, no counter is ever
  * evicted on ANY path (map-side buffers never overflow, merges never
  * exceed capacity), so estimates equal exact counts and the result is
  * input-order-INDEPENDENT — that is the oracle-checkable configuration
  * (q_heavy_hitters). Below capacity the estimates are order-dependent
  * within the guarantee band (standard MG behavior); GroundTruthSpec pins
  * the band on a real over-capacity workload.
  *
  * Why an Aggregator, not `groupBy(item).count()`: the exact plan's
  * shuffle carries one record per DISTINCT item per map task — at
  * trillions of distinct tokens that is the whole dictionary through the
  * exchange. The MG summary ships at most `capacity` counters per task
  * regardless of cardinality: the shuffle is bounded by configuration,
  * not data. (Same partial-combine argument as [[TopKAggregator]].)
  *
  * The per-row buffer is an immutable Map (effectively-constant updates);
  * eviction cost O(capacity) amortizes to O(1) per row because an
  * eviction removes >= 1 of the <= capacity counters paid for by >= 1
  * prior insertions. */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[ItemCount]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] = {
    val cur = m.getOrElse(x, 0L)
    if (cur > 0L) m.updated(x, cur + 1L)
    else if (m.size < capacity) m.updated(x, 1L)
    // full and x absent: decrement ALL counters (x's implicit 1 included,
    // so x itself is not inserted), dropping the zeros
    else m.iterator.map { case (k, v) => (k, v - 1L) }.filter(_._2 > 0L).toMap
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s = b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    if (s.size <= capacity) s
    else {
      // Agarwal et al.: subtract the (capacity+1)-th largest count from
      // every counter and drop the non-positives — deterministic given the
      // merged count multiset, error adds across merges within N/(cap+1)
      val sub = s.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      s.iterator.map { case (k, v) => (k, v - sub) }.filter(_._2 > 0L).toMap
    }
  }

  /** Survivors sorted by (est desc, item asc) — a deterministic order for
    * any downstream explode. */
  override def finish(m: Map[String, Long]): Seq[ItemCount] =
    m.iterator.map { case (k, v) => ItemCount(k, v) }
      .toVector.sortBy(ic => (-ic.est, ic.item))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[ItemCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ItemCount]]()
}

object MisraGriesAggregator {
  /** Column form: `misraGries(capacity)(itemCol)` — a struct array of
    * (item, est) survivors, `explode`-ready. */
  def misraGries(capacity: Int): Column => Column = { item =>
    udaf(new MisraGriesAggregator(capacity), Encoders.STRING).apply(item)
  }

  /** Column form of [[MisraGriesMergeAggregator]]:
    * `misraGriesMerge(capacity)(itemCol, estCol)`. */
  def misraGriesMerge(capacity: Int): (Column, Column) => Column = { (item, est) =>
    udaf(new MisraGriesMergeAggregator(capacity), Encoders.product[ItemCount])
      .apply(item, est)
  }
}

/** Weighted RE-aggregation of already-summarized (item, est) counter rows
  * — the merge half of Misra-Gries exposed as its own aggregator, so
  * PERSISTED summaries compose: fold yesterday's state rows with today's
  * batch summary and get exactly what [[MisraGriesAggregator.merge]]
  * would have produced (each input row is the singleton summary
  * {item: est}; adding it and evicting by the (capacity+1)-th largest IS
  * the Agarwal et al. merge, so associativity and the error bound carry
  * over unchanged). This is what incremental/streaming maintenance needs
  * (EventsStream.maintainHeavyHitters): raw rows are seen once, ever;
  * state merges cost O(counters), not O(history). */
class MisraGriesMergeAggregator(capacity: Int)
    extends Aggregator[ItemCount, Map[String, Long], Seq[ItemCount]] {
  require(capacity > 0, "capacity must be positive")

  private def addWeighted(m: Map[String, Long], item: String, w: Long): Map[String, Long] = {
    val s = m.updated(item, m.getOrElse(item, 0L) + w)
    if (s.size <= capacity) s
    else {
      val sub = s.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      s.iterator.map { case (k, v) => (k, v - sub) }.filter(_._2 > 0L).toMap
    }
  }

  override def zero: Map[String, Long] = Map.empty
  override def reduce(m: Map[String, Long], x: ItemCount): Map[String, Long] =
    addWeighted(m, x.item, x.est)
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, v)) => addWeighted(acc, k, v) }
  override def finish(m: Map[String, Long]): Seq[ItemCount] =
    m.iterator.map { case (k, v) => ItemCount(k, v) }
      .toVector.sortBy(ic => (-ic.est, ic.item))
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[ItemCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ItemCount]]()
}
