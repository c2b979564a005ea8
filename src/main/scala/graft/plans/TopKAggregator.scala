package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into a top-k aggregation. */
final case class ScoredId(id: Long, score: Double)

/** Typed bounded-heap top-k aggregator: keeps the k best (score desc, id
  * asc as tie-break) candidates per group in a fixed-size buffer.
  *
  * Why an Aggregator instead of `row_number().over(window)`: aggregation
  * gets partial (map-side) combine for free, so each map task ships at
  * most k rows per group to the exchange — the shuffle is
  * O(k × groups × tasks), independent of how many candidates were scored.
  * A window operator must route rows through a per-group sort first. Spark
  * 4's `WindowGroupLimit` narrows the gap with map-side pruning, but the
  * aggregator also removes the sort entirely: the output array is the
  * already-ordered heap content.
  *
  * The buffer is a plain sorted Seq (k is small — ANN top-k, not a
  * percentile sketch); reduce does an insertion into a bounded list,
  * merge a bounded merge-sort step.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  /** Total order matching Spark's DoubleType sort (nanSafeCompareDoubles):
    * NaN sorts above every value, and -0.0 TIES with 0.0 (primitive `==`,
    * unlike raw Double.compare which ranks 0.0 above -0.0 and would let
    * the aggregator and the window top-k disagree at the k boundary);
    * score ties break by ascending id. */
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c =
      if (a.score == b.score) 0 // -0.0 == 0.0: tie, like Spark's sort
      else java.lang.Double.compare(a.score, b.score) // NaN handled: both-NaN -> 0
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    if (buf.size == k && !better(x, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front :+ x) ++ back.take(k - front.size - 1)
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    val out = Vector.newBuilder[ScoredId]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
}

object TopKAggregator {
  /** Column form: `topK(k)(idCol, scoreCol)` — the product input encoder
    * takes the ScoredId fields as separate argument columns. */
  def topK(k: Int): (Column, Column) => Column = { (id, score) =>
    udaf(new TopKAggregator(k), Encoders.product[ScoredId]).apply(id, score)
  }
}
