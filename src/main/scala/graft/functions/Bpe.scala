package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets

/** Byte-level Byte-Pair Encoding (Sennrich et al. 2016, the public
  * subword-nmt algorithm): train a merge list on a corpus sample, then
  * count merge-rank tokens per document — the tokenizer-faithful budget a
  * curation pipeline trims and packs against, instead of whitespace/regex
  * token proxies.
  *
  * Determinism contract (what makes the oracle replay bit-for-bit):
  *
  *  - symbols are the UPPERCASE 2-hex-char renderings of UTF-8 bytes and
  *    their merge concatenations; ties in pair counts break on the
  *    lexicographic hex-string pair, identical in any engine (ASCII);
  *  - each merge is applied as ONE left-to-right non-overlapping pass, in
  *    rank order (the original subword-nmt "for merge in merges: apply
  *    everywhere" semantics). On a separator-wrapped rendering
  *    `,A,,B,,C,` that is EXACTLY SQL `replace(s, ',A,,B,', ',AB,')` —
  *    matches cannot span partial symbols (every symbol carries its own
  *    delimiters) and adjacent occurrences keep their delimiters — so a
  *    SQL engine replays training AND tokenization with `replace` alone;
  *  - pair counting counts every adjacent position (overlapping pairs in
  *    `AAA` count twice), the subword-nmt convention.
  *
  * Scale: training runs on a BOUNDED sample (the caller collects it —
  * sample-based vocab training is how production tokenizers are built;
  * the sample size is a constant, not a corpus fraction), then
  * [[BpeTokenCount]] applies the learned table distributedly in one tight
  * int-array loop per row — no strings, no allocation beyond one array
  * per row, `O(merges × bytes)` with tiny constants.
  */
object Bpe {

  private val HexNames: IndexedSeq[String] = (0 until 256).map(b => f"$b%02X")

  /** Train `numMerges` BPE merges on the sample (empty strings ignored).
    * Returns hex-symbol pairs in rank order; fewer when the sample runs
    * out of adjacent pairs. */
  def train(sample: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    names ++= HexNames
    var seqs: Array[Array[Int]] = sample.iterator
      .filter(s => s != null && s.nonEmpty)
      .map(_.getBytes(StandardCharsets.UTF_8).map(_ & 0xff))
      .toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
      seqs.foreach { s =>
        var i = 0
        while (i < s.length - 1) {
          val key = java.lang.Long.valueOf((s(i).toLong << 32) | s(i + 1).toLong)
          counts.computeIfAbsent(key, _ => Array(0L))(0) += 1L
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // argmax by (count DESC, nameA ASC, nameB ASC) — the exact ORDER
        // BY the SQL replay uses; hex-symbol compareTo is ASCII-
        // lexicographic in both engines
        var bestA = -1; var bestB = -1; var bestC = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val a = (e.getKey.longValue() >>> 32).toInt
          val b = (e.getKey.longValue() & 0xffffffffL).toInt
          val c = e.getValue()(0)
          val better = c > bestC || (c == bestC && {
            val cmpA = names(a).compareTo(names(bestA))
            cmpA < 0 || (cmpA == 0 && names(b).compareTo(names(bestB)) < 0)
          })
          if (better) { bestA = a; bestB = b; bestC = c }
        }
        merges += ((names(bestA), names(bestB)))
        val merged = names.length
        names += names(bestA) + names(bestB)
        seqs = seqs.map(applyMerge(_, bestA, bestB, merged))
        iter += 1
      }
    }
    merges.toSeq
  }

  /** One left-to-right non-overlapping merge pass (see determinism
    * contract above). */
  private def applyMerge(s: Array[Int], a: Int, b: Int, c: Int): Array[Int] = {
    val out = new Array[Int](s.length)
    var i = 0; var o = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
        out(o) = c; i += 2
      } else {
        out(o) = s(i); i += 1
      }
      o += 1
    }
    if (o == s.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** Column form: BPE token count of `text` under the trained merges. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BpeTokenCount(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), merges))
}

/** Token count under a trained BPE merge list, one int-array pass per
  * merge rank per row (see [[Bpe]] for the cross-engine contract).
  * `doGenCode` emits one direct call on the plan-referenced instance (the
  * CharShingles pattern), keeping the projection around it inside
  * whole-stage codegen. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_token_count"

  // merge rules resolved to dense int ids once per executor: base ids
  // 0..255 are the bytes, merged symbols extend upward in rank order
  @transient private lazy val rules: Array[(Int, Int, Int)] = {
    val dict = new java.util.HashMap[String, Integer]()
    (0 until 256).foreach(b => dict.put(f"$b%02X", Integer.valueOf(b)))
    var next = 256
    merges.map { case (a, b) =>
      val ia = dict.get(a); val ib = dict.get(b)
      require(ia != null && ib != null,
        s"BPE merge ($a,$b) references a symbol no earlier merge produced")
      val name = a + b
      var ic = dict.get(name)
      if (ic == null) { ic = Integer.valueOf(next); dict.put(name, ic); next += 1 }
      (ia.intValue(), ib.intValue(), ic.intValue())
    }.toArray
  }

  def compute(v: UTF8String): Long = {
    val bytes = v.getBytes
    if (bytes.isEmpty) return 0L
    var s = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { s(i) = bytes(i) & 0xff; i += 1 }
    var n = s.length
    var r = 0
    while (r < rules.length) {
      val (a, b, c) = rules(r)
      // in-place left-to-right non-overlapping pass
      var in = 0; var out = 0
      while (in < n) {
        if (in < n - 1 && s(in) == a && s(in + 1) == b) {
          s(out) = c; in += 2
        } else {
          s(out) = s(in); in += 1
        }
        out += 1
      }
      n = out
      r += 1
    }
    n.toLong
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(compute(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenCountExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}
