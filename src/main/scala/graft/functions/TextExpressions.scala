package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Most-frequent bigram of a token array in ONE imperative pass.
  *
  * Replaces t8's declarative chain
  * `aggregate(array_sort(transform(sequence(...), i -> concat(...))), ...)`:
  * higher-order functions evaluate INTERPRETED in Spark — per bigram that
  * chain paid a lambda-variable bind, a named_struct allocation and several
  * string copies, then an O(L log L) interpreted-comparator sort, making the
  * fold the dominant cost of the whole query at scale (t8 was the slowest
  * query of the sf10 gate at 157 s; the corpus-sized work here is ~100M
  * bigrams). This expression counts bigrams in an open hash map and scans
  * for the max — O(L), two allocations per distinct bigram, no sort.
  *
  * Semantics are IDENTICAL to the fold (pinned by Round7OpsSpec against the
  * retained HOF form): count = occurrences of the concat(tok_i,' ',tok_i+1)
  * bigram, winner = highest count, ties to the byte-wise smallest bigram
  * (the sorted fold's strict `>` keeps the FIRST max run, i.e. the
  * lexicographically smallest under array_sort's UTF8String binary order —
  * exactly a (count desc, bytes asc) argmin). Fewer than two tokens yields
  * the fold's initial state (null, 0). `split` never emits null elements;
  * a defensive null check skips any that appear.
  *
  * CodegenFallback costs one interpreted call per ROW (not per element) —
  * the per-row work (hundreds of bigrams) dwarfs it, same trade as
  * MinHashSigs/CellTopN.
  */
case class TopBigramRun(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("best_bg", StringType, nullable = true),
    StructField("best_n", LongType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return InternalRow(null, 0L)
    val counts = new java.util.HashMap[UTF8String, Array[Long]](Math.min(n * 2, 1 << 16))
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (prev != null && cur != null) {
        val bg = UTF8String.concat(prev, space, cur)
        val slot = counts.get(bg)
        if (slot == null) counts.put(bg, Array(1L)) else slot(0) += 1L
      }
      prev = cur
      i += 1
    }
    var bestBg: UTF8String = null
    var bestN = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestN || (c == bestN && e.getKey.compareTo(bestBg) < 0)) {
        bestBg = e.getKey
        bestN = c
      }
    }
    InternalRow(bestBg, bestN)
  }

  override protected def withNewChildInternal(c: Expression): TopBigramRun =
    copy(child = c)
}
