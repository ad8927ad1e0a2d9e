package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-smallest selection as an Aggregator — the scale-correct
  * replacement for `row_number() OVER (PARTITION BY bucket ORDER BY id) <=
  * cap`.
  *
  * The window form SORTS the entire partition's membership on one reducer
  * before discarding rows beyond the cap: the OUTPUT is bounded but the
  * skewed sort is not (a degenerate LSH bucket with 1e8 members sorts 1e8
  * rows on a single task). This aggregate keeps the identical deterministic
  * semantics — the cap smallest ids per group — in O(cap) memory per group
  * with NO full sort: it runs inside ObjectHashAggregate, so each map task
  * reduces its slice of a hot group to at most `cap` ids before the shuffle
  * (partial aggregation), and the reducer merges bounded buffers.
  *
  * Buffer = a binary MAX-heap of the cap smallest values seen (root is the
  * current worst candidate, evicted when a smaller value arrives). The kept
  * SET is a pure function of the input multiset — plan- and retry-stable —
  * and the result array is sorted ascending for deterministic output.
  */
final case class MinIdsBuf(var n: Int, var heap: Array[Long])

class BoundedMinIds(cap: Int) extends Aggregator[Long, MinIdsBuf, Array[Long]] {
  require(cap > 0, "cap must be positive")

  def zero: MinIdsBuf = MinIdsBuf(0, new Array[Long](math.min(cap, 16)))

  private def siftUp(h: Array[Long], i0: Int): Unit = {
    var i = i0
    while (i > 0 && h((i - 1) / 2) < h(i)) {
      val p = (i - 1) / 2
      val t = h(p); h(p) = h(i); h(i) = t
      i = p
    }
  }

  private def siftDown(h: Array[Long], n: Int): Unit = {
    var i = 0
    var continue = true
    while (continue) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < n && h(l) > h(m)) m = l
      if (r < n && h(r) > h(m)) m = r
      if (m == i) continue = false
      else { val t = h(m); h(m) = h(i); h(i) = t; i = m }
    }
  }

  private def push(b: MinIdsBuf, v: Long): MinIdsBuf = {
    if (b.n < cap) {
      if (b.n == b.heap.length)
        b.heap = java.util.Arrays.copyOf(b.heap, math.min(cap, b.heap.length * 2))
      b.heap(b.n) = v
      siftUp(b.heap, b.n)
      b.n += 1
    } else if (v < b.heap(0)) {
      b.heap(0) = v
      siftDown(b.heap, b.n)
    }
    b
  }

  def reduce(b: MinIdsBuf, v: Long): MinIdsBuf = push(b, v)

  def merge(a: MinIdsBuf, b: MinIdsBuf): MinIdsBuf = {
    var out = a
    var i = 0
    while (i < b.n) { out = push(out, b.heap(i)); i += 1 }
    out
  }

  def finish(b: MinIdsBuf): Array[Long] = {
    val out = java.util.Arrays.copyOf(b.heap, b.n)
    java.util.Arrays.sort(out)
    out
  }

  def bufferEncoder: Encoder[MinIdsBuf] = Encoders.product[MinIdsBuf]
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BoundedMinIds {
  /** Column form: `minIds(cap)(col("doc_id"))` aggregates to `array<long>`
    * of the cap smallest values in the group.
    */
  def minIds(cap: Int)(c: Column): Column =
    udaf(new BoundedMinIds(cap), Encoders.scalaLong).apply(c)
}
