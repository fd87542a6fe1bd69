package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003) as
  * a single custom expression: normalize → POLYNOMIAL ROLLING k-gram hash
  * (O(1) per position) → sliding-window minimum via a monotonic deque
  * (O(1) amortized) → distinct, sorted. One O(n) pass per document.
  *
  * This replaced an array-expression formulation (`transform` over
  * `sequence` with `array_min(slice(...))`): Catalyst's CollapseProject
  * re-inlines the gram array into the per-window lambda, re-hashing all n
  * grams for each of n windows — O(n²) per document, ~100× slower at
  * corpus scale. A guarantee the expression keeps: any shared substring of
  * length ≥ k+w-1 between two documents yields a shared fingerprint.
  *
  * CodegenFallback is fine here: the heavy loop is inside one eval call
  * per row, not per element.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fingerprints"

  /** splitmix64 finalizer — spreads the weak polynomial bits. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    // normalize: lowercase, collapse whitespace runs to one space, trim
    val raw = input.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var prevSpace = true
    var idx = 0
    while (idx < raw.length) {
      val c = raw.charAt(idx)
      if (Character.isWhitespace(c)) {
        if (!prevSpace) { sb.append(' '); prevSpace = true }
      } else { sb.append(Character.toLowerCase(c)); prevSpace = false }
      idx += 1
    }
    while (sb.length > 0 && sb.charAt(sb.length - 1) == ' ')
      sb.setLength(sb.length - 1)
    val s = sb
    val n = s.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Long])

    // rolling polynomial hash, base 257 mod 2^64
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= 257L; i += 1 }
    val hashes = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * 257L + s.charAt(i); i += 1 }
    hashes(0) = mix64(h)
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * 257L + s.charAt(i + k - 1)
      hashes(i) = mix64(h)
      i += 1
    }

    // sliding min over windows of w via monotonic deque (indices)
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hashes(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingExpression {
  def winnowingFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowingFingerprints(ColumnBridge.expression(text), k, w))
}
