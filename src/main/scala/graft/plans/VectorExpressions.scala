package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Dot product of two `array<float>` columns, accumulated in double in
  * index order — a custom Catalyst expression with whole-stage codegen.
  *
  * This exists for the similarity-search hot path: the equivalent
  * higher-order-function plan (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is evaluated interpreted, one lambda call per element, which dominates
  * all-pairs cosine at corpus scale (~40× slower end-to-end on the bench's
  * 2 M-pair near-duplicate scan). The generated code is a tight primitive
  * loop inside the join stage. Accumulation order matches the HOF form, so
  * results are bit-identical (oracle-safe).
  *
  * Null elements inside the arrays are not expected (embedding vectors);
  * mismatched lengths dot the common prefix.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; callers own the contract (ExpectsInputTypes
  // is private[sql] in Spark 4, so there is no declarative check here)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Signed-random-projection band buckets of an `array<float>` vector: the
  * vector is projected onto `bands × bandBits` seeded Rademacher (±1)
  * hyperplanes and each band's sign pattern packs into an int, giving
  * `bands` LSH bucket keys per vector in ONE pass (vs `bands × bandBits`
  * separate dot-product expressions, whose literal plane arrays blow the
  * expression tree into tens of thousands of nodes).
  *
  * The plane sequence comes from [[graft.similarity.Similarity.planes]] —
  * the one source of the seeded Rademacher convention — so it is
  * deterministic across runs and executors and can never diverge from the
  * SRP top-k path (the near-duplicate gate's recall on a given corpus is
  * a fixed fact, not a per-run coin flip).
  *
  * Evaluated interpreted ([[CodegenFallback]]): it runs once per corpus
  * ROW (not per candidate pair), so it is not on the pairwise hot path
  * that justified codegen for [[FloatVectorDot]]. */
case class SrpBandBuckets(child: Expression, bandBits: Int, bands: Int,
    dim: Int, seed: Long) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_band_buckets"

  @transient private lazy val planes: Array[Array[Float]] =
    graft.similarity.Similarity.planes(bands * bandBits, dim, seed).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](bands)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * plane(i).toDouble
        i += 1
      }
      if (acc >= 0) out(p / bandBits) |= 1 << (p % bandBits)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level API for [[FloatVectorDot]]. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level API for [[SrpBandBuckets]]. */
  def srpBandBuckets(v: Column, bandBits: Int, bands: Int, dim: Int,
      seed: Long): Column =
    ColumnBridge.column(SrpBandBuckets(
      ColumnBridge.expression(v), bandBits, bands, dim, seed))
}
