package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `mightContainLong` probe of a pre-built Bloom filter over a LONG column,
  * as a whole-stage-codegen Catalyst expression.
  *
  * This is the scale-path gate for exact decontamination
  * ([[graft.dedup.Dedup.bloomDecontam]]): the benchmark's distinct shingle
  * hashes collapse into a few MiB of Bloom bits that ship to every task
  * inside the plan (codegen reference object), and the 100 TB training
  * side is filtered BEFORE any join or shuffle — the subsequent exact
  * semi-join only sees the Bloom survivors (true hits + the fpp tail), so
  * its shuffle volume is output-sized, not corpus-sized. A Bloom filter
  * has no false negatives, so the exact verify on the survivors returns
  * exactly the unfiltered result — the gate is a pure physical
  * optimization with zero semantic footprint (oracle-safe).
  *
  * The filter travels in serialized form (a plain byte array, stable to
  * Java serialization of the expression tree) and deserializes lazily once
  * per executor; codegen pins the deserialized instance as a reference
  * object, so the generated probe is one virtual call per row with no
  * per-row deserialization or boxing.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  // Array[Byte] equality is reference-based, so the synthesized case-class
  // equals/hashCode would treat two gates over IDENTICAL filter bits as
  // distinct expressions — defeating Catalyst canonicalization /
  // semanticEquals and common-subexpression elimination. Compare contents.
  override def equals(other: Any): Boolean = other match {
    case that: BloomMightContainLong =>
      child == that.child &&
        java.util.Arrays.equals(bloomBytes, that.bloomBytes)
    case _ => false
  }
  // cached: Catalyst hashes expressions many times per planning pass
  // (maps/sets during analysis, canonicalization, CSE) and the serialized
  // filter is large — recomputing the array hash each call would make
  // planning time proportional to filter size
  @transient private lazy val bytesHash: Int =
    java.util.Arrays.hashCode(bloomBytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
