package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native containment similarity over two ARRAY<STRING> columns of
  * DISTINCT elements: `|a ∩ b| / |a|` — the ASYMMETRIC near-dup
  * measure. Jaccard misses subset relationships (a quote inside a much
  * longer document scores low); containment of the smaller side is the
  * standard detector for partial-overlap / quotation / template reuse
  * in training-data pipelines.
  *
  * Same single-pass hash-set design as [[JaccardSimilarity]] (set from
  * the smaller side, one probe pass, static helper call inside
  * whole-stage codegen); arithmetic `common * 1.0 / na` is the SQL
  * oracle's formulation exactly (NaN on an empty left side, like SQL's
  * 0/0). Registered globally, so inputs are NOT assumed distinct:
  * common elements count once regardless of multiplicity (probe set
  * removes on hit), making the result equal to
  * `size(array_intersect(a, b)) / size(a)` for ANY arrays — ad-hoc SQL
  * with duplicate elements agrees with the composed-functions
  * formulation. Internal callers pass distinct shingle arrays, where
  * this reduces to plain containment |a∩b|/|a|. */
case class ContainmentSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "containment_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ContainmentSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ContainmentSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainmentSimilarity =
    copy(left = newLeft, right = newRight)
}

object ContainmentSimilarity {
  /** `|distinct(a) ∩ distinct(b)| / len(a)` — equal to
    * `size(array_intersect(a, b)) / size(a)` for any inputs; static for
    * direct calls from generated code. `remove` (not `contains`) on the
    * probe makes each common element count once even when either side
    * holds duplicates — distinct-common is symmetric, so building the
    * set from the smaller side stays valid. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (small, big, nSmall, nBig) =
      if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[UTF8String](nSmall * 2)
    var i = 0
    while (i < nSmall) { set.add(small.getUTF8String(i)); i += 1 }
    var common = 0
    i = 0
    while (i < nBig) {
      if (set.remove(big.getUTF8String(i))) common += 1
      i += 1
    }
    common * 1.0 / na
  }
}
