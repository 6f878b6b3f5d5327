package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaccard similarity over two ARRAY<STRING> columns of DISTINCT
  * elements (shingle sets):
  * `|a ∩ b| / (|a| + |b| − |a ∩ b|)`.
  *
  * The composable form — `size(array_intersect(a, b))` plus two
  * `size()`s and a division — materializes the intersection ARRAY per
  * pair just to take its length. This expression counts hash-set hits
  * in one pass (set built from the smaller side), allocating nothing
  * but the set, and stays inside whole-stage codegen via a static
  * helper call. Arithmetic is `common * 1.0 / (na + nb − common)` —
  * bit-identical to the SQL formulation the oracles use (NaN when both
  * sides are empty, exactly like SQL's 0/0).
  *
  * Inputs are assumed element-distinct (true for every shingle-array
  * producer in [[graft.operators.Dedup]]); on non-distinct inputs
  * `array_intersect` would dedup while this counts the distinct
  * intersection against RAW lengths — keep it on its domain. */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {
  /** Static so generated code calls it directly (no boxing, no virtual
    * dispatch through the expression tree). */
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
      if (set.contains(big.getUTF8String(i))) common += 1
      i += 1
    }
    common * 1.0 / (na + nb - common)
  }
}
