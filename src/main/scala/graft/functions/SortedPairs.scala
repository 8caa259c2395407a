package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Generator emitting every ordered pair (a[i], a[j]), i < j, of a sorted
  * LONG array — the posting-list pair-emission step of the inverted-index
  * near-dup join, as one streaming pass.
  *
  * Semantically identical to
  * `explode(flatten(transform(sequence(1, n-1), i -> transform(slice(a,
  * i+1, n-i), b -> struct(a[i], b)))))`, but that HOF composition copies
  * O(m^2) array elements per posting (each `slice` materializes a fresh
  * array) before exploding; this generator yields the rows directly.
  */
case class SortedPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<BIGINT>")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val a = arr.toLongArray()
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      def hasNext: Boolean = i < n - 1
      def next(): InternalRow = {
        val row = InternalRow(a(i), a(j))
        j += 1
        if (j == n) { i += 1; j = i + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "sorted_pairs"
}
