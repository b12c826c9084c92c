package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-generating n-gram shingler — the GENERATOR extension point (SURVEY
  * §2 UDF/UDAF/UDTF table: "a Catalyst Generator if expression-level
  * needed"). `shingle_rows(text, n)` emits one ROW per complete n-word
  * window, in order, WITHOUT materializing the full shingle array the way
  * `explode(word_shingles(...))` must: for tokenize-heavy pipelines over
  * long documents that intermediate array (≈ words × n strings) is pure
  * allocation the generator never pays — rows stream straight into the
  * parent consume loop.
  *
  * Semantics (mirrored exactly by the DuckDB oracle): whitespace-split
  * words; documents with fewer than n words emit nothing; overlapping
  * windows joined by single spaces; duplicates preserved (this is the
  * multiset tokenizer — `word_shingles` is the DISTINCT set for minhash).
  */
case class ShingleRows(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (StringType, IntegerType) =>
        if (!nExpr.foldable)
          TypeCheckResult.TypeCheckFailure("shingle_rows: n must be a foldable constant")
        else nExpr.eval() match {
          case n: Int if n >= 1 && n <= 64 => TypeCheckResult.TypeCheckSuccess
          case other =>
            TypeCheckResult.TypeCheckFailure(s"shingle_rows: n must be in [1, 64], got $other")
        }
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"shingle_rows expects (string, int), got ${child.dataType} / ${nExpr.dataType}")
    }

  private lazy val n: Int = nExpr.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val words = t.asInstanceOf[UTF8String].toString.split(" ")
    if (words.length < n) return Iterator.empty
    val sep = UTF8String.fromString(" ")
    (0 to words.length - n).iterator.map { i =>
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = UTF8String.fromString(words(i + j))
        if (j < n - 1) parts(2 * j + 1) = sep
        j += 1
      }
      InternalRow(UTF8String.concat(parts: _*))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleRows =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
