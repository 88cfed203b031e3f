package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a constant serialized
  * `org.apache.spark.util.sketch.BloomFilter` — the native replacement for
  * the black-box Scala UDF that `plans.BloomPrune` used to wrap around
  * `mightContainLong`. As a real Catalyst expression it stays inside
  * WholeStageCodegen (the UDF broke the span around the one filter whose
  * entire purpose is cutting pre-shuffle volume) and keeps the
  * surrounding scan eligible for pushdown/pruning.
  *
  * `left` must be a FOLDABLE binary column (the filter serialized once on
  * the driver); it is deserialized once per executor/expression instance,
  * never per row. `right` is the BIGINT probe key; a NULL key yields NULL
  * (which a Filter treats as drop — NULL never equi-joins anyway).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        "graft_might_contain expects a BINARY serialized bloom filter, " +
          s"got ${left.dataType.sql}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_might_contain expects a constant (foldable) bloom filter")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_might_contain expects a BIGINT key, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_might_contain: bloom filter is NULL")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloomBytes: Any, key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the ONE deserialized filter; never re-read the bytes
    val bf = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    val k = right.genCode(ctx)
    ev.copy(code =
      code"""
        |${k.code}
        |boolean ${ev.isNull} = ${k.isNull};
        |${CodeGenerator.javaType(dataType)} ${ev.value} =
        |  ${CodeGenerator.defaultValue(dataType)};
        |if (!${ev.isNull}) {
        |  ${ev.value} = $bf.mightContainLong(${k.value});
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_might_contain"
}
