package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Highest occurrence count of any element in a string array, in one
  * hash-counting pass — value-identical to the HOF formulation
  * `array_max(transform(array_distinct(ts), d -> size(filter(ts, t -> t = d))))`
  * (pinned by a test), which is quadratic AND re-evaluates the child
  * inside each lambda (Catalyst does not CSE across lambda functions,
  * so for `ts = split(text)` the text is re-split once per distinct
  * token). NULL for an empty array, matching array_max of an empty
  * transform.
  *
  * Codegen delegates the hash-counting loop to `maxFreq` through an
  * instance reference — the expression still participates in
  * whole-stage codegen, without inlining a hash table into generated
  * Java.
  */
case class TokenMaxFreq(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  /** One counting pass; called from both interpreted and generated code. */
  def maxFreq(arr: ArrayData): Int = {
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val n = arr.numElements()
    var best = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val prev = counts.get(t)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(t, c)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else maxFreq(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val self = ctx.addReferenceObj("tokenMaxFreq", this,
        classOf[TokenMaxFreq].getName)
      s"""
         |if ($arr.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $self.maxFreq($arr);
         |}
       """.stripMargin
    })

  override def prettyName: String = "token_max_freq"

  override protected def withNewChildInternal(newChild: Expression): TokenMaxFreq =
    copy(child = newChild)
}
