package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * The built-in route (`zip_with` + `aggregate` higher-order functions) is
  * semantically fine but falls out of whole-stage codegen — HOFs evaluate
  * interpreted, with a boxed lambda call per element. For 64-dim float
  * vectors compared O(candidates × queries) times, that per-element
  * overhead dominates the whole similarity-search stage.
  *
  * These expressions keep the math in one tight primitive loop inside
  * generated Java (`doGenCode`), with an interpreted `nullSafeEval` twin
  * for completeness. Arithmetic (per-element double widening, sequential
  * accumulation, `dot / (sqrt(na)·sqrt(nb))`) matches the HOF formulation
  * bit-for-bit for non-degenerate inputs; the one deliberate divergence
  * is the zero vector, where cosine returns 0.0 instead of the HOF's
  * 0/0 = NaN (NaN sorts above every real double and would poison
  * descending top-k rankings).
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over float vectors, accumulated in double. */
  case class FloatVectorDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xa = a.asInstanceOf[ArrayData].toFloatArray()
      val xb = b.asInstanceOf[ArrayData].toFloatArray()
      var dot = 0.0
      var i = 0
      val n = math.min(xa.length, xb.length)
      while (i < n) { dot += xa(i).toDouble * xb(i).toDouble; i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val xa = ctx.freshName("xa")
        val xb = ctx.freshName("xb")
        val dot = ctx.freshName("dot")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |float[] $xa = $a.toFloatArray();
           |float[] $xb = $b.toFloatArray();
           |double $dot = 0.0;
           |int $n = Math.min($xa.length, $xb.length);
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (double) $xa[$i] * (double) $xb[$i];
           |}
           |${ev.value} = $dot;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FloatVectorDot =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity of two float vectors in a single pass: dot product
    * and both norms accumulate in one loop, then `dot/(√na·√nb)` — one
    * array traversal instead of the three a dot/norm/norm composition
    * would take.
    */
  case class FloatVectorCosine(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xa = a.asInstanceOf[ArrayData].toFloatArray()
      val xb = b.asInstanceOf[ArrayData].toFloatArray()
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val n = math.min(xa.length, xb.length)
      while (i < n) {
        val x = xa(i).toDouble
        val y = xb(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      // zero vector: similarity 0.0, not NaN — NaN sorts ABOVE every real
      // double in Spark, so a NaN would rank a zero embedding as the top
      // match of every descending top-k
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val xa = ctx.freshName("xa")
        val xb = ctx.freshName("xb")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |float[] $xa = $a.toFloatArray();
           |float[] $xb = $b.toFloatArray();
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |int $n = Math.min($xa.length, $xb.length);
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $xa[$i];
           |  double $y = (double) $xb[$i];
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0)
           |  ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FloatVectorCosine =
      copy(left = newLeft, right = newRight)
  }

  /** Int8 quantization stats for one embedding: `scale = 127 / max|x|`
    * (0.0 for the zero vector) and the quantized checksum/energy
    * `q_sum = Σ qᵢ`, `q_norm2 = Σ qᵢ²` with `qᵢ = floor(xᵢ·scale + 0.5)`.
    * This is the storage-compression step of an embedding pipeline
    * (float32 → int8 is the standard 4× shrink before ANN serving); the
    * stats are the scalar audit of the quantized vectors, computed without
    * materializing them. `floor(x + 0.5)` is chosen over `round` because
    * both engines agree on it exactly (Java `Math.round` and SQL `round`
    * disagree on negative halves).
    */
  case class Int8QuantStats(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "q_sum", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "q_norm2", org.apache.spark.sql.types.LongType, nullable = false)))

    override def prettyName: String = "int8_quant_stats"

    override def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData].toFloatArray()
      var mx = 0.0
      var i = 0
      while (i < xs.length) {
        val a = math.abs(xs(i).toDouble); if (a > mx) mx = a; i += 1
      }
      val scale = if (mx == 0.0) 0.0 else 127.0 / mx
      var qSum = 0L
      var qNorm2 = 0L
      i = 0
      while (i < xs.length) {
        val q = math.floor(xs(i).toDouble * scale + 0.5).toLong
        qSum += q; qNorm2 += q * q; i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](scale, qSum, qNorm2))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val xs = ctx.freshName("xs")
        val mx = ctx.freshName("mx")
        val a = ctx.freshName("a")
        val scale = ctx.freshName("scale")
        val qSum = ctx.freshName("qSum")
        val qNorm2 = ctx.freshName("qNorm2")
        val q = ctx.freshName("q")
        val i = ctx.freshName("i")
        s"""
           |float[] $xs = $s.toFloatArray();
           |double $mx = 0.0;
           |for (int $i = 0; $i < $xs.length; $i++) {
           |  double $a = Math.abs((double) $xs[$i]);
           |  if ($a > $mx) $mx = $a;
           |}
           |double $scale = $mx == 0.0 ? 0.0 : 127.0 / $mx;
           |long $qSum = 0L; long $qNorm2 = 0L;
           |for (int $i = 0; $i < $xs.length; $i++) {
           |  long $q = (long) Math.floor((double) $xs[$i] * $scale + 0.5);
           |  $qSum += $q; $qNorm2 += $q * $q;
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
           |    new Object[] { java.lang.Double.valueOf($scale),
           |      java.lang.Long.valueOf($qSum), java.lang.Long.valueOf($qNorm2) });
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
      copy(child = newChild)
  }

  /** Column-API entry points. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def int8QuantStats(a: Column): Column =
    ColumnBridge.column(Int8QuantStats(ColumnBridge.expression(a)))

  def vecCosine(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
