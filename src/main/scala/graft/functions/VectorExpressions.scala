package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math over
  * `ArrayType(FloatType)` — the similarity-search extension
  * (SURVEY.md §4.2: "no built-in ANN; CosineSimilarity not a SQL
  * function"). A custom codegen'd Expression rather than a Scala UDF so
  * the hot loop stays inside whole-stage codegen with no
  * boxing/serialization: at 100 TB the brute-force scorer is
  * scan-bound, and this keeps it that way.
  *
  * Accumulation is in double over sequential element order — the same
  * operation sequence as `aggregate(zip_with(...))` and DuckDB's
  * `list_sum(list_transform(list_zip(...)))`, so oracle comparisons are
  * bit-exact.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def checkLengths(a: ArrayData, b: ArrayData): Unit =
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"vector length mismatch: ${a.numElements()} vs ${b.numElements()}")
}

/** dot(a, b) = Σ a_i * b_i (doubles). */
case class VecDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    checkLengths(a, b)
    var dot = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements())
         |  throw new IllegalArgumentException("vector length mismatch: " + $n + " vs " + $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++)
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** cosine(a, b) = dot / (||a|| * ||b||), one pass; null when either norm
  * is zero (undefined direction) rather than NaN.
  */
case class VecCosine(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    checkLengths(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements())
         |  throw new IllegalArgumentException("vector length mismatch: " + $n + " vs " + $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

/** Random-hyperplane LSH sketch: one bucket (the `bits` sign bits packed
  * into a long) per hash table, for `tables` tables, as
  * `array<bigint>` indexed by table.
  *
  * The hyperplanes are RADEMACHER (±1) sign vectors derived from md5 of
  * `(seed, table, bit)` — sign-random-projection LSH keeps its
  * cosine-collision property with ±1 entries (Charikar's SimHash planes;
  * Achlioptas-style database-friendly projections), and, unlike Gaussian
  * planes, the constants and the arithmetic (per-element ±x, sequential
  * double accumulation) are exactly reproducible in any engine's SQL —
  * which is what lets q31/q32 ride the hash-grade oracle gate:
  * [[VecLshSketch.planeSigns]] is public so oracle SQL generators embed
  * the identical ±1.0 literals.
  *
  * The plane matrix lives in ONE reference object — doing this with
  * per-plane `vec_dot(emb, lit(plane))` columns puts tables×bits
  * 64-float literals into the plan, and optimizer passes + codegen +
  * task deserialization over those trees end up costing more than the
  * actual math (measured: q31 spent more time planning than executing).
  * The matrix is @transient lazy, so executors regenerate it from the
  * seed instead of shipping it with every task.
  */
case class VecLshSketch(child: Expression, seed: Int, tables: Int, bits: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits <= 62, "bucket bits must fit a long")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  // flat [tables*bits*dim] for cache-friendly row-major access
  @transient private lazy val planes: Array[Double] =
    VecLshSketch.planeSigns(seed, tables, bits, dim).flatten

  def compute(a: ArrayData): ArrayData = {
    if (a.numElements() != dim)
      throw new IllegalArgumentException(
        s"vector length mismatch: ${a.numElements()} vs sketch dim $dim")
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        // ±1.0 multiply is an exact IEEE sign flip; sequential double
        // accumulation in element order — the same operation sequence as
        // the oracle's list_sum(list_transform(list_zip(...)))
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += a.getFloat(d).toDouble * planes(base + d); d += 1 }
        if (dot >= 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecLshSketch", this, classOf[VecLshSketch].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "vec_lsh_sketch"
}

object VecLshSketch {
  /** The ±1.0 Rademacher plane matrix, row-major: row `t*bits + b` holds
    * the `dim` signs of table `t`'s bit-`b` hyperplane. Sign `d` is bit
    * `d mod 128` (LSB-first within each byte) of
    * `md5(s"$seed:$t:$b:${d / 128}")`. Public and engine-portable so
    * oracle SQL can embed the identical constants.
    */
  def planeSigns(seed: Int, tables: Int, bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(tables * bits) { r =>
      val t = r / bits
      val b = r % bits
      val blocks = Array.tabulate((dim + 127) / 128) { k =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$t:$b:$k".getBytes("UTF-8"))
      }
      Array.tabulate(dim) { d =>
        val bit = d % 128
        if (((blocks(d / 128)(bit / 8) >> (bit % 8)) & 1) == 1) 1.0 else -1.0
      }
    }
}

/** Registration + Column-facing API. Functions are injected either via
  * `spark.sql.extensions=graft.GraftExtensions` or [[Vectors.register]]
  * on an existing session; `vec_dot`/`vec_cosine` then work from SQL and
  * from the Column API below.
  */
object Vectors {
  private def asInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "vec_cosine" -> (es => VecCosine(es(0), es(1))),
    "vec_lsh_sketch" -> (es =>
      VecLshSketch(es(0), asInt(es(1)), asInt(es(2)), asInt(es(3)), asInt(es(4)))),
    "kmv_distinct" -> (es =>
      KmvDistinct(es(0), asInt(es(1))).toAggregateExpression()))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vecCosine(a: Column, b: Column): Column = call_function("vec_cosine", a, b)
  def vecLshSketch(emb: Column, seed: Int, tables: Int, bits: Int, dim: Int): Column =
    call_function("vec_lsh_sketch", emb,
      org.apache.spark.sql.functions.lit(seed), org.apache.spark.sql.functions.lit(tables),
      org.apache.spark.sql.functions.lit(bits), org.apache.spark.sql.functions.lit(dim))
}
