package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused quantization kernels. The composed-SQL forms (transform /
  * slice / array_min / element_at chains) allocate subarrays and
  * re-walk lists per centroid; these are the single-pass versions the
  * quantized 100 TB scan actually needs.
  */

/** PQ encode: vec -> m codes, argmin centroid per subspace (first-min
  * tie-break, matching array_position semantics).
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {

  private val m = codebook.length
  private val kStar = codebook(0).length
  private val subDim = codebook(0)(0).length
  @transient private lazy val flat: Array[Double] = codebook.flatMap(_.flatten)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < kStar) {
        val off = (s * kStar + c) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = (if (fl) arr.getFloat(s * subDim + i).toDouble
                   else arr.getDouble(s * subDim + i)) - flat(off + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      // freshName on statement-level locals: unbraced inlining under a
      // non-nullable child collides fixed names across instances
      val out = ctx.freshName("out")
      val s0 = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cc = ctx.freshName("cc")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
       |int[] $out = new int[$m];
       |for (int $s0 = 0; $s0 < $m; $s0++) {
       |  int $best = 0; double $bestD = Double.MAX_VALUE;
       |  for (int $cc = 0; $cc < $kStar; $cc++) {
       |    int $off = ($s0 * $kStar + $cc) * $subDim;
       |    double $d = 0.0;
       |    for (int $i = 0; $i < $subDim; $i++) {
       |      double $x = ((double) $c.$get($s0 * $subDim + $i)) - $cbRef[$off + $i];
       |      $d += $x * $x;
       |    }
       |    if ($d < $bestD) { $bestD = $d; $best = $cc; }
       |  }
       |  $out[$s0] = $best;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** SCANN-family anisotropic PQ encode (Guo et al. 2020, "Accelerating
  * Large-Scale Inference with Anisotropic Vector Quantization" — the
  * reference's milvus-scann index family, README.md:84). Per subspace
  * the codeword minimises the SCORE-AWARE loss instead of plain L2:
  * the quantization residual r = x - c is split against the datapoint
  * direction, and the parallel component — the part that perturbs
  * inner products with queries near x — is weighted eta > 1:
  *
  *   loss(x, c) = |r|^2 + (eta - 1) * (r . x)^2 / |x|^2
  *
  * (equal to eta*|r_par|^2 + |r_orth|^2). eta = 1 degrades to plain
  * L2 PQ. |x| = 0 falls back to |r|^2 = |c|^2. First-min tie-break,
  * matching PqEncode. Summation order is ascending i — the DuckDB
  * oracle folds the same order, so the argmin replicates exactly.
  */
case class PqEncodeAniso(child: Expression,
    codebook: Array[Array[Array[Double]]], eta: Double)
    extends UnaryExpression with Serializable {

  private val m = codebook.length
  private val kStar = codebook(0).length
  private val subDim = codebook(0)(0).length
  @transient private lazy val flat: Array[Double] = codebook.flatMap(_.flatten)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_aniso requires array<float|double>, got ${t.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      // subvector norm^2, once per subspace
      var n2 = 0.0
      var i = 0
      while (i < subDim) {
        val x = if (fl) arr.getFloat(s * subDim + i).toDouble
                else arr.getDouble(s * subDim + i)
        n2 += x * x
        i += 1
      }
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < kStar) {
        val off = (s * kStar + c) * subDim
        var d = 0.0
        var rx = 0.0
        i = 0
        while (i < subDim) {
          val x = if (fl) arr.getFloat(s * subDim + i).toDouble
                  else arr.getDouble(s * subDim + i)
          val r = x - flat(off + i)
          d += r * r
          rx += r * x
          i += 1
        }
        val loss = if (n2 > 0.0) d + (eta - 1.0) * rx * rx / n2 else d
        if (loss < bestD) { bestD = loss; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("anisoCb", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val s0 = ctx.freshName("s")
      val n2 = ctx.freshName("n2")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cc = ctx.freshName("cc")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val rx = ctx.freshName("rx")
      val loss = ctx.freshName("loss")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val r = ctx.freshName("r")
      s"""
       |int[] $out = new int[$m];
       |for (int $s0 = 0; $s0 < $m; $s0++) {
       |  double $n2 = 0.0;
       |  for (int $i = 0; $i < $subDim; $i++) {
       |    double $x = (double) $c.$get($s0 * $subDim + $i);
       |    $n2 += $x * $x;
       |  }
       |  int $best = 0; double $bestD = Double.MAX_VALUE;
       |  for (int $cc = 0; $cc < $kStar; $cc++) {
       |    int $off = ($s0 * $kStar + $cc) * $subDim;
       |    double $d = 0.0;
       |    double $rx = 0.0;
       |    for (int $i = 0; $i < $subDim; $i++) {
       |      double $x = (double) $c.$get($s0 * $subDim + $i);
       |      double $r = $x - $cbRef[$off + $i];
       |      $d += $r * $r;
       |      $rx += $r * $x;
       |    }
       |    double $loss = $n2 > 0.0 ? $d + ($eta - 1.0) * $rx * $rx / $n2 : $d;
       |    if ($loss < $bestD) { $bestD = $loss; $best = $cc; }
       |  }
       |  $out[$s0] = $best;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pq_encode_aniso"
}

/** ADC distance: m table lookups summed. left = codes (array<int>),
  * right = per-query table (array<array<double>>, m x k*).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any, table: Any): Any = {
    val cs = codes.asInstanceOf[ArrayData]
    val tbl = table.asInstanceOf[ArrayData]
    var acc = 0.0
    var s = 0
    val m = cs.numElements()
    while (s < m) {
      acc += tbl.getArray(s).getDouble(cs.getInt(s))
      s += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val s0 = ctx.freshName("s")
      s"""
       |double $acc = 0.0;
       |int $m = $c.numElements();
       |for (int $s0 = 0; $s0 < $m; $s0++) {
       |  $acc += $t.getArray($s0).getDouble($c.getInt($s0));
       |}
       |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

/** SQ8 L2 distance directly on codes: sqrt(sum_i (q_i - (min_i +
  * code_i * scale_i))^2) — decode fused into the distance loop, no
  * intermediate array.
  */
case class Sq8L2(left: Expression, right: Expression,
    mins: Array[Double], scales: Array[Double])
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def qIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, codes: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = codes.asInstanceOf[ArrayData]
    val fl = qIsFloat
    var acc = 0.0
    var i = 0
    val n = math.min(qa.numElements(), ca.numElements())
    while (i < n) {
      val qv = if (fl) qa.getFloat(i).toDouble else qa.getDouble(i)
      val d = qv - (mins(i) + ca.getInt(i) * scales(i))
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sqScales", scales, "double[]")
    val get = if (qIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
       |int $n = java.lang.Math.min($q.numElements(), $c.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = ((double) $q.$get($i))
       |    - ($minsRef[$i] + $c.getInt($i) * $scalesRef[$i]);
       |  $acc += $d * $d;
       |}
       |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "sq8_l2"
}

/** SQ4 pack: vec -> array<long> words, 15 four-bit codes per word
  * (60 bits used — every word < 2^60, BIGINT-safe on both engines).
  * code_i = clamp(0, 15, round((x_i - min_i) / scale_i)); the affine
  * inputs are non-negative, so Math.round (half-up) equals the
  * half-away-from-zero rounding the DuckDB oracle uses.
  */
case class Sq4Pack(child: Expression,
    mins: Array[Double], scales: Array[Double])
    extends UnaryExpression with Serializable {

  private val dim = mins.length
  private val nWords = (dim + Sq4Pack.CodesPerWord - 1) / Sq4Pack.CodesPerWord

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Long](nWords)
    var i = 0
    val n = math.min(dim, arr.numElements())
    while (i < n) {
      val x = if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)
      val c = math.max(0L, math.min(15L, math.round((x - mins(i)) / scales(i))))
      out(i / Sq4Pack.CodesPerWord) |= c << (4 * (i % Sq4Pack.CodesPerWord))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq4Mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sq4Scales", scales, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    val cpw = Sq4Pack.CodesPerWord
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cd = ctx.freshName("cd")
      s"""
       |long[] $out = new long[$nWords];
       |int $n = java.lang.Math.min($dim, $v.numElements());
       |for (int $i = 0; $i < $n; $i++) {
       |  long $cd = java.lang.Math.max(0L, java.lang.Math.min(15L,
       |    java.lang.Math.round((((double) $v.$get($i)) - $minsRef[$i])
       |      / $scalesRef[$i])));
       |  $out[$i / $cpw] |= $cd << (4 * ($i % $cpw));
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "sq4_pack"
}

object Sq4Pack { val CodesPerWord = 15 }

/** SQ4 L2 directly on packed words: decode (shift+mask) fused into
  * the distance loop — the scan reads dim/2 bytes per row and never
  * materialises a decoded array.
  */
case class Sq4L2(left: Expression, right: Expression,
    mins: Array[Double], scales: Array[Double])
    extends BinaryExpression with Serializable {

  private val dim = mins.length

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def qIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, words: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val wa = words.asInstanceOf[ArrayData]
    val fl = qIsFloat
    var acc = 0.0
    var i = 0
    val n = math.min(dim, qa.numElements())
    while (i < n) {
      val code = ((wa.getLong(i / Sq4Pack.CodesPerWord)
        >>> (4 * (i % Sq4Pack.CodesPerWord))) & 15L).toInt
      val qv = if (fl) qa.getFloat(i).toDouble else qa.getDouble(i)
      val d = qv - (mins(i) + code * scales(i))
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq4Mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sq4Scales", scales, "double[]")
    val get = if (qIsFloat) "getFloat" else "getDouble"
    val cpw = Sq4Pack.CodesPerWord
    nullSafeCodeGen(ctx, ev, (q, w) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cd = ctx.freshName("cd")
      val d = ctx.freshName("d")
      s"""
       |int $n = java.lang.Math.min($dim, $q.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  int $cd = (int) (($w.getLong($i / $cpw) >>> (4 * ($i % $cpw))) & 15L);
       |  double $d = ((double) $q.$get($i)) - ($minsRef[$i] + $cd * $scalesRef[$i]);
       |  $acc += $d * $d;
       |}
       |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "sq4_l2"
}
