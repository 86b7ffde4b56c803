package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit-safe polynomial rolling-hash fingerprint over a string's
  * codepoints: h = fold(h * 31 + cp) mod 1e9+7. Small modulus keeps
  * every intermediate < 2^35 so the DuckDB oracle can replicate it in
  * BIGINT arithmetic (DuckDB errors on int64 overflow, so a full
  * 64-bit hash would not be oracle-checkable). Document fingerprinting
  * for shard-local dedup at ingest (SURVEY.md §2 t04).
  */
case class TextFingerprint(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName on every statement-level local: with a non-nullable
      // child the body is inlined unbraced, so fixed names collide
      // when one projection holds two instances of this expression
      val s0 = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
       |String $s0 = $c.toString();
       |long $h = 0L;
       |int $i = 0;
       |while ($i < $s0.length()) {
       |  int $cp = $s0.codePointAt($i);
       |  $h = ($h * 31L + $cp) % 1000000007L;
       |  $i += Character.charCount($cp);
       |}
       |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "text_fingerprint"
}

/** Parameterised polynomial rolling hash over a string's codepoints:
  * h = fold(h * mult + cp) mod `mod`. The generalisation of
  * TextFingerprint used to derive *oracle-replicable* token hashes:
  * two instances with different (mult, mod) combine into a ~60-bit
  * hash (h1 + h2 * 2^30) whose every intermediate fits in int64 on
  * both engines — ANSI-safe in Spark, overflow-safe in DuckDB BIGINT.
  * Keep mod ≲ 2^30 and mult small so mult * mod < 2^63.
  */
object PolyHash {
  /** SQL-registration builder: (mult, mod) must be foldable literals —
    * they parameterise the generated code, so a column argument can
    * never work. Checked here so SQL users get an analysis-time error
    * instead of an NPE from eval() on an unbound attribute.
    */
  def fromArgs(es: Seq[Expression]): PolyHash = {
    require(es.length == 3, s"poly_hash expects 3 arguments, got ${es.length}")
    def lit(e: Expression, name: String): Long = {
      require(e.foldable,
        s"poly_hash $name must be a foldable literal, got: ${e.sql}")
      e.eval() match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"poly_hash $name must be integral, got: $other")
      }
    }
    PolyHash(es.head, lit(es(1), "mult"), lit(es(2), "mod"))
  }
}

case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s0 = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
       |String $s0 = $c.toString();
       |long $h = 0L;
       |int $i = 0;
       |while ($i < $s0.length()) {
       |  int $cp = $s0.codePointAt($i);
       |  $h = ($h * ${mult}L + $cp) % ${mod}L;
       |  $i += Character.charCount($cp);
       |}
       |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "poly_hash"
}

/** All token hashes of an array<string> in ONE pass: for each element
  * both polynomial folds (31 mod 1e9+7, 131 mod 999999937) run in a
  * single codepoint loop and combine as h1 + h2 * 2^30 (< 2^61). The
  * fused form of `transform(arr, t -> poly_hash(t,31,...) +
  * poly_hash(t,131,...) * 2^30)` — one String materialisation and one
  * char walk per token instead of two. Values are identical to
  * Dedup.tokenHash60Sql's DuckDB replica.
  */
case class TokenHashes(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j).toString
      var h1 = 0L; var h2 = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h1 = (h1 * 31L + cp) % 1000000007L
        h2 = (h2 * 131L + cp) % 999999937L
        i += Character.charCount(cp)
      }
      out(j) = h1 + h2 * 1073741824L
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val s0 = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
       |int $n = $c.numElements();
       |long[] $out = new long[$n];
       |for (int $j = 0; $j < $n; $j++) {
       |  String $s0 = $c.getUTF8String($j).toString();
       |  long $h1 = 0L; long $h2 = 0L;
       |  int $i = 0;
       |  while ($i < $s0.length()) {
       |    int $cp = $s0.codePointAt($i);
       |    $h1 = ($h1 * 31L + $cp) % 1000000007L;
       |    $h2 = ($h2 * 131L + $cp) % 999999937L;
       |    $i += Character.charCount($cp);
       |  }
       |  $out[$j] = $h1 + $h2 * 1073741824L;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "token_hashes"
}

object RollingHashWindows {
  /** SQL-registration builder: winLen/base parameterise the generated
    * code, so they must be foldable literals.
    */
  def fromArgs(es: Seq[Expression]): RollingHashWindows = {
    require(es.length == 3,
      s"rolling_hash_windows expects 3 arguments, got ${es.length}")
    def lit(e: Expression, name: String): Long = {
      require(e.foldable,
        s"rolling_hash_windows $name must be a foldable literal, got: ${e.sql}")
      e.eval() match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"rolling_hash_windows $name must be integral, got: $other")
      }
    }
    val win = lit(es(1), "winLen")
    require(win >= 1 && win <= Int.MaxValue,
      s"rolling_hash_windows winLen out of range: $win")
    RollingHashWindows(es.head, win.toInt, lit(es(2), "base"))
  }
}

/** All `winLen`-codepoint window hashes of a string in ONE scan-local
  * pass: h(window) = fold(h * base + cp) in 64-bit OVERFLOW
  * arithmetic, maintained across positions by the rolling recurrence
  * h' = (h - cp_out * base^(winLen-1)) * base + cp_in — O(n) total
  * instead of O(n * winLen) per-window refolds, and 8 output bytes
  * per position instead of a winLen-char substring. Built for
  * character-level exact-substring decontamination (SURVEY.md §2
  * t13): this is a candidate PREFILTER only — mod-2^64 values are
  * deliberately NOT oracle-replicable (DuckDB BIGINT errors on
  * overflow), so correctness must come from substring-equality
  * verification joined behind the hash match, never from the hash.
  */
case class RollingHashWindows(child: Expression, winLen: Int, base: Long)
    extends UnaryExpression with Serializable {
  require(winLen >= 1, s"winLen must be >= 1, got $winLen")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** base^(winLen-1) mod 2^64 — the roll-out multiplier. */
  private lazy val pow: Long = {
    var p = 1L; var i = 0
    while (i < winLen - 1) { p *= base; i += 1 }
    p
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val cps = new Array[Int](s.length)
    var n = 0; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(n) = cp; n += 1
      i += Character.charCount(cp)
    }
    if (n < winLen)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val out = new Array[Long](n - winLen + 1)
    var h = 0L; var j = 0
    while (j < winLen) { h = h * base + cps(j); j += 1 }
    out(0) = h
    var w = 1
    while (w <= n - winLen) {
      h = (h - cps(w - 1) * pow) * base + cps(w + winLen - 1)
      out(w) = h
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s0 = ctx.freshName("s")
      val cps = ctx.freshName("cps")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      s"""
       |String $s0 = $c.toString();
       |int[] $cps = new int[$s0.length()];
       |int $n = 0;
       |int $i = 0;
       |while ($i < $s0.length()) {
       |  int $cp = $s0.codePointAt($i);
       |  $cps[$n++] = $cp;
       |  $i += Character.charCount($cp);
       |}
       |long[] $out = ($n < $winLen) ? new long[0] : new long[$n - $winLen + 1];
       |if ($n >= $winLen) {
       |  long $h = 0L;
       |  for (int $j = 0; $j < $winLen; $j++) { $h = $h * ${base}L + $cps[$j]; }
       |  $out[0] = $h;
       |  for (int $w = 1; $w <= $n - $winLen; $w++) {
       |    $h = ($h - $cps[$w - 1] * ${pow}L) * ${base}L + $cps[$w + $winLen - 1];
       |    $out[$w] = $h;
       |  }
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "rolling_hash_windows"
}

/** Sum of byte values of a binary payload — the checksum leg of the
  * multimodal decode stub (SURVEY.md §2 m01); codegen over BinaryType
  * shows the pattern any real byte-level feature extractor would use.
  */
case class ByteSum(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += bytes(i) & 0xff; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      s"""
       |long $acc = 0L;
       |byte[] $arr = $c;
       |for (int $i = 0; $i < $arr.length; $i++) { $acc += $arr[$i] & 0xff; }
       |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "byte_sum"
}
