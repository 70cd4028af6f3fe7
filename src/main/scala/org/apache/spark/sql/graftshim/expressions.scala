package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType, StringType}

/** Cosine similarity over two `ARRAY<FLOAT>` embedding columns as a native
  * Catalyst expression with codegen — the hot loop of vector KNN, semantic
  * neighbor linking, creative association and clustering (reference semantics:
  * cosine distance over the Qdrant collection, `/root/reference/automem/stores/
  * runtime_clients.py:137-147`; pairwise cosine `consolidation.py:104-118`).
  *
  * Accumulates in double; the exact operation order
  * (`dot / (sqrt(nx) * sqrt(ny))`, zero-norm → 0.0) is part of the contract —
  * the DuckDB oracle mirrors it term for term. Lives under the `sql` package
  * because `AbstractDataType` (needed for implicit input casts) is
  * `private[sql]`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    CosineSimilarity.compute(xs, ys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftshim.CosineSimilarity.compute(" +
        s"$a.toFloatArray(), $b.toFloatArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Shared by interpreted eval and generated code. Mismatched lengths
    * ZERO-PAD the shorter vector: the dot product runs over the common
    * prefix but each norm covers its OWN full vector — truncating the norms
    * to the prefix would score a malformed short vector as a perfect match
    * against any vector sharing its prefix (e.g. [1,1] vs [1] = 1.0
    * instead of 0.707), silently merging it in every dedup/cluster
    * consumer. Zero-padding is also exactly what the DuckDB oracles compute
    * (parallel unnest pads the short side with NULLs; NULL products drop
    * out of the dot sum while both norms sum their full arrays).
    */
  def compute(xs: Array[Float], ys: Array[Float]): Double = {
    val n = math.min(xs.length, ys.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val x = xs(i).toDouble; val y = ys(i).toDouble
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    var j = n
    while (j < xs.length) { val x = xs(j).toDouble; nx += x * x; j += 1 }
    var k = n
    while (k < ys.length) { val y = ys(k).toDouble; ny += y * y; k += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}

/** Cosine similarity between an int8-QUANTIZED stored vector (raw bytes +
  * per-vector affine scale/offset, see `VectorFunctions.quantizeInt8`) and
  * a float query vector, as one codegen'd expression — the hot loop of the
  * quantized IVF scan (`IvfIndex.buildQuantized`). Dequantization happens
  * inside the loop (`x_i = (b_i + 127) * scale + offset`), so the scan
  * never materializes a float array per row; the zero-pad norm semantics
  * match [[CosineSimilarity]] exactly.
  */
case class Int8CosineSimilarity(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, DoubleType, DoubleType, ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_cosine_similarity"

  override def nullSafeEval(b: Any, s: Any, o: Any, q: Any): Any =
    Int8CosineSimilarity.compute(b.asInstanceOf[Array[Byte]],
      s.asInstanceOf[Double], o.asInstanceOf[Double],
      q.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s, o, q) =>
      s"${ev.value} = org.apache.spark.sql.graftshim.Int8CosineSimilarity" +
        s".compute($b, $s, $o, $q.toFloatArray());")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, fo: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = fo)
}

/** Asymmetric-distance (ADC) score of a PQ code row against a query's
  * per-subspace lookup table (Jégou et al. 2011 §III.B; FAISS IVFADC) as a
  * native codegen'd expression — the hot loop of the PQ serving channel's
  * code scan (`graft.domain.BatchRecall.PqChannel`). `code` is the stored
  * `ARRAY<INT>` (m sub-centroid indexes), `lut` the query's m × ksub
  * `ARRAY<ARRAY<DOUBLE>>` dot-product table (a bounded driver-computed
  * parameter); the score is Σ_j lut(j)(code(j)) — m array lookups + adds
  * per row.
  *
  * Replaces the r17 interpreted `aggregate(zip_with(code, lut,
  * element_at), 0.0, +)` form, whose per-row HOF overhead made the PQ
  * channel LOSE on compute against a page-cached fp32 brute scan
  * (IvfServeScaleProbe, 10⁶ rows: 464-686 vs 301 ms/q — the r17 VERDICT's
  * one `weak` grade). The accumulation order (j ascending from 0.0) is
  * IDENTICAL to the old fold, so results are bitwise-unchanged
  * (PqChannelSpec pins the swap).
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
      ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override def nullSafeEval(c: Any, l: Any): Any =
    AdcScore.compute(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = org.apache.spark.sql.graftshim.AdcScore.compute($c, $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  /** Shared by interpreted eval and generated code. Runs over the common
    * prefix of (code, lut) — same as the zip_with it replaces, which
    * zips to the longer side but a null-padded pair would have nulled the
    * whole sum; well-formed rows always have |code| = |lut| = m. Operates
    * on ArrayData directly (no array materialization per row).
    */
  def compute(code: ArrayData, lut: ArrayData): Double = {
    val m = math.min(code.numElements(), lut.numElements())
    var acc = 0.0
    var j = 0
    while (j < m) {
      val sub = lut.getArray(j)
      val c = code.getInt(j)
      // named failure on a corrupt/oversized code (ADVICE r18): the
      // replaced non-ANSI element_at returned NULL here (nulling the
      // sum), while UnsafeArrayData.getDouble on an out-of-range index
      // reads out of bounds and yields a silently GARBAGE ranking —
      // worse than any crash. ksub is small (16-64), so the two bounds
      // compares are noise next to the lookup itself.
      if (c < 0 || c >= sub.numElements())
        throw new IllegalArgumentException(
          s"adc_score: code[$j] = $c out of range for its " +
            s"${sub.numElements()}-entry LUT — corrupt PQ code data")
      acc += sub.getDouble(c)
      j += 1
    }
    acc
  }
}

/** [[AdcScore]] with the lookup table selected from a LITERAL table of
  * per-query LUTs by a per-row index: Σ_j luts(idx)(j)(code(j)).
  *
  * Why a third argument instead of a `lut` column: the batch PQ channel
  * joins each scanned code row with its query's probe row, and a
  * per-row `lut` COLUMN materializes the m × ksub double table
  * (~2 KB) onto every joined row — at 10⁶ rows × nprobe cells that is
  * gigabytes through the scoring stage and the per-qid cut's shuffle,
  * and it dominated the channel's serving cost (IvfServeScaleProbe r18:
  * pq_n4 393 ms/q vs brute 278 with the row-carried table). As a
  * literal, the full nq × m × ksub table is ONE object per task; the
  * row carries a 4-byte index.
  */
case class AdcScoreAt(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.IntegerType,
      ArrayType(ArrayType(ArrayType(DoubleType))))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score_at"

  override def nullSafeEval(c: Any, i: Any, ls: Any): Any =
    AdcScore.compute(c.asInstanceOf[ArrayData],
      ls.asInstanceOf[ArrayData].getArray(i.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, i, ls) =>
      s"${ev.value} = org.apache.spark.sql.graftshim.AdcScore.compute(" +
        s"$c, $ls.getArray($i));")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

object Int8CosineSimilarity {
  /** Same contract as [[CosineSimilarity.compute]] (zero-pad the shorter
    * side in the norms), with the stored side dequantized element-wise.
    */
  def compute(bs: Array[Byte], scale: Double, offset: Double,
      q: Array[Float]): Double = {
    val n = math.min(bs.length, q.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val x = (bs(i).toDouble + 127.0) * scale + offset
      val y = q(i).toDouble
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    var j = n
    while (j < bs.length) {
      val x = (bs(j).toDouble + 127.0) * scale + offset
      nx += x * x; j += 1
    }
    var k = n
    while (k < q.length) { val y = q(k).toDouble; ny += y * y; k += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}

/** Rolling-hash document fingerprint over a token array as ONE codegen'd
  * expression — the hot loop of `q_fp_rolling` / corpus fingerprinting.
  * Bitwise-identical to the higher-order-function form it replaces
  * (`transform(tokens, t -> conv(substring(md5(t),1,8),16,10)::long)`
  * folded by `(h, x) -> (h*31 + x) % 1000000007`, single-token arrays
  * return their own hash): the first 8 hex chars of an md5 are its first
  * 4 bytes read as an unsigned int, and the fold runs in the same order
  * with the same modulus. The HOF form evaluated three interpreted
  * lambdas per token (transform + slice + aggregate are not codegen'd);
  * this runs one tight loop sharing a thread-local MessageDigest.
  * A null token anywhere nulls the result (md5(null) poisoned the HOF
  * fold the same way); an empty array returns null (unreachable via
  * `tokens()`, which yields >= 1 element for any string).
  */
case class RollingFingerprintHash(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp_hash"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RollingFingerprintHash.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // ctx.freshName, not a fixed local (ADVICE r19): two instances of
      // this expression compiled into one codegen scope (e.g. two
      // fingerprint columns over a non-nullable child, where nullSafeExec
      // emits no brace block) would declare the same variable twice and
      // fall back to interpreted eval — the exact path this expression
      // exists to remove.
      val boxed = ctx.freshName("graftRfp")
      s"""java.lang.Long $boxed = org.apache.spark.sql.graftshim
         |  .RollingFingerprintHash.compute($a);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingFingerprintHash {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Null (boxed) when the array is empty or any token is null — the HOF
    * form's null propagation. Otherwise the exact fold described above.
    */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    val digest = md.get()
    def tokHash(i: Int): Long = {
      digest.reset()
      val d = digest.digest(arr.getUTF8String(i).getBytes)
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    var h = tokHash(0)
    var j = 1
    while (j < n) { h = (h * 31L + tokHash(j)) % 1000000007L; j += 1 }
    h
  }
}

/** One MinHash component (min md5 over salted tokens) as ONE codegen'd
  * expression — the hot loop of the MinHash/LSH dedup family. Bitwise-
  * identical to the HOF form it replaces
  * (`array_min(transform(array_distinct(tokens), t -> md5(t || salt)))`):
  * the minimum over duplicates equals the minimum over distinct values
  * (so the dedup pass is dropped, not emulated), md5 hex strings order
  * exactly as their digest bytes (the nibble-to-hex-char map is monotone),
  * and `array_min` skips null elements, as does this loop. Returns null
  * for an empty array / all-null tokens, like `array_min`.
  */
case class MinhashMinHex(child: Expression, salt: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "minhash_min_hex"
  override def nullable: Boolean = true

  private lazy val saltBytes = salt.getBytes("UTF-8")

  override def nullSafeEval(a: Any): Any =
    MinhashMinHex.compute(a.asInstanceOf[ArrayData], saltBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("saltBytes", saltBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.graftshim
         |  .MinhashMinHex.compute($a, $saltRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinhashMinHex {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  def compute(arr: ArrayData,
      saltBytes: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val n = arr.numElements()
    val digest = md.get()
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        digest.reset()
        digest.update(arr.getUTF8String(i).getBytes)
        digest.update(saltBytes)
        val d = digest.digest()
        if (best == null || unsignedLess(d, best)) best = d
      }
      i += 1
    }
    if (best == null) null
    else {
      val out = new Array[Char](32)
      var k = 0
      while (k < 16) {
        out(2 * k) = hexChars((best(k) >> 4) & 0xf)
        out(2 * k + 1) = hexChars(best(k) & 0xf)
        k += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(new String(out))
    }
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }
}
