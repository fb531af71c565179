package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JIT-compiled row kernels for the unigram-LM lattice family
  * (`graft.functions.Unigram`) — the Viterbi decode, the soft-EM
  * forward/backward expected counts, and the FFBS sampler, each as ONE
  * codegen'd expression over (word, piece-score map).
  *
  * Why (round 17, guide §1.2 step 2 / §4.1): the HOF `aggregate` folds
  * these replace are CodegenFallback — every DP step walks an
  * interpreted expression tree, `element_at` over a Catalyst map is a
  * LINEAR scan of up to len×maxPieceLen entries, and the fold's
  * `concat(acc, array(…))` rebuilds the accumulator array per position
  * (O(len²) copies per word). The kernels do the same arithmetic in a
  * JVM loop over a hashed score map: O(len×maxPieceLen) with O(1)
  * lookups, no per-step allocation, inside whole-stage codegen (so the
  * multi-field reads of the returned struct are subexpression-eliminated
  * instead of needing a persist barrier).
  *
  * BIT-EXACTNESS is the contract (every consumer is hash-pinned against
  * a DuckDB oracle): each kernel replicates its HOF twin's arithmetic
  * operation-for-operation in the same order — long candidate sums, the
  * ascending-piece-length log-sum-exp accumulation, `(x).toDouble/1e6`
  * placement, `floor(…+0.5).toLong` quantization, `(score, len)`
  * lexicographic tie-breaks, the seeded md5-slice draw and its
  * cumulative-weight walk, and the null propagation of infeasible
  * lattice positions. Positions count CODE POINTS (Spark `length`/
  * `substring` semantics), not UTF-16 chars. Parity is pinned by the
  * unchanged oracle gates (unigram_learn / _soft / _segment /
  * segment_soft / sample_segments / tokenize_unigram_viterbi) and
  * BpeSpec's plain-JVM replicas. */
object UnigramDp {

  /** (code points, score map) of one input row — the shared decode. */
  private[plans] final class WordCtx(w: UTF8String, m: MapData) {
    val cps: Array[Int] = {
      val s = w.toString
      val out = new Array[Int](s.codePointCount(0, s.length))
      var ci = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        out(ci) = cp
        ci += 1
        i += Character.charCount(cp)
      }
      out
    }
    val n: Int = cps.length
    val map = new java.util.HashMap[String, java.lang.Long](
      m.numElements() * 2)
    locally {
      val ks = m.keyArray(); val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        // a null map value behaves as an absent piece in every HOF twin
        // (`element_at(m, k).isNotNull` guards each use) — skip it
        if (!vs.isNullAt(i)) map.put(ks.getUTF8String(i).toString, vs.getLong(i))
        i += 1
      }
    }
    def sub(startCp0: Int, lenCp: Int): String =
      new String(cps, startCp0, lenCp)
    def score(startCp0: Int, lenCp: Int): java.lang.Long =
      map.get(sub(startCp0, lenCp))
  }

  /** Quantized log-sum-exp of the non-null candidates, accumulated in
    * the given (ascending piece-length) order — `Unigram.lse` exactly:
    * mx = max; se = Σ exp((c−mx)/1e6); floor(mx + ln(se)·1e6 + 0.5). */
  private[plans] def lseOf(cands: Array[java.lang.Long],
      cnt: Int): java.lang.Long = {
    var mx = Long.MinValue
    var any = false
    var i = 0
    while (i < cnt) {
      val c = cands(i)
      if (c != null) { any = true; if (c.longValue > mx) mx = c.longValue }
      i += 1
    }
    if (!any) return null
    var se = 0.0
    i = 0
    while (i < cnt) {
      val c = cands(i)
      if (c != null) se += Math.exp((c.longValue - mx).toDouble / 1e6)
      i += 1
    }
    java.lang.Long.valueOf(
      Math.floor(mx.toDouble + Math.log(se) * 1e6 + 0.5).toLong)
  }

  /** Forward lattice over the (possibly scaled) score map —
    * `Unigram.forwardLattice` exactly: a(0) = 0, a(i) = lse over
    * l = 1..min(mpl, i) of a(i−l) + s(word[i−l+1..i]); null where no
    * candidate is feasible (and nulls propagate as absent candidates). */
  private[plans] def forward(ctx: WordCtx, mpl: Int): Array[java.lang.Long] = {
    val n = ctx.n
    val arr = new Array[java.lang.Long](n + 1)
    arr(0) = 0L
    val cands = new Array[java.lang.Long](mpl)
    var i = 1
    while (i <= n) {
      val lm = Math.min(mpl, i)
      var l = 1
      while (l <= lm) {
        val s = ctx.score(i - l, l)
        val prev = arr(i - l)
        cands(l - 1) =
          if (s != null && prev != null) java.lang.Long.valueOf(prev + s)
          else null
        l += 1
      }
      arr(i) = lseOf(cands, lm)
      i += 1
    }
    arr
  }
}

/** Viterbi decode of one word under its piece-score map — fuses
  * `segmentWith`'s DP fold and backward walk into one kernel. Returns
  * struct(score_micronats: nullable long = best full-word score,
  * ps: array<string> = the decoded pieces, left to right). Tie-break:
  * (score, piece length) lexicographic max — longest last piece wins,
  * exactly the HOF struct array_max. */
case class ViterbiSegment(left: Expression, right: Expression, mpl: Int)
    extends BinaryExpression {
  require(mpl >= 1)

  override def dataType: DataType = StructType(Seq(
    StructField("score", LongType, nullable = true),
    StructField("ps", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def nullSafeEval(w: Any, m: Any): Any =
    compute(w.asInstanceOf[UTF8String], m.asInstanceOf[MapData])

  def compute(w: UTF8String, m: MapData): InternalRow = {
    val ctx = new UnigramDp.WordCtx(w, m)
    val n = ctx.n
    // best(i) = SQL best[i+1]; ptr(i-1) = chosen last-piece length at i
    val best = new Array[java.lang.Long](n + 1)
    best(0) = 0L
    val ptr = new Array[Int](Math.max(n, 1))
    var i = 1
    while (i <= n) {
      var bestSc: java.lang.Long = null
      var bestL = 0
      val lm = Math.min(mpl, i)
      var l = 1
      while (l <= lm) {
        val s = ctx.score(i - l, l)
        val prev = best(i - l)
        if (s != null && prev != null) {
          val sc = prev + s
          if (bestSc == null || sc > bestSc.longValue ||
              (sc == bestSc.longValue && l > bestL)) {
            bestSc = sc; bestL = l
          }
        }
        l += 1
      }
      best(i) = bestSc
      ptr(i - 1) = if (bestL == 0) 1 else bestL // coalesce(top.l, 1)
      i += 1
    }
    // backward walk: n fold steps, each pos > 0 step consumes ptr(pos)
    val rev = new ArrayBuffer[UTF8String](n)
    var pos = n
    var step = 0
    while (step < n) {
      if (pos > 0) {
        val l = ptr(pos - 1)
        rev += UTF8String.fromString(ctx.sub(pos - l, l))
        pos -= l
      }
      step += 1
    }
    val ps = new Array[Any](rev.length)
    var k = 0
    while (k < rev.length) { ps(k) = rev(rev.length - 1 - k); k += 1 }
    new GenericInternalRow(Array[Any](best(n), new GenericArrayData(ps)))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("viterbiSegment", this,
      classOf[ViterbiSegment].getName)
    nullSafeCodeGen(ctx, ev, (w, m) => s"${ev.value} = $ref.compute($w, $m);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ViterbiSegment =
    copy(left = newLeft, right = newRight)
}

object ViterbiSegment {
  def apply(word: Column, m: Column, mpl: Int): Column =
    GraftSql.column(ViterbiSegment(
      GraftSql.expression(word), GraftSql.expression(m), mpl))
}

/** Soft-EM expected piece occurrences of one word — fuses `softCounts`'
  * forward/backward lattice folds and the per-(start, len) occurrence
  * expansion. Returns array<struct<piece: string, eq: nullable long>>,
  * one entry per IN-VOCABULARY occurrence in ascending (start, len)
  * order; eq = floor(exp((α(i)+s+β(i+l)−Z)/1e6)·1e6+0.5) in microcounts,
  * null when an infeasible lattice position nulls the sum (matching the
  * HOF's null propagation — such entries sum to nothing downstream). */
case class LatticeOcc(left: Expression, right: Expression, mpl: Int)
    extends BinaryExpression {
  require(mpl >= 1)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("eq", LongType, nullable = true))), containsNull = false)

  override def nullSafeEval(w: Any, m: Any): Any =
    compute(w.asInstanceOf[UTF8String], m.asInstanceOf[MapData])

  def compute(w: UTF8String, m: MapData): ArrayData = {
    val ctx = new UnigramDp.WordCtx(w, m)
    val n = ctx.n
    val arrF = UnigramDp.forward(ctx, mpl)
    // backward, built right-to-left: arrB(0) = 0 = beta(n+1);
    // step j fills position i = n − j + 1 from arrB(j − l)
    val arrB = new Array[java.lang.Long](n + 1)
    arrB(0) = 0L
    val cands = new Array[java.lang.Long](mpl)
    var j = 1
    while (j <= n) {
      val i = n - j + 1
      val lm = Math.min(mpl, j)
      var l = 1
      while (l <= lm) {
        val s = ctx.score(i - 1, l)
        val prev = arrB(j - l)
        cands(l - 1) =
          if (s != null && prev != null) java.lang.Long.valueOf(s + prev)
          else null
        l += 1
      }
      arrB(j) = UnigramDp.lseOf(cands, lm)
      j += 1
    }
    val z = arrF(n)
    val out = new ArrayBuffer[Any](n * mpl)
    var i2 = 1
    while (i2 <= n) {
      val lm = Math.min(mpl, n - i2 + 1)
      var l = 1
      while (l <= lm) {
        val s = ctx.score(i2 - 1, l)
        if (s != null) {
          val f = arrF(i2 - 1)
          val b = arrB(n + 1 - (i2 + l))
          val eq: java.lang.Long =
            if (f != null && b != null && z != null)
              java.lang.Long.valueOf(Math.floor(Math.exp(
                (f.longValue + s.longValue + b.longValue - z.longValue)
                  .toDouble / 1e6) * 1e6 + 0.5).toLong)
            else null
          out += new GenericInternalRow(Array[Any](
            UTF8String.fromString(ctx.sub(i2 - 1, l)), eq))
        }
        l += 1
      }
      i2 += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("latticeOcc", this,
      classOf[LatticeOcc].getName)
    nullSafeCodeGen(ctx, ev, (w, m) => s"${ev.value} = $ref.compute($w, $m);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LatticeOcc =
    copy(left = newLeft, right = newRight)
}

object LatticeOcc {
  def apply(word: Column, m: Column, mpl: Int): Column =
    GraftSql.column(LatticeOcc(
      GraftSql.expression(word), GraftSql.expression(m), mpl))
}

/** FFBS subword-regularization sampler of one word — fuses
  * `sampleSegments`' temperature scaling, forward lattice, and the
  * nSamples seeded backward walks. Returns array<array<string>>: entry
  * k−1 = the pieces of sample k (left to right). The draw replicates
  * the HOF form exactly: integer microprob weights in ascending piece
  * length, h = last-4-md5-bytes("sseg|seed|word|k|step") mod Σw, first
  * l whose cumulative weight exceeds h (a zero weight sum nulls the
  * draw and the step consumes an empty piece — unreachable by the
  * quantization floor argument, replicated anyway). */
case class LatticeSample(left: Expression, right: Expression, mpl: Int,
    nSamples: Int, alphaPpm: Long, seed: String)
    extends BinaryExpression {
  require(mpl >= 1 && nSamples >= 1 && alphaPpm > 0)

  override def dataType: DataType = ArrayType(
    ArrayType(StringType, containsNull = false), containsNull = false)

  override def nullSafeEval(w: Any, m: Any): Any =
    compute(w.asInstanceOf[UTF8String], m.asInstanceOf[MapData])

  def compute(w: UTF8String, m: MapData): ArrayData = {
    val ctx = new UnigramDp.WordCtx(w, m)
    // temperature scaling ONCE, in place (the transform_values twin):
    // s_a = floor((s · alphaPpm).toDouble / 1e6 + 0.5) — long multiply
    // first, exactly the HOF's (v * lit(alphaPpm)).cast("double")
    val it = ctx.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.setValue(Math.floor(
        (e.getValue.longValue * alphaPpm).toDouble / 1e6 + 0.5).toLong)
    }
    val n = ctx.n
    val arrF = UnigramDp.forward(ctx, mpl)
    val ws = w.toString
    val md = SimHash64.localMd5.get()
    val wArr = new Array[java.lang.Long](mpl)
    val samples = new Array[Any](nSamples)
    var k = 1
    while (k <= nSamples) {
      val rev = new ArrayBuffer[UTF8String](n)
      var pos = n
      var step = 1
      while (step <= n) {
        if (pos > 0) {
          var wSum = 0L
          var l = 1
          while (l <= mpl) {
            wArr(l - 1) = null
            if (l <= pos) {
              val s = ctx.score(pos - l, l)
              if (s != null) {
                val f1 = arrF(pos - l)
                val f2 = arrF(pos)
                if (f1 != null && f2 != null) {
                  val wv = Math.floor(Math.exp(
                    (f1.longValue + s.longValue - f2.longValue)
                      .toDouble / 1e6) * 1e6 + 0.5).toLong
                  wArr(l - 1) = wv
                  wSum += wv
                }
              }
            }
            l += 1
          }
          // pmod(slice32(md5(…)), wSum); wSum == 0 → null draw → the
          // pick fold's otherwise-branch on every candidate → l = 0
          val hNull = wSum == 0L
          var h = 0L
          if (!hNull) {
            md.reset()
            md.update(("sseg|" + seed + "|" + ws + "|" + k + "|" + step)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val d = md.digest()
            val slice = ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
              ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
            h = slice % wSum
          }
          var cum = 0L
          var chosen = 0
          var l2 = 1
          while (l2 <= mpl) {
            val wv = wArr(l2 - 1)
            if (chosen == 0 && wv != null) {
              if (!hNull && h < cum + wv.longValue) chosen = l2
              else cum += wv.longValue
            }
            l2 += 1
          }
          rev += UTF8String.fromString(ctx.sub(pos - chosen, chosen))
          pos -= chosen
        }
        step += 1
      }
      val ps = new Array[Any](rev.length)
      var q = 0
      while (q < rev.length) { ps(q) = rev(rev.length - 1 - q); q += 1 }
      samples(k - 1) = new GenericArrayData(ps)
      k += 1
    }
    new GenericArrayData(samples)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("latticeSample", this,
      classOf[LatticeSample].getName)
    nullSafeCodeGen(ctx, ev, (w, m) => s"${ev.value} = $ref.compute($w, $m);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LatticeSample =
    copy(left = newLeft, right = newRight)
}

object LatticeSample {
  def apply(word: Column, m: Column, mpl: Int, nSamples: Int,
      alphaPpm: Long, seed: String): Column =
    GraftSql.column(LatticeSample(GraftSql.expression(word),
      GraftSql.expression(m), mpl, nSamples, alphaPpm, seed))
}
