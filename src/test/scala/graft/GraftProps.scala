package graft

import graft.config.GraftConfig
import graft.functions.Templates
import graft.operators.{Partitioners, Transforms}
import graft.spec.TableSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Pure (non-Spark) property-based tests — SURVEY.md §5 item 2. */
object GraftProps extends Properties("graft") {

  val weightsGen: Gen[Seq[(Int, Int)]] = for {
    n <- Gen.choose(1, 6)
    ws <- Gen.listOfN(n, Gen.choose(1, 9))
  } yield ws.zipWithIndex.map { case (w, i) => (i, w) }

  property("smoothSchedule emits each partition exactly weight times per period") =
    forAll(weightsGen) { ws =>
      val sched = Partitioners.smoothSchedule(ws)
      sched.size == ws.map(_._2).sum &&
        ws.forall { case (p, w) => sched.count(_ == p) == w }
    }

  property("weightedSchedule emits each partition exactly weight times per period") =
    forAll(weightsGen) { ws =>
      val sched = Partitioners.weightedSchedule(ws)
      sched.size == ws.map(_._2).sum &&
        ws.forall { case (p, w) => sched.count(_ == p) == w }
    }

  val codebookGen: Gen[Seq[Seq[Seq[Double]]]] = for {
    m <- Gen.choose(1, 4)
    dsub <- Gen.choose(1, 4)
    ks <- Gen.choose(1, 4)
    books <- Gen.listOfN(m, Gen.listOfN(ks,
      Gen.listOfN(dsub, Gen.choose(-5.0, 5.0))))
  } yield books.map(_.map(_.toSeq: Seq[Double]).toSeq: Seq[Seq[Double]])

  property("PQ adcTable: non-negative everywhere; exactly zero at a matching centroid") =
    forAll(codebookGen) { books =>
      val model = graft.functions.PQ.Model(books)
      // query assembled from the FIRST centroid of every subspace
      val q = books.flatMap(_.head)
      val table = graft.functions.PQ.adcTable(q, model)
      table.flatten.forall(_ >= 0L) &&
        table.forall(row => row.head == 0L)
    }

  property("PQ adcTable: shifting the query by a constant never decreases a zero term") =
    forAll(codebookGen, Gen.choose(0.5, 2.0)) { (books, delta) =>
      val model = graft.functions.PQ.Model(books)
      val q = books.flatMap(_.head).map(_ + delta)
      val table = graft.functions.PQ.adcTable(q, model)
      // the formerly-exact centroid now sits delta away in every dim
      table.forall(row => row.head > 0L)
    }

  val fieldGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("template fields extraction finds every placeholder in order") =
    forAll(Gen.listOf(fieldGen)) { fields =>
      val t = fields.map(f => s"x %($f)s").mkString(" y ")
      Templates.fields(t) == fields
    }

  property("properties parse: last occurrence of a key wins") =
    forAll(fieldGen, Gen.listOf(Gen.identifier)) { (key, values) =>
      val text = values.map(v => s"$key = $v").mkString("\n")
      values.isEmpty ||
        GraftConfig.parseProperties(text).get(key.toLowerCase).contains(values.last)
    }

  property("resolver precedence: cli > env > props > default") = {
    val vGen = Gen.identifier.map(_.take(10))
    forAll(Gen.option(vGen), Gen.option(vGen), Gen.option(vGen), vGen) {
      (cli, env, prop, default) =>
        val r = GraftConfig.Resolver(
          props = prop.map(p => Map("sec_opt" -> p)).getOrElse(Map.empty),
          env = env.map(e => Map("ENV_NAME" -> e)).getOrElse(Map.empty),
          cli = cli.map(c => Map("ENV_NAME" -> c)).getOrElse(Map.empty))
        val got = r.str("SEC", "opt", "ENV_NAME", Some(default))
        got == cli.orElse(env).orElse(prop).orElse(Some(default))
    }
  }

  property("python->spark format translation quotes literal letters") =
    Prop(Transforms.pythonToSparkFormat("%Y-%m-%dT%H:%M:%S%z") ==
      "yyyy-MM-dd'T'HH:mm:ssxx") &&
      Prop(Transforms.pythonToSparkFormat("%Y-%m-%d %H:%M:%S.%f%z") ==
        "yyyy-MM-dd HH:mm:ss.SSSSSSxx")

  property("TableSpec parse: every column directive round-trips") =
    forAll(Gen.listOf(fieldGen.suchThat(_.nonEmpty))) { names =>
      val distinct = names.distinct
      val json = s"""{"columns": [${distinct.map(n =>
        s"""{"name": "$n", "renameTo": "${n}_r"}""").mkString(",")}]}"""
      val spec = TableSpec.parse(json)
      spec.renames == distinct.map(n => n -> s"${n}_r")
    }

  property("sortBy parse handles asc/desc/mixed") =
    forAll(Gen.listOf(Gen.zip(fieldGen, Gen.oneOf("", "asc", "desc", "DESC")))) { cols =>
      val s = cols.map { case (c, d) => if (d.isEmpty) c else s"$c $d" }.mkString(",")
      val parsed = GraftConfig.parseSortBy(s)
      parsed == cols.map { case (c, d) => (c, !d.equalsIgnoreCase("desc")) }
    }

  // ---- Solr parser properties ----

  /** Random well-formed query ASTs; rendered with explicit parens +
    * variable whitespace, and mirrored as the Column the parser must build. */
  private sealed trait SolrQ
  private case class STerm(f: String, t: String) extends SolrQ
  private case class SPrefix(f: String, p: String) extends SolrQ
  private case class SRange(f: String, lo: String, hi: String) extends SolrQ
  private case class SGroup(f: String, ts: List[String]) extends SolrQ
  private case class SAnd(a: SolrQ, b: SolrQ) extends SolrQ
  private case class SOr(a: SolrQ, b: SolrQ) extends SolrQ
  private case class SNot(a: SolrQ) extends SolrQ

  private val solrIdent: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val solrLeaf: Gen[SolrQ] = Gen.oneOf(
    Gen.zip(solrIdent, solrIdent).map { case (f, t) => STerm(f, t) },
    Gen.zip(solrIdent, solrIdent).map { case (f, p) => SPrefix(f, p) },
    Gen.zip(solrIdent, Gen.choose(0, 50), Gen.choose(51, 99)).map {
      case (f, lo, hi) => SRange(f, lo.toString, hi.toString) },
    Gen.zip(solrIdent, Gen.nonEmptyListOf(solrIdent).map(_.take(3))).map {
      case (f, ts) => SGroup(f, ts) })

  private def solrTree(depth: Int): Gen[SolrQ] =
    if (depth <= 0) solrLeaf
    else Gen.frequency(
      3 -> solrLeaf,
      1 -> Gen.zip(solrTree(depth - 1), solrTree(depth - 1)).map((SAnd.apply _).tupled),
      1 -> Gen.zip(solrTree(depth - 1), solrTree(depth - 1)).map((SOr.apply _).tupled),
      1 -> solrTree(depth - 1).map(SNot.apply))

  private def renderSolr(q: SolrQ): String = q match {
    case STerm(f, t) => s"$f:$t"
    case SPrefix(f, p) => s"$f:$p*"
    case SRange(f, lo, hi) => s"$f:[$lo TO $hi]"
    case SGroup(f, ts) => s"$f:(${ts.mkString(" OR ")})"
    case SAnd(a, b) => s"( ${renderSolr(a)} AND ${renderSolr(b)} )"
    case SOr(a, b) => s"(${renderSolr(a)} OR ${renderSolr(b)})"
    case SNot(a) => s"NOT (${renderSolr(a)})"
  }

  private def expectedSolr(q: SolrQ): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    q match {
      case STerm(f, t) => col(f) === lit(t)
      case SPrefix(f, p) => col(f).startsWith(p)
      case SRange(f, lo, hi) => (col(f) >= lit(lo)) && (col(f) <= lit(hi))
      case SGroup(f, ts) =>
        ts.map(t => col(f) === lit(t): org.apache.spark.sql.Column).reduce(_ || _)
      case SAnd(a, b) => expectedSolr(a) && expectedSolr(b)
      case SOr(a, b) => expectedSolr(a) || expectedSolr(b)
      case SNot(a) => !expectedSolr(a)
    }
  }

  property("solr parser: any well-formed query parses to the exact predicate") =
    forAll(solrTree(3)) { q =>
      val parsed = graft.operators.Filters.solrPredicate(renderSolr(q))
      parsed.toString == expectedSolr(q).toString
    }

  property("chunk-count formula == minimal covering window count, any (n, w, s)") =
    forAll(Gen.choose(1, 500), Gen.choose(1, 64), Gen.choose(1, 64)) {
      (n: Int, width: Int, stride: Int) =>
        // the engine's closed form (TextAnalysis.chunk / its SQL oracle)
        val formula =
          if (n <= width) 1
          else math.floor((n - width + stride - 1).toDouble / stride).toInt + 1
        // brute force: smallest m such that window m-1 (start (m-1)*stride,
        // length width) reaches the last token
        var m = 1
        while ((m - 1) * stride + width < n) m += 1
        Prop(formula == m) :| s"n=$n w=$width s=$stride formula=$formula brute=$m"
    }

  val countsGen: Gen[Map[String, Long]] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.choose(1L, 1000000L))
  } yield cs.zipWithIndex.map { case (c, i) => s"s$i" -> c }.toMap

  property("temperatureRates: rates in (0,1], binding (smallest) stratum kept whole") =
    forAll(countsGen, Gen.oneOf(0.25, 0.5, 0.75, 1.0)) { (counts, t) =>
      val rates = graft.functions.Sampling.temperatureRates(counts, t)
      val inRange = rates.values.forall(r => r > 0.0 && r <= 1.0)
      // the binding stratum's rate is 1 up to a float ulp
      val binding = rates.values.max
      Prop(inRange && binding >= 1.0 - 1e-12) :| s"rates=$rates"
    }

  property("temperatureRates: T=1 keeps every stratum ~whole; T<1 flattens toward sqrt") =
    forAll(countsGen.suchThat(_.size >= 2)) { counts =>
      val id = graft.functions.Sampling.temperatureRates(counts, 1.0)
      val idWhole = id.values.forall(_ >= 1.0 - 1e-9)
      val flat = graft.functions.Sampling.temperatureRates(counts, 0.5)
      // kept counts under T=0.5 order INVERSELY to raw counts' share ratio:
      // kept_i/kept_j -> sqrt(c_i/c_j), so the max/min kept ratio is the
      // sqrt of the raw ratio (within float tolerance)
      val kept = counts.map { case (s, c) => s -> c * flat(s) }
      val rawRatio = counts.values.max.toDouble / counts.values.min
      val keptRatio = kept.values.max / kept.values.min
      Prop(idWhole && keptRatio <= math.sqrt(rawRatio) * (1 + 1e-9)) :|
        s"keptRatio=$keptRatio sqrt(raw)=${math.sqrt(rawRatio)}"
    }

  property("solr parser: malformed input throws, never mis-parses") = {
    val malformed = for {
      f <- solrIdent; t <- solrIdent
      bad <- Gen.oneOf(
        s"($f:$t",            // unbalanced paren
        s"$f:[1 TO",          // unterminated range
        s"$f:$t AND",         // dangling operator
        s"$f:$t OR OR $f:$t", // doubled operator
        s":$t",               // empty field
        s"$f:",               // empty term
        s"$f:()",             // empty field group
        s"""$f:"$t""",        // unterminated quote
        s"$f:$t $f:$t")       // two clauses, no operator
    } yield bad
    forAll(malformed) { s =>
      Prop(scala.util.Try(graft.operators.Filters.solrPredicate(s)).isFailure)
    }
  }

  // the dhash block-candidate pigeonhole: hamming <= 3 implies some
  // whole 14-bit block agrees — the exact-recall guarantee the
  // image-dedup joins rely on (pure bit math, mirrors
  // Multimodal.dhashNearDupPairs' key scheme)
  val hash56Gen: Gen[Long] = Gen.choose(0L, (1L << 56) - 1)
  val upTo3FlipsGen: Gen[Seq[Int]] = for {
    n <- Gen.choose(0, 3)
    bits <- Gen.listOfN(n, Gen.choose(0, 55))
  } yield bits
  private def blocks(h: Long): Seq[Long] =
    (0 to 3).map(t => (h >> (14 * t)) & 16383L)

  property("dhash pigeonhole: <= 3 flipped bits always leave a whole " +
    "block shared") =
    forAll(hash56Gen, upTo3FlipsGen) { (h, flips) =>
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val hamming = java.lang.Long.bitCount(h ^ h2)
      Prop(hamming > 3 || blocks(h).zip(blocks(h2)).exists(p => p._1 == p._2))
    }

  property("dhash blocks: sharing NO block implies hamming >= 4") =
    forAll(hash56Gen, hash56Gen) { (a, b) =>
      val noShared = blocks(a).zip(blocks(b)).forall(p => p._1 != p._2)
      Prop(!noShared || java.lang.Long.bitCount(a ^ b) >= 4)
    }
}
