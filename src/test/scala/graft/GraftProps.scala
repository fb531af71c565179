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
}
