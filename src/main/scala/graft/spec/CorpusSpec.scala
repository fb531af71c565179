package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import graft.functions.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Config-driven corpus pipeline — the reference's spec-file pattern
  * ([[TableSpec]]: `<table>.json` consumed by the workers) extended to the
  * training-data operators, so a whole corpus-prep run is declared, not
  * coded:
  *
  * {{{
  * {"filter":  {"minTokens": 5, "maxRepetition3": 0.5, "langs": ["en","es"]},
  *  "normalize": true,
  *  "dedup":   {"method": "exact" | "minhash", "threshold": 0.8},
  *  "sample":  {"strataCol": "lang", "rates": {"en": 0.5}, "default": 0.1},
  *  "sample":  {"strataCol": "lang", "temperature": 0.5},   // OR p^T mode
  *  "chunk":   {"width": 32, "stride": 24}}
  * }}}
  *
  * Stage order is fixed to the order a production pipeline wants: cheap
  * narrow filters first (shrink before any shuffle), normalization before
  * dedup (so near-identical texts hash together), dedup before sampling
  * (sampling a corpus with duplicates biases the mixture), chunking last
  * (the only row-multiplying stage). Every stage is one of the
  * gate-verified operators; the spec only composes them.
  */
final case class CorpusSpec(
    minTokens: Option[Int] = None,
    maxRepetition3: Option[Double] = None,
    langs: Seq[String] = Nil,
    normalize: Boolean = false,
    dedupMethod: Option[String] = None,
    dedupThreshold: Double = 0.8,
    sampleStrataCol: Option[String] = None,
    sampleRates: Map[String, Double] = Map.empty,
    sampleDefault: Double = 1.0,
    sampleTemperature: Option[Double] = None,
    chunkWidth: Option[Int] = None,
    chunkStride: Option[Int] = None)

object CorpusSpec {
  private val mapper = new ObjectMapper()

  def parse(json: String): CorpusSpec = {
    val root = mapper.readTree(json)
    def node(name: String): Option[JsonNode] = Option(root.get(name))
    val filter = node("filter")
    val sample = node("sample")
    val chunk = node("chunk")
    val dedup = node("dedup")
    CorpusSpec(
      minTokens = filter.flatMap(f => Option(f.get("minTokens")).map(_.asInt())),
      maxRepetition3 = filter.flatMap(f =>
        Option(f.get("maxRepetition3")).map(_.asDouble())),
      langs = filter.toSeq.flatMap(f => Option(f.get("langs")).toSeq
        .flatMap(_.elements().asScala.map(_.asText()))),
      normalize = node("normalize").exists(_.asBoolean()),
      dedupMethod = dedup.flatMap(d => Option(d.get("method")).map(_.asText())),
      dedupThreshold = dedup.flatMap(d =>
        Option(d.get("threshold")).map(_.asDouble())).getOrElse(0.8),
      sampleStrataCol = sample.flatMap(sm =>
        Option(sm.get("strataCol")).map(_.asText())),
      sampleRates = sample.flatMap(sm => Option(sm.get("rates"))).map { r =>
        r.fieldNames().asScala.map(k => k -> r.get(k).asDouble()).toMap
      }.getOrElse(Map.empty),
      sampleDefault = sample.flatMap(sm =>
        Option(sm.get("default")).map(_.asDouble())).getOrElse(1.0),
      sampleTemperature = sample.flatMap(sm =>
        Option(sm.get("temperature")).map(_.asDouble())),
      chunkWidth = chunk.flatMap(c => Option(c.get("width")).map(_.asInt())),
      chunkStride = chunk.flatMap(c => Option(c.get("stride")).map(_.asInt())))
  }

  /** Run the declared pipeline over a documents-shaped frame
    * (`idCol`, `textCol`, plus whatever the filters/sampling reference). */
  def run(df: DataFrame, spec: CorpusSpec,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    var out = df
    spec.langs match {
      case Nil => ()
      case ls => out = out.filter(col("lang").isin(ls: _*))
    }
    spec.minTokens.foreach { n =>
      out = out.filter(TextAnalysis.tokenCountWs(col(textCol)) >= n)
    }
    spec.maxRepetition3.foreach { r =>
      out = out.filter(TextAnalysis.repetitionRatio(col(textCol), 3) <= r)
    }
    if (spec.normalize)
      out = out.withColumn(textCol, TextAnalysis.normalize(col(textCol)))
    spec.dedupMethod.foreach {
      case "exact" => out = Dedup.exactDedup(out, textCol, idCol)
      case "minhash" =>
        val pairs = Dedup.minhashDedupPairs(out, idCol, textCol,
          threshold = spec.dedupThreshold)
        out = out.join(pairs.select(col("id_b").as(idCol)), Seq(idCol), "left_anti")
      case other => throw new IllegalArgumentException(
        s"unknown dedup method '$other' (exact | minhash)")
    }
    spec.sampleStrataCol.foreach { strata =>
      out = spec.sampleTemperature match {
        // temperature mode: target share ∝ observed^T — rates derived from
        // the post-dedup stratum counts (sampling after dedup, like rates)
        case Some(t) => Sampling.temperatureSample(out, idCol, strata, t)
        case None => Sampling.stratifiedSample(out, idCol, strata,
          spec.sampleRates, spec.sampleDefault)
      }
    }
    (spec.chunkWidth, spec.chunkStride) match {
      case (Some(w), Some(st)) => out = TextAnalysis.chunk(out, idCol, textCol, w, st)
      case (None, None) => ()
      case _ => throw new IllegalArgumentException(
        "chunk needs both width and stride")
    }
    out
  }
}
