package graft

import graft.config.GraftConfig
import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  val props =
    """# global settings (post-shim flat form: section_option)
      |enable_kafka = true
      |cassandra_fetch_size = 5000
      |cassandra_filter = event_type:click
      |kafka_topics = t1,t2
      |kafka_topics_prefix = pfx-
      |s3_object_key = events/%(id)s.json
      |""".stripMargin

  test("properties parse: comments, no-value keys, later key wins") {
    val m = GraftConfig.parseProperties(
      "# c\n; c2\na = 1\nb\na = 2\n[DEFAULT]\nkafka_acks: -1")
    assert(m("a") == "2" && m("b") == "" && m("kafka_acks") == "-1")
  }

  test("resolution priority: cli > env > properties > default (app.py:151-198)") {
    val base = GraftConfig.loadGlobal(props)
    assert(base.fetchSize == 5000 && base.enableKafka &&
      base.filter.contains("event_type:click") &&
      base.sinks.kafkaTopics == Seq("t1", "t2"))
    val withEnv = GraftConfig.loadGlobal(props,
      env = Map("CASSANDRA_FETCH_SIZE" -> "7000", "ENABLE_KAFKA" -> "false"))
    assert(withEnv.fetchSize == 7000 && !withEnv.enableKafka)
    val withCli = GraftConfig.loadGlobal(props,
      env = Map("CASSANDRA_FETCH_SIZE" -> "7000"),
      cli = Map("CASSANDRA_FETCH_SIZE" -> "9000"))
    assert(withCli.fetchSize == 9000)
    // untouched options keep defaults
    assert(base.keyspace == "hub" && base.timestampFormat ==
      "%Y-%m-%d %H:%M:%S.%f%z")
  }

  test("per-table overlay: table props + <TABLE>_ env over global (app.py:365-540)") {
    val global = GraftConfig.loadGlobal(props)
    val table = GraftConfig.loadTable("events", global,
      propertiesText = "cassandra_pages = 3\ncassandra_sort_by = ts desc, event_id",
      env = Map("EVENTS_CASSANDRA_FETCH_SIZE" -> "1000",
        "OTHER_CASSANDRA_FETCH_SIZE" -> "999"),
      specJson = Some("""{"columns": [{"name": "secret", "remove": true}]}"""))
    assert(table.table == "events")
    assert(table.fetchSize == 1000)          // table env wins
    assert(table.pages.contains(3))          // table props
    assert(table.sortBy == Seq(("ts", false), ("event_id", true)))
    assert(table.enableKafka)                // inherited from global
    assert(table.spec.removals == Seq("secret"))
    assert(table.sinks.kafkaTopicPrefix == "pfx-")
  }

  test("toPipelineConfig bridges to the executable pipeline") {
    val cfg = GraftConfig.loadGlobal(props).copy(table = "events",
      modifiedTimestampFilter = Some(123L))
    val p = cfg.toPipelineConfig
    assert(p.table == "events" && p.fetchSize == 5000 &&
      p.solrFilter.contains("event_type:click") &&
      p.watermarkMillis.contains(123L))
  }
  test("CorpusSpec: parse round-trip and spec-run == hand-composed pipeline") {
    import graft.spec.CorpusSpec
    import graft.functions.{Dedup, Sampling, TextAnalysis}
    import org.apache.spark.sql.functions._
    val spec = CorpusSpec.parse("""{
      "filter": {"minTokens": 5, "langs": ["en", "es"]},
      "normalize": true,
      "dedup": {"method": "exact"},
      "sample": {"strataCol": "lang", "rates": {"en": 0.5}, "default": 0.25},
      "chunk": {"width": 32, "stride": 24}}""")
    assert(spec.minTokens.contains(5) && spec.langs == Seq("en", "es"))
    assert(spec.normalize && spec.dedupMethod.contains("exact"))
    assert(spec.sampleRates == Map("en" -> 0.5) && spec.sampleDefault == 0.25)
    assert(spec.chunkWidth.contains(32) && spec.chunkStride.contains(24))

    val spark = GraftTestSpark.spark
    val docs = graft.sources.Tables.documents(spark, GraftTestSpark.Sf0001)
    val viaSpec = CorpusSpec.run(docs, spec)
      .select("doc_id", "chunk_idx", "chunk_text")
      .collect().map(_.toSeq).toSet
    val filtered = docs.filter(col("lang").isin("en", "es"))
      .filter(TextAnalysis.tokenCountWs(col("text")) >= 5)
      .withColumn("text", TextAnalysis.normalize(col("text")))
    val hand = TextAnalysis.chunk(
      Sampling.stratifiedSample(
        Dedup.exactDedup(filtered, "text", "doc_id"),
        "doc_id", "lang", Map("en" -> 0.5), 0.25),
      "doc_id", "text", 32, 24)
      .select("doc_id", "chunk_idx", "chunk_text")
      .collect().map(_.toSeq).toSet
    assert(viaSpec.nonEmpty)
    assert(viaSpec == hand)
  }
  test("CorpusSpec temperature sample path == Sampling.temperatureSample") {
    import graft.spec.CorpusSpec
    val spark = GraftTestSpark.spark
    val docs = graft.sources.Tables.documents(spark, GraftTestSpark.Sf0001)
    val spec = CorpusSpec.parse(
      """{"sample": {"strataCol": "lang", "temperature": 0.5}}""")
    assert(spec.sampleTemperature.contains(0.5))
    val viaSpec = CorpusSpec.run(docs, spec)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = graft.functions.Sampling
      .temperatureSample(docs, "doc_id", "lang", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSpec == direct && viaSpec.nonEmpty)
  }
  test("CorpusSpec minhash dedup path == Dedup.minhashSurvivors") {
    import graft.spec.CorpusSpec
    import graft.functions.Dedup
    val spark = GraftTestSpark.spark
    val docs = graft.sources.Tables.documents(spark, GraftTestSpark.Sf0001)
    val viaSpec = CorpusSpec.run(docs,
      CorpusSpec.parse("""{"dedup": {"method": "minhash", "threshold": 0.8}}"""))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = Dedup.minhashSurvivors(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSpec == direct && viaSpec.nonEmpty)
  }
}
