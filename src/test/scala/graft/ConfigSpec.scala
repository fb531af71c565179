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
}
