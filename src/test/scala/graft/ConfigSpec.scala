package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.GraftConfig

/** YAML-subset config parsing + env fallback (reference config semantics:
  * pgwarehouse.py:52-58, 200-211).
  */
class ConfigSpec extends AnyFunSuite {

  test("nested parse with comments, quotes, and table options") {
    val cfg = GraftConfig.fromYaml(
      """# comment
        |source:
        |  dir: /src
        |  max_records: 500
        |warehouse:
        |  dir: "/wh"
        |tables:
        |  events:
        |    primary_key: event_id
        |    last_modified: ts
        |  parks:
        |    reload: true
        |  ignored:
        |    skip: true
        |""".stripMargin, env = Map.empty)
    assert(cfg.sourceDir == "/src")
    assert(cfg.warehouseDir == "/wh")
    assert(cfg.maxRecords.contains(500L))
    assert(cfg.dataDir == "/wh/_data", "data dir defaults under warehouse")
    assert(cfg.tables.keys.toSeq == Seq("events", "parks", "ignored"),
      "table order preserved")
    val ev = cfg.tables("events")
    assert(ev.primaryKey.contains("event_id") && ev.lastModified.contains("ts"))
    assert(cfg.tables("parks").reload)
    assert(cfg.tables("ignored").skip)
  }

  test("env fallback fills missing keys; config wins when both present") {
    val env = Map("GRAFT_SOURCE_DIR" -> "/env/src",
      "GRAFT_WAREHOUSE_DIR" -> "/env/wh", "GRAFT_MAX_RECORDS" -> "9")
    val cfg = GraftConfig.fromYaml("source:\n  dir: /cfg/src\n", env)
    assert(cfg.sourceDir == "/cfg/src", "config beats env")
    assert(cfg.warehouseDir == "/env/wh", "env fills the gap")
    assert(cfg.maxRecords.contains(9L))
  }

  test("missing mandatory dirs fail loudly") {
    intercept[IllegalArgumentException] {
      GraftConfig.fromYaml("tables:\n  t:\n    reload: true\n", env = Map.empty)
    }
  }

  test("the init template itself parses to clean values (inline comments stripped)") {
    val cfg = GraftConfig.fromYaml(GraftConfig.template, env = Map.empty)
    assert(cfg.sourceDir == "/path/to/source/parquet",
      "trailing '# or env ...' comment must not leak into the value")
    assert(cfg.warehouseDir == "/path/to/warehouse/parquet")
    assert(cfg.tables.contains("events"))
    // an inline comment after a numeric value must not break parsing
    val c2 = GraftConfig.fromYaml(
      "source:\n  dir: /s\n  max_records: 10000 # cap\nwarehouse:\n  dir: /w\n",
      env = Map.empty)
    assert(c2.maxRecords.contains(10000L))
    // '#' inside a double-quoted value is literal, as in YAML
    val c3 = GraftConfig.fromYaml(
      "source:\n  dir: \"/data/run #1\"\nwarehouse:\n  dir: /w\n",
      env = Map.empty)
    assert(c3.sourceDir == "/data/run #1")
  }
}
