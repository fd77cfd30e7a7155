package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** Environment-drift sentinel (VERDICT r8 §next-7): the round-8 testdata
  * regeneration silently switched `events.ts` from TIMESTAMP(NANOS) to naive
  * TIMESTAMP(MICROS), which Spark 4 reads as TIMESTAMP_NTZ — and 12 queries
  * crashed before any contract test fired. This spec pins the post-
  * `Tables.table` schema (names + normalized type strings, in order) for
  * every corpus table, so the NEXT silent regeneration fails one obvious
  * test with a readable diff instead of a dozen queries.
  *
  * The pinned strings are the *normalized* contract — whatever timestamp
  * flavor the parquet footer holds (NANOS-as-long, NTZ, LTZ), the loader
  * must surface `timestamp` — so this spec holds across flavor drift and
  * only fails on a genuine contract change (column added/renamed/retyped).
  */
class CorpusContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** table → "name:normalizedSimpleTypeName" per column, in schema order. */
  private val pinned: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey:int", "r_name:string"),
    "nation" -> Seq("n_nationkey:int", "n_name:string", "n_regionkey:int"),
    "customer" -> Seq("c_custkey:bigint", "c_name:string", "c_nationkey:int",
      "c_acctbal:double", "c_mktsegment:string"),
    "supplier" -> Seq("s_suppkey:bigint", "s_name:string", "s_nationkey:int",
      "s_acctbal:double"),
    "part" -> Seq("p_partkey:bigint", "p_name:string", "p_brand:string",
      "p_type:string", "p_size:int", "p_retailprice:double"),
    "orders" -> Seq("o_orderkey:bigint", "o_custkey:bigint",
      "o_orderstatus:string", "o_totalprice:double", "o_orderdate:timestamp",
      "o_orderpriority:string"),
    "lineitem" -> Seq("l_orderkey:bigint", "l_partkey:bigint",
      "l_suppkey:bigint", "l_linenumber:int", "l_quantity:double",
      "l_extendedprice:double", "l_discount:double", "l_tax:double",
      "l_returnflag:string", "l_linestatus:string", "l_shipdate:timestamp"),
    "events" -> Seq("event_id:bigint", "ts:timestamp", "user_id:bigint",
      "event_type:string", "value:double", "props:string"),
    "documents" -> Seq("doc_id:bigint", "text:string", "lang:string",
      "source:string", "n_chars:bigint"),
    "embeddings" -> Seq("vec_id:bigint", "embedding:array<float>",
      "label:int"))

  for ((name, want) <- pinned.toSeq.sortBy(_._1)) {
    test(s"$name: post-loader schema matches the pinned contract") {
      assume(new java.io.File(s"$sf/$name.parquet").exists(),
        s"corpus table $name absent at $sf — driver testdata not generated")
      val got = Tables.table(spark, sf, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").toSeq
      assert(got == want,
        s"\ncorpus drift on `$name` —\n  pinned: ${want.mkString(", ")}\n" +
          s"  actual: ${got.mkString(", ")}\n" +
          "If the driver regenerated /root/testdata with a new schema, " +
          "update this pin AND re-run the full suite: downstream queries " +
          "bake these names/types into oracle SQL.")
    }
  }

  test("every corpus table still parses timestamps to TimestampType " +
    "(no NTZ/NANOS leaks through the loader)") {
    assume(new java.io.File(sf).isDirectory)
    val leaks = pinned.keys.toSeq.sorted.flatMap { n =>
      Tables.table(spark, sf, n).schema.fields.collect {
        case f if f.dataType.simpleString.startsWith("timestamp") &&
          f.dataType.simpleString != "timestamp" => s"$n.${f.name}:${f.dataType.simpleString}"
      }
    }
    assert(leaks.isEmpty, s"non-LTZ timestamp flavors leaked: $leaks")
  }
}

/** ScaleUp's block-size calibration must tolerate the corpus corners its
  * own docs promise replicate harmlessly — specifically an EMPTY source
  * table, whose parquet footer holds zero row groups (r14 review find: a
  * bare `.max` over the blocks aborted the whole scale-up there).
  */
class ScaleUpBlockSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("srcBlockBytes on an empty table falls to the 1 MiB clamp floor " +
    "instead of crashing on a zero-row-group footer") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("emptyblock")
    spark.emptyDataset[Long].toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir, "empty.parquet").toPath)
    assert(ScaleUp.srcBlockBytes(spark, dir, "empty") == (1L << 20))
  }

  test("srcBlockBytes on a populated table reads the footer's own " +
    "row-group volume, clamped to [1 MiB, 64 MiB]") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("popblock")
    (1L to 1000L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir, "pop.parquet").toPath)
    // a 1k-long column is far under a MiB uncompressed → clamp floor
    assert(ScaleUp.srcBlockBytes(spark, dir, "pop") == (1L << 20))
  }
}

/** The four query registries merge with `++`, where a key collision
  * silently SHADOWS the earlier entry — it never runs, never verifies,
  * and edits to it change nothing (found live: Relational carried a dead
  * "x_scd2_history" under Pipeline's key). Reject collisions outright.
  */
class RegistryContractSpec extends AnyFunSuite {
  test("query keys are unique across Relational/TpcH/Analytics/Pipeline") {
    import graft.queries._
    val parts = Seq("Relational" -> Relational.all.keySet,
      "TpcH" -> TpcH.all.keySet, "Analytics" -> Analytics.all.keySet,
      "Pipeline" -> Pipeline.all.keySet)
    val dups = parts.combinations(2).flatMap {
      case Seq((an, a), (bn, b)) => (a intersect b).map(k => s"$k ($an/$bn)")
    }.toSeq
    assert(dups.isEmpty, s"shadowed query keys: $dups")
    assert(SparkEntry.queries.size == parts.map(_._2.size).sum,
      "merged registry must carry every declared query")
  }
}

/** Contract of the r14 oracle_scope tags: every declared query carries
  * exactly one tag from the closed set, every streaming twin is
  * batch-recompute (its oracle replaces the state machinery by
  * construction), and the agg-only set names only queries that exist —
  * so a renamed query can't silently fall back to "full" and re-poison
  * the like-for-like baseline aggregate.
  */
class OracleScopeContractSpec extends AnyFunSuite {
  test("oracle_scope covers every query with a valid tag") {
    val scopes = SparkEntry.oracleScope
    val queries = SparkEntry.queries.keySet
    assert(scopes.keySet == queries,
      s"scope map must cover exactly the query set; diff: " +
        s"${(scopes.keySet diff queries) ++ (queries diff scopes.keySet)}")
    val allowed = Set("full", "agg-only", "batch-recompute")
    val bad = scopes.filterNot { case (_, v) => allowed(v) }
    assert(bad.isEmpty, s"unknown scope tags: $bad")
    queries.filter(_.startsWith("stream_")).foreach { q =>
      assert(scopes(q) == "batch-recompute",
        s"$q: a streaming twin's oracle is a batch recompute by construction")
    }
    // the declared agg-only population — if this changes, BASELINE.md's
    // like-for-like aggregates must be re-quoted over the new 'full' set
    assert(scopes.count(_._2 == "agg-only") == 6)
    assert(scopes.count(_._2 == "batch-recompute") == 22)
  }
}
