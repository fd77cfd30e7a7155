package graft

import org.scalatest.funsuite.AnyFunSuite

/** The empty-input contract over the ENTIRE query surface — every
  * `SparkEntry.queries` key, not just the documents/embeddings/events
  * family (EmptyProbeSpec) — because an empty partition of ANY table is a
  * routine occurrence at 100 TB (a new tenant, a date range with no data,
  * a filter that prunes everything). Every query must return a clean
  * result (empty or a computed degenerate row, schema intact) or fail
  * with its documented IllegalArgumentException — never an NPE,
  * NoSuchElement, NULL-read, or match error.
  *
  * The empty star is derived from the REAL sf0.001 schemas via
  * `Tables.table(...).limit(0)` so column names, types, and the
  * ns-timestamp repair match production exactly.
  */
class FullSurfaceProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private val src = "/root/testdata/sf0.001"

  /** Documented non-empty REQUIREs: these must throw
    * IllegalArgumentException with their documented message. */
  private val requiresNonEmpty = Map(
    "x_bpe_merges" -> "no adjacent token pairs",
    "x_bpe_encode" -> "no adjacent token pairs")

  /** Clean outcomes across the whole surface: a computed count, or a
    * documented require. Anything else (NPE, NULL-read, NoSuchElement,
    * match error, analysis failure) is a defect at scale. */
  private def crashes(sf: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch {
        case _: IllegalArgumentException => None // documented require
        case e: Throwable =>
          Some(s"$name -> ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }

  test("every registered query survives an all-empty star schema") {
    val sf = TestSpark.tmpDir("emptyall")
    tables.foreach { t =>
      graft.io.Tables.table(spark, src, t).limit(0)
        .write.mode("overwrite").parquet(s"$sf/$t.parquet")
    }
    val broken = crashes(sf)
    assert(broken.isEmpty,
      s"queries crashed on an all-empty star:\n  ${broken.mkString("\n  ")}")

    requiresNonEmpty.foreach { case (name, msg) =>
      val ex = intercept[IllegalArgumentException] {
        SparkEntry.queries(name)(spark, sf).count()
      }
      assert(ex.getMessage.contains(msg),
        s"$name must fail with its documented message, got: ${ex.getMessage}")
    }
  }

  test("every registered query survives a single-row star schema") {
    // one arbitrary row per table: FK joins mostly miss, windows span one
    // row, centroids come from one vector — the smallest non-empty shape
    val sf = TestSpark.tmpDir("onerowall")
    tables.foreach { t =>
      graft.io.Tables.table(spark, src, t).limit(1)
        .write.mode("overwrite").parquet(s"$sf/$t.parquet")
    }
    val broken = crashes(sf)
    assert(broken.isEmpty,
      s"queries crashed on a single-row star:\n  ${broken.mkString("\n  ")}")
  }

  test("every registered query survives a null-heavy star schema") {
    // two rows per table with every NON-KEY column nulled — the shape a
    // malformed upstream load produces. Key/FK columns stay real so joins
    // still resolve; everything an aggregate, parse, or window touches
    // may be NULL.
    import org.apache.spark.sql.functions.{col, lit}
    val keys: Map[String, Set[String]] = Map(
      "region" -> Set("r_regionkey"),
      "nation" -> Set("n_nationkey", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_nationkey"),
      "supplier" -> Set("s_suppkey", "s_nationkey"),
      "part" -> Set("p_partkey"),
      "orders" -> Set("o_orderkey", "o_custkey"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      "events" -> Set("event_id"),
      "documents" -> Set("doc_id"),
      "embeddings" -> Set("vec_id"))
    val sf = TestSpark.tmpDir("nullall")
    tables.foreach { t =>
      val df = graft.io.Tables.table(spark, src, t).limit(2)
      val nulled = df.select(df.schema.fields.map { f =>
        if (keys(t)(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
      nulled.write.mode("overwrite").parquet(s"$sf/$t.parquet")
    }
    val broken = crashes(sf)
    assert(broken.isEmpty,
      s"queries crashed on a null-heavy star:\n  ${broken.mkString("\n  ")}")
  }
}
