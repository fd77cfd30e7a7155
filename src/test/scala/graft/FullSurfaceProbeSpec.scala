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

  /** Documented non-empty REQUIREs: these must throw
    * IllegalArgumentException with their documented message. */
  private val requiresNonEmpty = Map(
    "x_bpe_merges" -> "no adjacent token pairs",
    "x_bpe_encode" -> "no adjacent token pairs")

  test("every registered query survives an all-empty star schema") {
    val src = "/root/testdata/sf0.001"
    val sf = TestSpark.tmpDir("emptyall")
    tables.foreach { t =>
      graft.io.Tables.table(spark, src, t).limit(0)
        .write.mode("overwrite").parquet(s"$sf/$t.parquet")
    }

    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if requiresNonEmpty.contains(name) => None
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch {
          case _: IllegalArgumentException => None // documented require
          case e: Throwable =>
            Some(s"$name -> ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
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
}
