package graft

import org.scalatest.funsuite.AnyFunSuite

/** Generative lockstep law for CDC apply: the batch window query
  * (`x_cdc_apply`), the streaming stateful fold (`stream_cdc_apply`), and
  * a naive per-key replay written independently in plain Scala must agree
  * on randomized op logs — including duplicate timestamps (tie-break on
  * event_id), keys whose final op is a delete (dropped), and keys with a
  * single op. The corpus-level oracle pins both against DuckDB on real
  * data; this pins them against the DEFINITION on adversarial shapes the
  * corpus never produces.
  */
class CdcLawSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch, streaming, and naive replay agree on random op logs") {
    val types = Vector("signup", "click", "purchase", "error")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val t0 = java.sql.Timestamp.valueOf("2000-01-01 00:00:00").getTime
      var eid = 0L
      val rows = for {
        u <- 1L to (2 + rnd.nextInt(3)).toLong
        _ <- 0 until rnd.nextInt(15)
      } yield {
        eid += 1
        // coarse 10-minute grid → duplicate timestamps occur regularly,
        // exercising the (ts DESC, event_id DESC) tie-break
        val ts = new java.sql.Timestamp(t0 + rnd.nextInt(12) * 600000L)
        (eid, ts, u, types(rnd.nextInt(types.size)),
          rnd.nextInt(1000) / 100.0, null.asInstanceOf[String])
      }
      if (rows.nonEmpty) {
        val sf = TestSpark.tmpDir(s"cdclaw$seed")
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("overwrite").parquet(s"$sf/events.parquet")

        // independent replay: last op per key by (ts, event_id); drop 'D'
        def op(t: String) =
          if (t == "signup") "I" else if (t == "error") "D" else "U"
        val expected = rows.groupBy(_._3).flatMap { case (u, ops) =>
          val last = ops.maxBy(r => (r._2.getTime, r._1))
          if (op(last._4) == "D") None
          else Some((u, op(last._4), math.round(last._5 * 100),
            last._2.getTime * 1000, ops.size.toLong))
        }.toSet

        def got(name: String) = SparkEntry.queries(name)(spark, sf)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        val batch = got("x_cdc_apply")
        assert(batch == expected,
          s"seed $seed: batch CDC != replay\n  only-batch: " +
            s"${(batch -- expected).take(3)}\n  only-replay: " +
            s"${(expected -- batch).take(3)}")
        val streamed = got("stream_cdc_apply")
        assert(streamed == expected,
          s"seed $seed: streaming CDC != replay\n  only-stream: " +
            s"${(streamed -- expected).take(3)}\n  only-replay: " +
            s"${(expected -- streamed).take(3)}")
      }
    }
  }
}
