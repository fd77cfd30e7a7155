package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ivm

/** The IVM law: merging partial states equals the full recompute — on
  * random splits, disjoint and overlapping key sets, and the empty-delta
  * identity.
  */
class IvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def state(df: DataFrame) = df.groupBy("k")
    .agg(count(lit(1)).as("n"), sum("v").as("s"),
      max("v").as("mx"), min("v").as("mn"))

  private def snap(df: DataFrame) = df.collect()
    .map(r => r.getAs[Long]("k") -> (r.getAs[Long]("n"),
      r.getAs[Long]("s"), r.getAs[Long]("mx"), r.getAs[Long]("mn"))).toMap

  test("merged partial states equal the full recompute across random " +
    "splits (law over 5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(200)((rnd.nextInt(20).toLong,
        rnd.nextInt(1000).toLong - 500))
      val df = rows.toDF("k", "v")
      val cut = rnd.nextInt(rows.size)
      val (a, b) = rows.splitAt(cut)
      val parts = Seq(a, b).filter(_.nonEmpty).map(_.toDF("k", "v"))
      val merged = snap(Ivm.mergeStates(parts.map(state), Seq("k"),
        Seq("n", "s"), Seq("mx"), Seq("mn")))
      assert(merged == snap(state(df)), s"seed $seed split $cut")
    }
  }

  test("empty delta is an identity; disjoint-key states pass through") {
    val base = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val emptyDelta = base.where(lit(false))
    assert(snap(Ivm.mergeStates(Seq(state(base), state(emptyDelta)),
      Seq("k"), Seq("n", "s"), Seq("mx"), Seq("mn"))) == snap(state(base)))
    val other = Seq((9L, 1L)).toDF("k", "v")
    val merged = snap(Ivm.mergeStates(Seq(state(base), state(other)),
      Seq("k"), Seq("n", "s"), Seq("mx"), Seq("mn")))
    assert(merged(9L) == ((1L, 1L, 1L, 1L)) && merged(1L) == ((2L, 30L,
      20L, 10L)))
  }
}
