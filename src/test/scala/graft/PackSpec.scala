package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pack

/** Packing-operator laws: serpentine balance vs a plain-Scala recompute,
  * best-fit capacity/dominance/determinism invariants.
  */
class PackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** docs with controlled sizes: token count == the size argument. */
  private def docsOf(sizes: Seq[Int], lang: String = "en") =
    sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, lang, (1 to n).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "lang", "text")

  test("serpentine: deal order matches the boustrophedon recompute and " +
    "balances loads") {
    val sizes = Seq(40, 35, 30, 25, 20, 15, 10, 5, 4, 3, 2, 1)
    val out = Pack.serpentine(docsOf(sizes), nBins = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // plain-Scala serpentine over size-desc order (sizes are already desc,
    // doc_id ascending breaks ties identically)
    val expect = sizes.indices.map { rank =>
      val r = rank % 8
      rank.toLong -> (if (r < 4) r.toLong else (7 - r).toLong)
    }.toMap
    assert(out == expect, "bin assignment is the exact serpentine deal")
    val loads = sizes.indices.groupBy(i => out(i.toLong))
      .view.mapValues(_.map(sizes).sum).values.toSeq
    assert(loads.max - loads.min <= 8,
      s"serpentine loads stay near-balanced, got $loads")
  }

  test("best-fit: capacity is never exceeded, oversize docs get singleton " +
    "bins, and FFD uses no more bins than next-fit") {
    val sizes = Seq(60, 50, 45, 30, 28, 20, 12, 9, 7, 3, 90)
    val cap = 64L
    val rows = Pack.bestFitDecreasing(docsOf(sizes), cap, shards = 1)
      .collect().map(r => (r.getLong(0), r.getInt(4), r.getLong(3)))
    val binLoads = rows.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toMap
    val oversizeBin = rows.find(_._1 == 10L).get._2
    assert(rows.count(_._2 == oversizeBin) == 1,
      "the 90-token doc (> cap) sits alone in its bin")
    binLoads.foreach { case (b, load) =>
      assert(b == oversizeBin || load <= cap,
        s"bin $b load $load exceeds cap $cap")
    }
    // dominance: next-fit in the same size-desc order
    var nfBins = 1; var fill = 0L
    sizes.sortBy(-_).foreach { n =>
      if (fill + n > cap) { nfBins += 1; fill = n.toLong }
      else fill += n
    }
    assert(binLoads.size <= nfBins,
      s"FFD (${binLoads.size} bins) must not lose to next-fit ($nfBins)")
  }

  test("best-fit: deterministic across runs and shards partition the work") {
    val df = docsOf(Seq(33, 21, 18, 14, 9, 6, 5, 2))
    val a = Pack.bestFitDecreasing(df, 40L, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(4))).sorted
    val b = Pack.bestFitDecreasing(df, 40L, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(4))).sorted
    assert(a.sameElements(b), "identical layout on re-run")
    assert(a.map(_._2).distinct.length >= 2,
      "md5 sharding actually spreads docs across groups")
  }
}
