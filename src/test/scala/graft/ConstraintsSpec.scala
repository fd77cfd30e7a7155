package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Constraints
import graft.operators.Constraints._

/** NULL semantics and single-scan shape of the constraint audit — the
  * corners where "no violation found" and "row could not be verified"
  * diverge.
  */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("table_name"),
      r.getAs[String]("constraint_name")) ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("ok"))).toMap

  test("NULL semantics: check and in_set count NULLs as violations, " +
    "fk exempts NULL child keys, unique counts NULL keys against") {
    val child = Seq(
      (Some(1L), Some("a")),  // fk ok, in set
      (Some(2L), Some("zz")), // fk ok, NOT in set
      (Some(9L), None),       // fk VIOLATION, null value → in_set violation
      (None, Some("b")))      // null fk EXEMPT; in set
      .toDF("pid", "v")
    val parent = Seq(1L, 2L, 2L).toDF("id") // duplicate parent must not
                                            // multiply child rows
    val out = report(Constraints.audit(Seq(("child", child, Seq(
      InSet("v", Seq("a", "b")),
      Check("pid_small", col("pid") < 5),
      ForeignKey("pid", "parent", parent, "id"),
      Unique(Seq("pid")))))))
    assert(out(("child", "in_set(v)")) == ((4L, 2L, false)))    // zz + null
    // pid < 5: row 9 fails, NULL pid unverifiable → violation too
    assert(out(("child", "check(pid_small)")) == ((4L, 2L, false)))
    assert(out(("child", "fk(pid -> parent.id)")) == ((4L, 1L, false)))
    // 4 rows, 3 distinct non-null pids → 1 violation (the NULL key)
    assert(out(("child", "unique(pid)")) == ((4L, 1L, false)))
  }

  test("constraint names containing quotes survive the stack() " +
    "interpolation instead of parse-failing the whole audit") {
    val df = Seq((1L, "a"), (-2L, "b")).toDF("pid", "v")
    val out = report(Constraints.audit(Seq(("t", df, Seq(
      Check("o'brien rule", col("pid") > 0))))))
    assert(out(("t", "check(o'brien rule)")) == ((2L, 1L, false)))
  }

  test("a clean table reports ok=true on every constraint and an empty " +
    "table reports zero violations, not NULL") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("pid", "v")
    val parent = Seq(1L, 2L).toDF("id")
    val cs = Seq(InSet("v", Seq("a", "b")), NotNull("v"),
      Unique(Seq("pid")), ForeignKey("pid", "parent", parent, "id"))
    assert(report(Constraints.audit(Seq(("t", clean, cs))))
      .values.forall { case (n, viol, ok) => n == 2L && viol == 0L && ok })
    val empty = clean.where(lit(false))
    assert(report(Constraints.audit(Seq(("t", empty, cs))))
      .values.forall { case (n, viol, ok) => n == 0L && viol == 0L && ok })
  }

  test("generative law: every violation count equals the plain-Scala " +
    "recompute on random tables (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      def maybe[A](a: A): Option[A] = if (rnd.nextInt(5) == 0) None else Some(a)
      val rows = Seq.fill(120)((maybe(rnd.nextInt(30).toLong),
        maybe(Seq("a", "b", "c", "zz")(rnd.nextInt(4)))))
      val parentKeys = Seq.fill(20)(rnd.nextInt(30).toLong).distinct
      val df = rows.toDF("pid", "v")
      val parent = parentKeys.toDF("id")
      val out = report(Constraints.audit(Seq(("t", df, Seq(
        NotNull("pid"), InSet("v", Seq("a", "b")),
        Check("small", col("pid") < 15), Unique(Seq("pid")),
        ForeignKey("pid", "parent", parent, "id"))))))
      val want = Map(
        "not_null(pid)" -> rows.count(_._1.isEmpty).toLong,
        "in_set(v)" -> rows.count(r =>
          !r._2.exists(Set("a", "b"))).toLong,
        "check(small)" -> rows.count(r =>
          !r._1.exists(_ < 15)).toLong,
        "unique(pid)" ->
          (rows.size - rows.flatMap(_._1).distinct.size).toLong,
        "fk(pid -> parent.id)" -> rows.count(r =>
          r._1.exists(k => !parentKeys.contains(k))).toLong)
      want.foreach { case (name, viol) =>
        assert(out(("t", name)) == ((120L, viol, viol == 0L)),
          s"seed $seed $name: got ${out(("t", name))}, want $viol")
      }
    }
  }

  test("all row-local constraints on a table share ONE scan") {
    val df = Seq((1L, "a")).toDF("pid", "v")
    val plan = Constraints.audit(Seq(("t", df,
      Seq(NotNull("pid"), NotNull("v"), InSet("v", Seq("a")),
        Check("c", col("pid") > 0)))))
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation".r.findAllIn(plan).size +
      "Scan".r.findAllIn(plan).size
    assert(scans <= 2, // one relation node (+ its possible echo in text)
      s"4 row-local constraints must fold into one scan:\n$plan")
  }
}
