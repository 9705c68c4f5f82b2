package graft.operators

import graft.SparkSpec

/** FdAudit.audit: exact FDs, the g3 violation count (minimum deletions),
  * composite-LHS separator safety, null-as-category, and contracts. */
class FdAuditSpec extends SparkSpec {

  private def run(rows: Seq[(String, String, String)],
      cands: Seq[(Seq[String], String)]) = {
    import spark.implicits._
    FdAudit.audit(rows.toDF("a", "b", "c"), cands).collect()
      .map(r => r.getAs[String]("candidate") ->
        ((r.getAs[Long]("violations"), r.getAs[Boolean]("holds"),
          r.getAs[Long]("n_lhs_classes")))).toMap
  }

  test("exact FD holds; violated FD counts minimum deletions") {
    // a->b: a=x maps to p,p,q (delete 1); a=y maps to r (ok) => g3=1
    val rows = Seq(("x", "p", "1"), ("x", "p", "2"), ("x", "q", "3"),
      ("y", "r", "4"))
    val out = run(rows, Seq((Seq("a"), "b"), (Seq("c"), "b")))
    assert(out("a->b") == ((1L, false, 2L)))
    assert(out("c->b") == ((0L, true, 4L))) // c unique => any FD holds
  }

  test("composite LHS does not collide across the column boundary") {
    // ("ab","c") vs ("a","bc"): same concatenation without a separator;
    // b differs between them, so a collision would report a violation
    val rows = Seq(("ab", "c", "p"), ("a", "bc", "q"))
    val out = run(rows, Seq((Seq("a", "b"), "c")))
    assert(out("a,b->c") == ((0L, true, 2L)))
  }

  test("nulls are LHS/RHS categories, not dropped") {
    import spark.implicits._
    val df = Seq((Some("x"), Some("p")), (Some("x"), None),
      (None, Some("q")), (None, Some("q")))
      .toDF("a", "b")
    val out = FdAudit.audit(df, Seq((Seq("a"), "b"))).collect().head
    // x -> {p, null} violates once; null -> {q} holds
    assert(out.getAs[Long]("n_rows") == 4L)
    assert(out.getAs[Long]("violations") == 1L)
    assert(!out.getAs[Boolean]("holds"))
  }

  test("contracts: empty candidates and RHS-in-LHS fail") {
    import spark.implicits._
    val df = Seq(("x", "p")).toDF("a", "b")
    intercept[IllegalArgumentException] { FdAudit.audit(df, Nil) }
    intercept[IllegalArgumentException] {
      FdAudit.audit(df, Seq((Seq("a", "b"), "b")))
    }
  }
}
