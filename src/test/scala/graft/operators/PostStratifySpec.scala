package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PostStratify.weights: exact cell weights, both collapse levels, the
  * calibration identity (weighted sample mass == population mass per
  * fat cell / per pool), zero-sample cells, and the loud
  * uncalibratable-pool error. */
class PostStratifySpec extends SparkSpec {

  private def mk(cells: Seq[(String, String, Int)]) = {
    import spark.implicits._
    cells.flatMap { case (s, l, n) => Seq.fill(n)((s, l)) }
      .toDF("src", "lang")
  }

  test("all three levels, exact micro weights, calibration identity") {
    // pop: a/en 100, a/fr 10, b/en 50, b/fr 40, c/en 30
    val pop = mk(Seq(("a", "en", 100), ("a", "fr", 10), ("b", "en", 50),
      ("b", "fr", 40), ("c", "en", 30)))
    // sample: a/en 10 (fat), a/fr 1 (thin -> pool a, pns=1 < 3 -> global),
    // b/en 3 (fat), b/fr 2 + b absent... b/fr thin -> pool b pns=2 < 3
    // -> global; c/en 2 thin -> pool c pns=2 < 3 -> global
    val smp = mk(Seq(("a", "en", 10), ("a", "fr", 1), ("b", "en", 3),
      ("b", "fr", 2), ("c", "en", 2)))
    val out = PostStratify.weights(pop, smp, Seq("src", "lang"),
      minCell = 3L).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("lang")) ->
        ((r.getAs[String]("level"), r.getAs[Long]("weight_micro"),
          r.getAs[Long]("n_sample")))).toMap
    assert(out(("a", "en")) == (("cell", 10000000L, 10L)))
    assert(out(("b", "en")) == (("cell", 16666666L, 3L)))
    // global pool: pnp = 10+40+30 = 80, pns = 1+2+2 = 5 -> 16000000
    for (k <- Seq(("a", "fr"), ("b", "fr"), ("c", "en")))
      assert(out(k)._1 == "pooled:global" && out(k)._2 == 16000000L, k)
  }

  test("source-level pool when the pooled sample clears minCell") {
    val pop = mk(Seq(("a", "en", 60), ("a", "fr", 40), ("b", "en", 50)))
    // a/en 2 + a/fr 2 both thin; pooled a: pns=4 >= 3 -> pooled:src
    val smp = mk(Seq(("a", "en", 2), ("a", "fr", 2), ("b", "en", 5)))
    val out = PostStratify.weights(pop, smp, Seq("src", "lang"),
      minCell = 3L).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("lang")) ->
        ((r.getAs[String]("level"), r.getAs[Long]("weight_micro")))).toMap
    assert(out(("b", "en")) == (("cell", 10000000L)))
    // pool a: pnp=100, pns=4 -> 25000000
    assert(out(("a", "en")) == (("pooled:src", 25000000L)))
    assert(out(("a", "fr")) == (("pooled:src", 25000000L)))
  }

  test("zero-sample cell reports its pool's weight with n_sample = 0") {
    val pop = mk(Seq(("a", "en", 50), ("a", "fr", 30)))
    val smp = mk(Seq(("a", "en", 4), ("a", "fr", 1)))
    // a/fr thin (1); pool a pns=1 < 2? minCell=2: a/fr -> pool a: pns=1
    // < 2 -> global: gnp=30, gns=1 -> 30000000
    val out = PostStratify.weights(pop, smp, Seq("src", "lang"),
      minCell = 2L).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("lang")) ->
        r.getAs[Long]("weight_micro")).toMap
    assert(out(("a", "fr")) == 30000000L)
    // and a truly absent cell (the global pool still has sample mass
    // through b/en, so a/fr's population rides the global weight):
    val pop2 = mk(Seq(("a", "en", 50), ("a", "fr", 30), ("b", "en", 20)))
    val smp2 = mk(Seq(("a", "en", 4), ("b", "en", 1)))
    val out2 = PostStratify.weights(pop2, smp2, Seq("src", "lang"),
      minCell = 2L).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("lang")) ->
        ((r.getAs[Long]("n_sample"), r.getAs[String]("level"),
          r.getAs[Long]("weight_micro")))).toMap
    // global pool: gnp = 30 + 20 = 50, gns = 0 + 1 = 1
    assert(out2(("a", "fr")) == ((0L, "pooled:global", 50000000L)))
    assert(out2(("b", "en")) == ((1L, "pooled:global", 50000000L)))
  }

  test("population mass with zero sample rows anywhere fails loudly") {
    val pop = mk(Seq(("a", "en", 50), ("b", "xx", 10)))
    val smp = mk(Seq(("a", "en", 5)))
    val e = intercept[Exception] {
      PostStratify.weights(pop, smp, Seq("src", "lang"), minCell = 2L)
        .collect()
    }
    assert(e.getMessage.contains("cannot be calibrated"), e.getMessage)
  }
}
