package graft

import org.scalatest.funsuite.AnyFunSuite

/** BENCH_TREND extraction against the driver's artifact shapes: the
  * escaped `tail` wrapper, front-truncation mid-ratios, and the
  * seconds-section false-positive guard. */
class BenchTrendSpec extends AnyFunSuite {

  test("full ratios section extracts all pairs") {
    val tail = """{\"metric\":\"total\",\"queries\":{\"q01_a\":7.3,\"x02_b\":1.1},""" +
      """\"ratios\":{\"q01_a\":0.95,\"x02_b\":1.21},\"regressed\":[],\"vs_baseline\":1.0}"""
    assert(BenchTrend.ratiosOf(tail) == Map("q01_a" -> 0.95, "x02_b" -> 1.21))
  }

  test("front-truncated tail (mid-ratios) still yields the surviving pairs") {
    val tail = """,\"x16_c\":1.501,\"x17_d\":1.216},\"regressed\":[\"x16_c:1.501\"],\"vs_baseline\":0.9}"""
    assert(BenchTrend.ratiosOf(tail) == Map("x16_c" -> 1.501, "x17_d" -> 1.216))
  }

  test("tail holding only the seconds section yields nothing, not bogus ratios") {
    val tail = """{\"metric\":\"total\",\"queries\":{\"q01_a\":7.3,\"x02_b\":25.08},\"regressed\":[]}"""
    assert(BenchTrend.ratiosOf(tail).isEmpty)
  }

  test("log-noise tails without a bench line yield nothing") {
    assert(BenchTrend.ratiosOf("[error] [bench] x17_range_join 142.92 s").isEmpty)
  }
}
