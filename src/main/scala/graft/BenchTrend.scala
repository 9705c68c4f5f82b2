package graft

/** Consolidate the per-round bench artifacts (`BENCH_r*.json`) into one
  * `BENCH_TREND.json`: per-query ratio history across rounds plus
  * round-over-round drift detection — so adjudicating "did x drift or
  * is it host noise" reads one file instead of archaeology across
  * BASELINE.md prose. Plain regex extraction (the artifacts are
  * single-line JSON the driver emits; no JSON library in the
  * dependency set, and the fields are flat).
  *
  * Usage: BenchTrend [repoDir] — writes repoDir/BENCH_TREND.json.
  * "worsened" lists queries whose ratio rose ≥ 0.25 to above 1.2
  * between the two most recent rounds carrying ratios — the same
  * screen-then-solo-adjudicate protocol BASELINE.md documents (a
  * worsened entry is a solo min-of-4 candidate, not yet a verdict).
  *
  * The driver wraps Bench's one-line JSON in a `tail` field holding the
  * ESCAPED last few KB of output — early queries can be truncated away,
  * so a round's history may be partial (nulls); extraction works on the
  * unescaped tail and only trusts the `"ratios":{...}` region (or, when
  * the front of that region is cut, the query-shaped pairs before
  * `"regressed"`, provided no seconds-valued `"queries":{` section is
  * in scope to confuse them with). */
object BenchTrend {
  private val RoundFile = """BENCH_r(\d+)\.json""".r
  private val Pair = """"([qx]\d+[A-Za-z0-9_]*)":([0-9.]+)""".r

  private[graft] def ratiosOf(raw: String): Map[String, Double] = {
    val text = raw.replace("\\\"", "\"").replace("\\n", "\n")
    val end = text.lastIndexOf("\"regressed\"")
    if (end < 0) Map.empty
    else {
      val start = text.lastIndexOf("\"ratios\":{", end)
      val qStart = text.lastIndexOf("\"queries\":{", end)
      val body =
        if (start >= 0) text.substring(start + 10, end)
        else if (qStart < 0) text.substring(0, end) // front-truncated ratios
        else return Map.empty // only the seconds section survived
      Pair.findAllMatchIn(body.takeWhile(_ != '}'))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  def main(args: Array[String]): Unit = {
    val repo = java.nio.file.Paths.get(args.headOption.getOrElse("."))
    val files = java.nio.file.Files.list(repo).toArray.map(_.toString)
      .flatMap { p =>
        java.nio.file.Paths.get(p).getFileName.toString match {
          case RoundFile(n) => Some((n.toInt, p))
          case _ => None
        }
      }.sortBy(_._1)
    val rounds = files.map { case (round, path) =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val ratios = ratiosOf(text)
      val vs = """\\?"vs_baseline\\?":([0-9.]+)""".r
        .findFirstMatchIn(text).map(_.group(1).toDouble)
      (round, ratios, vs)
    }
    val withRatios = rounds.filter(_._2.nonEmpty)
    val queries = withRatios.flatMap(_._2.keys).distinct.sorted
    val sb = new StringBuilder
    sb.append("{\n  \"rounds\": [")
    sb.append(rounds.map { case (r, _, vs) =>
      s"""{"round":$r,"vs_baseline":${vs.map(_.toString).getOrElse("null")}}"""
    }.mkString(", "))
    sb.append("],\n  \"ratios\": {\n")
    sb.append(queries.map { q =>
      val hist = withRatios.map { case (r, m, _) =>
        s""""r$r":${m.get(q).map(_.toString).getOrElse("null")}"""
      }.mkString(", ")
      s"""    "$q": {$hist}"""
    }.mkString(",\n"))
    sb.append("\n  },\n")
    val worsened: Seq[(String, Double, Double)] =
      if (withRatios.length < 2) Seq.empty
      else {
        val (_, prev, _) = withRatios(withRatios.length - 2)
        val (_, last, _) = withRatios.last
        queries.flatMap { q =>
          (prev.get(q), last.get(q)) match {
            case (Some(a), Some(b)) if b - a >= 0.25 && b > 1.2 =>
              Some((q, a, b))
            case _ => None
          }
        }
      }
    val lastTwo = withRatios.takeRight(2).map(_._1)
    sb.append(s"""  "worsened_between": [${lastTwo.mkString(", ")}],\n""")
    sb.append("  \"worsened\": [")
    sb.append(worsened.map { case (q, a, b) =>
      s"""{"query":"$q","prev":$a,"last":$b}"""
    }.mkString(", "))
    sb.append("]\n}\n")
    val out = repo.resolve("BENCH_TREND.json")
    java.nio.file.Files.write(out, sb.toString.getBytes("UTF-8"))
    println(s"[trend] wrote $out: ${rounds.length} rounds, " +
      s"${queries.length} queries, ${worsened.length} worsened")
  }
}
