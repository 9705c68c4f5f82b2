package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minWords: Int = 5): (String, Long, Long) = {
    val r = Boilerplate.extractMainContent(
      Seq(html).toDF("html"), "html", minWords).head()
    (r.getAs[String]("clean_text"), r.getAs[Long]("n_blocks_kept"),
      r.getAs[Long]("n_blocks_dropped"))
  }

  test("keeps long blocks, drops chrome, strips tags") {
    val (txt, kept, dropped) = extract(
      "<html><head><title>t</title></head><body>\n" +
      "<nav>home about contact</nav>\n" +
      "<p>one two three four five six seven</p>\n" +
      "<p>alpha beta gamma delta epsilon zeta</p>\n" +
      "<footer>c 2024</footer>\n</body></html>")
    assert(txt == "one two three four five six seven " +
      "alpha beta gamma delta epsilon zeta")
    assert(kept == 2 && dropped == 3, s"$kept/$dropped")
  }

  test("minWords boundary: exactly-minWords block survives") {
    val (txt, kept, dropped) = extract(
      "<p>a b c d e</p>\n<p>a b c d</p>")
    assert(txt == "a b c d e" && kept == 1 && dropped == 1)
  }

  test("all-chrome page yields empty clean_text") {
    val (txt, kept, dropped) = extract("<nav>x y</nav>\n<footer>z</footer>")
    assert(txt == "" && kept == 0 && dropped == 2)
  }

  test("plain text without markup is preserved verbatim") {
    val (txt, kept, _) = extract("one two three four five six")
    assert(txt == "one two three four five six" && kept == 1)
  }

  test("attribute-bearing and self-closing tags strip; spacing collapses") {
    val (txt, _, _) = extract(
      "<div class=\"a\" id='z'>one <b>two</b> three four five<br/> six</div>")
    assert(txt == "one two three four five six")
  }
}
