package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native graft expressions.
  *
  * Two integration paths (same function list):
  *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  *    construction (the standard library-extension mechanism), or
  *  - `GraftFunctions.register(spark)` on an already-running session.
  *
  * After either, `spark.sql("SELECT float_vec_dot(a, b) ...")` works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    ("float_vec_sum",
      new ExpressionInfo(classOf[FloatVecSumAgg].getName, "float_vec_sum"),
      (args: Seq[Expression]) => FloatVecSumAgg(args.head)
        .toAggregateExpression()),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args.head, foldableInt(args(1)), distinct = true)),
    ("simhash32",
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => SimHash32(args.head)),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    // profile_scores(text, array('the','a'), array('el','la'), ...)
    ("profile_scores",
      new ExpressionInfo(classOf[ProfileScores].getName, "profile_scores"),
      (args: Seq[Expression]) => ProfileScores(args.head,
        args.tail.map(foldableStringArray))),
    ("bpeish_token_count",
      new ExpressionInfo(classOf[BpeishTokenCount].getName, "bpeish_token_count"),
      (args: Seq[Expression]) => BpeishTokenCount(args.head)),
    // minhash_signatures(shingles, numHashes)
    ("minhash_signatures",
      new ExpressionInfo(classOf[MinHashSignatures].getName, "minhash_signatures"),
      (args: Seq[Expression]) =>
        MinHashSignatures(args.head, foldableInt(args(1)))),
    // winnow_fingerprints(text, k, w)
    ("winnow_fingerprints",
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) =>
        WinnowFingerprints(args.head, foldableInt(args(1)), foldableInt(args(2)))),
    // byte_block_simhash64(payload, blockBytes)
    ("byte_block_simhash64",
      new ExpressionInfo(classOf[ByteBlockSimHash64].getName, "byte_block_simhash64"),
      (args: Seq[Expression]) =>
        ByteBlockSimHash64(args.head, foldableInt(args(1)))),
    ("repetition_signals",
      new ExpressionInfo(classOf[RepetitionSignals].getName, "repetition_signals"),
      (args: Seq[Expression]) => RepetitionSignals(args.head)),
    // deflate_length(data[, level]) — compressed byte count
    ("deflate_length",
      new ExpressionInfo(classOf[DeflateLength].getName, "deflate_length"),
      (args: Seq[Expression]) =>
        DeflateLength(args.head,
          if (args.length > 1) foldableInt(args(1)) else 6)),
    // normalize_text(text[, form]) — UAX #15 normalization
    ("normalize_text",
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (args: Seq[Expression]) =>
        NormalizeText(args.head,
          if (args.length > 1) foldableString(args(1)) else "NFC")),
    ("strip_accents",
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (args: Seq[Expression]) => StripAccents(args.head)),
    // misra_gries_topk(term, capacity) — aggregate
    ("misra_gries_topk",
      new ExpressionInfo(classOf[MisraGriesTopK].getName, "misra_gries_topk"),
      (args: Seq[Expression]) =>
        MisraGriesTopK(args.head, foldableInt(args(1)))
          .toAggregateExpression()),
    // count_min_sketch(term, depth, width) — aggregate
    ("count_min_sketch",
      new ExpressionInfo(classOf[CountMinSketch].getName, "count_min_sketch"),
      (args: Seq[Expression]) =>
        CountMinSketch(args.head, foldableInt(args(1)), foldableInt(args(2)))
          .toAggregateExpression())
  )

  private def foldableInt(e: Expression): Int = {
    require(e.foldable, "argument must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def foldableString(e: Expression): String = {
    require(e.foldable, "argument must be a literal")
    e.eval().toString
  }

  private def foldableStringArray(e: Expression): Seq[String] = {
    require(e.foldable, "profiles must be literal string arrays")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
  }

  /** Register everything on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftSql.registerFunction(spark, name, builder)
    }
}
