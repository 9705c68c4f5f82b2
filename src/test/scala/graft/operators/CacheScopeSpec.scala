package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CacheScope: operator-internal persists are reclaimed deterministically
  * when the caller's action finishes — long-lived sessions don't
  * accumulate postings/bigram caches (VERDICT r8 item 7). */
class CacheScopeSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((1L, "a b c d e f g"), (2L, "a b c d x y z"),
      (3L, "q r s t u v w"), (4L, "a b c d e f g"))
      .toDF("doc_id", "text")
  }

  test("bigramNll under withScope: caches live for the action, zero after") {
    spark.catalog.clearCache()
    val baseline = CacheScope.cachedBlockCount(spark)
    var during = -1L
    val unscoped = LmScore.bigramNll(docs, "doc_id", "text").collect().toSeq
    spark.catalog.clearCache()
    val scoped = CacheScope.withScope { sc =>
      val out = LmScore.bigramNll(docs, "doc_id", "text", scope = Some(sc))
        .collect().toSeq
      during = CacheScope.cachedBlockCount(spark)
      assert(sc.trackedCount == 2, "uni + bg should both route via the scope")
      out
    }
    assert(during > baseline,
      s"persists never materialized inside the scope ($during vs $baseline)")
    assert(CacheScope.cachedBlockCount(spark) <= baseline,
      "cached blocks survived release()")
    assert(scoped == unscoped, "scoping must not change results")
  }

  test("overlapMatrix + jaccardPairs scoped: identical results, no residue") {
    spark.catalog.clearCache()
    val baseline = CacheScope.cachedBlockCount(spark)
    val src = docs.withColumn("source",
      when(col("doc_id") % 2 === 0, "web").otherwise("books"))
    val wantO = SourceOverlap.overlapMatrix(src, "source", "text", n = 2)
      .orderBy("src_a", "src_b").collect().toSeq
    val wantJ = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2,
      threshold = 0.1).orderBy("doc_a", "doc_b").collect().toSeq
    spark.catalog.clearCache()
    val (gotO, gotJ) = CacheScope.withScope { sc =>
      (SourceOverlap.overlapMatrix(src, "source", "text", n = 2,
          scope = Some(sc)).orderBy("src_a", "src_b").collect().toSeq,
        Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.1,
          scope = Some(sc)).orderBy("doc_a", "doc_b").collect().toSeq)
    }
    assert(CacheScope.cachedBlockCount(spark) <= baseline,
      "cached blocks survived release()")
    assert(gotO == wantO && gotJ == wantJ)
  }

  test("release is idempotent and scope-local (other caches untouched)") {
    import spark.implicits._
    spark.catalog.clearCache()
    val outside = (1 to 100).toDF("v").persist()
    outside.count()
    val baseline = CacheScope.cachedBlockCount(spark)
    assert(baseline >= 1, "outside cache should be materialized")
    val sc = new CacheScope
    sc.persist(docs.groupBy("text").count()).count()
    assert(CacheScope.cachedBlockCount(spark) > baseline)
    sc.release()
    sc.release() // second release: no throw, no effect
    assert(sc.trackedCount == 0)
    // <= not ==: the shared session's ContextCleaner may drain stale
    // localCheckpoint blocks from EARLIER suites at any moment (async
    // unpersist), so unrelated counts can only fall. The scope-local
    // claim is pinned by the outside persist surviving untouched.
    assert(CacheScope.cachedBlockCount(spark) <= baseline,
      "scope released a cache it did not acquire, or missed its own")
    assert(outside.storageLevel.isValid,
      "scope released the unrelated outside persist")
    outside.unpersist(blocking = true)
  }
}
