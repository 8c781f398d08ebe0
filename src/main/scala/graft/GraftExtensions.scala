package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The library's `SparkSessionExtensions` hook — build-rule path (c): a
  * user adds
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every graft native expression is available in SQL on every session
  * of the cluster, with no per-session `register(...)` calls (the reference
  * host loads its decoder plugin by class name the same way,
  * `PulsarJSONMessageDecoder` via `PluginManager` —
  * `PulsarJSONMessageDecoder.java:50-57`).
  *
  * Injected at extension time (catalog-level, survives
  * `SparkSession.newSession()`) rather than via the temp-function registry
  * the per-session `register` helpers use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // All builders delegate to the arity-checked companions in
  // `graft.functions` (see `functions.Arity`) — the same builders the
  // per-session `register()` helpers use, so a later `register()` call that
  // replaces an extension-injected entry keeps the identical error contract.
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(
          classOf[functions.CosineSimilarity].getName,
          "cosine_sim",
          "cosine_sim(a, b) - cosine similarity of two float vectors (fused codegen loop)"
        ),
        functions.VectorFunctions.cosineBuilder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("quantized_cosine"),
        new ExpressionInfo(
          classOf[functions.QuantizedCosine].getName,
          "quantized_cosine",
          "quantized_cosine(qa, qb) - cosine over int8-quantized code arrays: exact integer dot/norms, one double division (fused codegen loop)"
        ),
        functions.VectorFunctions.quantizedCosineBuilder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("exact_percentiles"),
        new ExpressionInfo(
          classOf[functions.ExactPercentiles].getName,
          "exact_percentiles",
          "exact_percentiles(x, p...) - exact interpolated percentiles over a primitive buffer (unboxed percentile())"
        ),
        functions.ExactPercentiles.build(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("kmv_hashes"),
        new ExpressionInfo(
          classOf[functions.KmvHashes].getName,
          "kmv_hashes",
          "kmv_hashes(h, k) - k-minimum-values distinct sketch (theta-sketch family): sorted array of the k smallest distinct hashes"
        ),
        functions.KmvSketch.build(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("kmv_estimate"),
        new ExpressionInfo(
          classOf[functions.KmvHashes].getName,
          "kmv_estimate",
          "kmv_estimate(arr, k) - distinct-count estimate from a kmv_hashes sketch: exact below k, (k-1)/h_(k) at k"
        ),
        functions.KmvSketch.estimateBuild(_)
      )
    )
    Seq(
      ("kmv_jaccard", "kmv_jaccard(a, b, k) - Jaccard estimate between two kmv_hashes sketches (theta set operation)", functions.KmvSketch.jaccardBuild(_)),
      ("kmv_union_est", "kmv_union_est(a, b, k) - union distinct-count estimate of two kmv_hashes sketches", functions.KmvSketch.unionEstBuild(_)),
      ("kmv_intersect_est", "kmv_intersect_est(a, b, k) - intersection size estimate of two kmv_hashes sketches (jaccard x union)", functions.KmvSketch.intersectEstBuild(_))
    ).foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[functions.KmvHashes].getName, name, usage),
          builder
        )
      )
    }
    ext.injectFunction(
      (
        FunctionIdentifier("freq_items"),
        new ExpressionInfo(
          classOf[functions.FreqItemsAgg].getName,
          "freq_items",
          "freq_items(item, k) - mergeable Misra-Gries heavy-hitters sketch: array<struct<item,est>> sorted by est desc, with a ('', deficit) error-bound sentinel"
        ),
        functions.FreqItems.build(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("rolling_hash"),
        new ExpressionInfo(
          classOf[functions.RollingHash].getName,
          "rolling_hash",
          "rolling_hash(s) - 64-bit polynomial rolling hash of a string (codegen)"
        ),
        functions.RollingHash.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("char_entropy"),
        new ExpressionInfo(
          classOf[functions.CharEntropy].getName,
          "char_entropy",
          "char_entropy(s) - char-level Shannon entropy (nats) in one map-side pass"
        ),
        functions.CharEntropy.builder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("bloom_agg"),
        new ExpressionInfo(
          classOf[functions.BloomAgg].getName,
          "bloom_agg",
          "bloom_agg(key, numBits, numHashes) - mergeable Bloom filter over string keys; output is self-describing (header carries numHashes)"
        ),
        functions.BloomFilter.aggBuild(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("redact_pii"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace].getName,
          "redact_pii",
          "redact_pii(s) - mask email/phone/IPv4 substrings with placeholder tokens (chained codegen regexp_replace; same definition as the batch/streaming operators)"
        ),
        operators.TextAnalysis.redactPiiBuilder(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(
          classOf[functions.BloomMightContain].getName,
          "bloom_might_contain",
          "bloom_might_contain(bloom_bytes, key) - codegen membership probe; numHashes is read from the filter's header (no false negatives possible)"
        ),
        functions.BloomFilter.probeBuild(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("cms_agg"),
        new ExpressionInfo(
          classOf[functions.CmsAgg].getName,
          "cms_agg",
          "cms_agg(buckets_array, depth, width) - mergeable count-min sketch over pre-hashed bucket indices; output is self-describing (header carries depth/width)"
        ),
        functions.CountMinSketch.aggBuild(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("cms_query"),
        new ExpressionInfo(
          classOf[functions.CmsQuery].getName,
          "cms_query",
          "cms_query(sketch_bytes, buckets_array) - codegen point query: min counter over the sketch's hash rows (estimate >= truth always); geometry is read from the sketch's header"
        ),
        functions.CountMinSketch.queryBuild(_)
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("cms_inner"),
        new ExpressionInfo(
          classOf[functions.CmsInner].getName,
          "cms_inner",
          "cms_inner(sketch_a, sketch_b) - join-size / inner-product estimate from two same-geometry sketches (min over rows of the counter dot product; >= truth always)"
        ),
        functions.CountMinSketch.innerBuild(_)
      )
    )
  }
}
