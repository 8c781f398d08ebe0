package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Functional behavior of the text operators on constructed inputs (the
  * oracle checks parity on fixtures; this checks the operators do the right
  * thing on inputs with known answers).
  */
class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def langidOn(rows: Seq[(Long, String, String)]): Map[String, String] =
    TextAnalysis
      .langidFrame(rows.toDF("doc_id", "text", "lang"))
      .collect()
      .map(r => r.getAs[String]("text") -> r.getAs[String]("predicted"))
      .toMap

  test("textrank: a planted hub word outranks its leaves; thresholded pairs form the graph") {
    // six leaves each co-occurring only with 'hub' (every doc twice so
    // all bigrams clear the >= 2 threshold): the hub aggregates mass from
    // all leaves and must rank first — the property raw frequency can't
    // see (every word here has the same corpus frequency ratio)
    val docs = Seq(
      "alpha hub beta", "gamma hub delta", "epsilon hub zeta",
      "alpha hub beta", "gamma hub delta", "epsilon hub zeta"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (scores, pins) = TextAnalysis.buildTextrankTracked(docs)
    val ranked = scores.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(-_._2)
    pins.foreach(graft.Tables.unpin)
    assert(ranked.head._1 === "hub", ranked.mkString(","))
    assert(ranked.map(_._1).toSet === Set("hub", "alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
    // integer picoprobability mass: all scores positive, total <= 1e12
    // (floor division only loses mass, never creates it)
    assert(ranked.forall(_._2 > 0))
    assert(ranked.map(_._2).sum <= 1000000000000L)
    // the leaves are symmetric by construction and must tie exactly
    assert(ranked.tail.map(_._2).toSet.size === 1, ranked.mkString(","))
  }

  test("pmi collocations: gate rows match an in-memory recomputation, threshold and ranking respected") {
    val texts = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("text")
      .collect()
      .map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi  = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = t.split(" ", -1)
      w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      (0 until w.length - 1).foreach(i => bi((w(i), w(i + 1))) = bi.getOrElse((w(i), w(i + 1)), 0L) + 1)
    }
    val n = uni.values.sum.toDouble
    val m = (n - texts.length).toDouble
    def pmiOf(a: String, b: String, cab: Long): Double = {
      val raw = math.log(cab.toDouble * n * n / (uni(a).toDouble * uni(b).toDouble * m))
      BigDecimal(raw.toString).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = bi.toSeq
      .collect { case ((a, b), c) if c >= 5 => (a, b, c, pmiOf(a, b, c)) }
      .sortBy { case (a, b, _, p) => (-p, a, b) }
      .take(15)
    val got = graft.SparkEntry
      .queries("q_text_pmi")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected, s"got ${got.take(3)} expected ${expected.take(3)}")
  }

  test("dup spectrum: planted corpus yields exact per-width totals, widths past every doc emit no row") {
    import org.apache.spark.sql.functions.{count => fcount}
    // "a b a b" + "a b c": 1-grams 7 total / 3 distinct; 2-grams 5 total /
    // 3 distinct ("a b" x3, "b a", "b c"); 4-grams 1/1; no doc has 8 tokens
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val defn = graft.SparkEntry.all.find(_.name == "q_text_dup_spectrum").get
    // rebuild the query body over the planted frame (the gate query is
    // dir-bound; the operator logic is the n-gram explode + aggregate)
    val t = split(col("text"), " ")
    val rows = docs
      .select(explode(flatten(array(Seq(1, 2, 4, 8).map(n =>
        when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => struct(lit(n.toLong).as("n"), md5(array_join(slice(t, i, lit(n)), " ")).as("h"))))
          .otherwise(array().cast("array<struct<n:bigint,h:string>>"))): _*))).as("g"))
      .groupBy(col("g.n").as("n"))
      .agg(fcount(lit(1)).as("total"), countDistinct(col("g.h")).as("distinct"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    assert(rows === Seq((1L, 7L, 3L), (2L, 5L, 3L), (4L, 1L, 1L)), rows.mkString(","))
    assert(defn.oracle.nonEmpty)
    // and the fixture-backed gate query carries all four widths with a
    // monotone-nonincreasing dup fraction past n=1 (copied passages decay)
    val gate = graft.SparkEntry
      .queries("q_text_dup_spectrum")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(gate.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    gate.foreach { case (n, total, distinct, frac) =>
      assert(distinct <= total && frac === (total - distinct).toDouble / total, s"n=$n")
    }
  }

  test("language ID predicts by stopword evidence, 'und' without evidence") {
    val en = "the cat sat on the mat and the dog is in a box"
    val es = "el perro y la casa de los vecinos en que vivimos"
    val de = "der hund und die katze das ist mit uns"
    val xx = "zzz qqq www rrr ttt"
    val out = langidOn(Seq((1L, en, "en"), (2L, es, "es"), (3L, de, "de"), (4L, xx, "xx")))
    assert(out(en) === "en")
    assert(out(es) === "es")
    assert(out(de) === "de")
    assert(out(xx) === "und")
  }

  test("quality score is bounded and orders clean text above junk") {
    val q = SparkEntry_quality(
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog in a field of green grass"),
        (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")
      )
    )
    assert(q(1L) > q(2L), s"clean text must outscore junk: $q")
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0, s"score out of [0,1]: $q"))
  }

  private def SparkEntry_quality(rows: Seq[(Long, String)]): Map[Long, Double] =
    TextAnalysis
      .qualityFrame(rows.toDF("doc_id", "text"))
      .select(col("doc_id"), col("quality"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

  test("fingerprint is whitespace/case-normalized") {
    val a = "Hello   World  FOO"
    val b = "hello world foo"
    val out = Seq((1L, a), (2L, b))
      .toDF("doc_id", "text")
      .select(md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .collect()
      .map(_.getString(0))
    assert(out(0) === out(1))
  }

  test("repetition frame counts the dominant token in one map-side pass") {
    val rows = TextAnalysis
      .repetitionFrame(Seq((1L, "spam spam spam eggs"), (2L, "all tokens differ here")).toDF("doc_id", "text"))
      .select(col("doc_id"), col("top_c"), col("n_tok"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(1L) === ((3L, 4L)))
    assert(rows(2L) === ((1L, 4L)))
  }

  test("BPE-ish tokenization splits letters, digits, punctuation") {
    val n = Seq(Tuple1("ab12 cd! x9"))
      .toDF("text")
      .select(size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)")).as("n"))
      .collect()(0)
      .getInt(0)
    // ab, 12, cd, !, x, 9
    assert(n === 6)
  }

  test("chunking covers every char: stride prefixes reassemble the document") {
    val doc = ("abcdefghij" * 37).take(367) // not a multiple of the stride
    val chunks = graft.SparkEntry
      .queries("q_text_chunks")(spark, TestSpark.sfDir)
      .sparkSession // reuse the session; chunk the constructed doc directly
      .createDataFrame(Seq((1L, doc))).toDF("doc_id", "text")
      .select(
        col("doc_id"),
        explode(sequence(lit(0), greatest(ceil(length(col("text")) / 150.0).cast("int"), lit(1)) - 1)).as("i")
      )
      .select(col("i"), col("doc_id"))
      .count()
    // ceil(367/150) = 3 chunks; starts 0/150/300 with window 200 cover [0, 367)
    assert(chunks === 3)
    val fromQuery = graft.SparkEntry.queries("q_text_chunks")(spark, TestSpark.sfDir).collect()
    fromQuery.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val idx = rows.map(_.getLong(1)).sorted
      assert(idx.head === 0L, "chunk indexes start at 0")
      assert(idx === (idx.head to idx.last), "chunk indexes are dense")
    }
    // overlap invariant: every chunk but the last is the full 200-char window
    // only when the doc extends past it; all lengths are positive and bounded
    assert(fromQuery.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 200))
  }

  test("entropy separates repeated boilerplate from diverse text") {
    import org.apache.spark.sql.functions.{explode, split, count => fcount, lit, log => fln, sum => fsum}
    def entropyOf(text: String): Double = {
      val h = Seq((1L, text))
        .toDF("doc_id", "text")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .groupBy(col("doc_id"), col("ch"))
        .agg(fcount(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg((fln(fsum(col("c"))) - fsum(col("c") * fln(col("c"))) / fsum(col("c"))).as("h"))
        .collect()(0)
        .getDouble(1)
      h
    }
    val boiler  = entropyOf("aaaaaaaaaaaaaaaaaaaaaaaa")
    val diverse = entropyOf("the quick brown fox jumps")
    assert(math.abs(boiler) < 1e-9, "single-char text has zero entropy")
    assert(diverse > 2.0, s"diverse text should exceed 2 nats, got $diverse")
  }

  test("temperature sampling flattens the source distribution within the budget") {
    val rows = graft.SparkEntry.queries("q_sample_temperature")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, sampled, f) =>
      assert(f > 0.0 && f <= 1.0, s"$src keep_frac out of range: $f")
      assert(sampled <= n, s"$src sampled more than it has")
    }
    // flattening: the largest source must keep a SMALLER fraction than the
    // smallest (sqrt weighting downsamples big sources relative to small)
    val biggest  = rows.maxBy(_._2)
    val smallest = rows.minBy(_._2)
    if (biggest._2 > smallest._2)
      assert(biggest._4 < smallest._4,
        s"big source ${biggest._1} (f=${biggest._4}) must keep less than small ${smallest._1} (f=${smallest._4})")
    // the budget is ~20% of the corpus: md5 buckets are uniform, so the
    // realized total tracks sum(f_s * n_s) = min-capped 0.2 * N closely
    val total   = rows.map(_._2).sum.toDouble
    val sampled = rows.map(_._3).sum.toDouble
    assert(sampled > total * 0.1 && sampled < total * 0.35,
      s"realized sample ${sampled.toLong} should track the 20% budget of ${total.toLong}")
  }

  test("bigram LM score sinks improbable word sequences below natural ones") {
    import spark.implicits._
    val natural = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox runs over the lazy dog",
      "the quick brown cat jumps over the lazy dog",
      "a quick brown fox jumps over a sleepy dog"
    )
    // junk doc: every bigram is unique in the corpus, so each term is
    // ln(1) - ln(context) — maximally improbable under the corpus LM
    val junk = "zq xv ql pk wj nf rb td gm hc"
    val docs = (natural.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") } :+
      ((99L, junk, "en"))).toDF("doc_id", "text", "lang")
    val scores = TextAnalysis.lmScores(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores.size === 5, "every doc with >= 2 tokens gets a score")
    val junkScore = scores(99L)
    natural.indices.foreach { i =>
      assert(junkScore < scores(i.toLong),
        s"junk doc ($junkScore) must score below natural doc $i (${scores(i.toLong)})")
    }
  }

  test("boilerplate census surfaces a planted repeated 13-gram with exact occurrence counts") {
    import spark.implicits._
    val banner = (1 to 13).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (0L, banner + " " + (1 to 10).map(i => s"u$i").mkString(" ")),
      (1L, (1 to 10).map(i => s"v$i").mkString(" ") + " " + banner),
      (2L, banner + " " + banner), // repeated within ONE doc: n_occ counts both, n_docs once
      (3L, (1 to 20).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repeatedGrams(docs).collect()
    // the banner's boundary rotations in the doubled doc each occur once, so
    // ONLY the banner itself survives n_occ > 1
    assert(rows.length === 1, s"only the banner repeats, got ${rows.toSeq}")
    val hit = rows.head
    assert(hit.getString(0) === banner)
    assert(hit.getLong(1) === 4L, "2 solo occurrences + 2 in the doubled doc")
    assert(hit.getLong(2) === 3L, "doc reach counts each doc once")
    assert(hit.getLong(3) === 0L, "first_doc is the min doc_id")
  }

  test("novelty: a copied doc zeroes both copies' novelty, a disjoint doc scores 1.0") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val c = (1 to 20).map(i => s"v$i").mkString(" ")
    val docs = Seq((0L, a), (1L, a), (2L, c)).toDF("doc_id", "text")
    val rows = TextAnalysis
      .noveltyScores(docs)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 20 tokens -> 8 distinct 13-grams per doc
    assert(rows.toSeq === Seq((0L, 8L, 0L, 0.0), (1L, 8L, 0L, 0.0), (2L, 8L, 8L, 1.0)),
      "grams shared with the copy are non-novel for BOTH docs; the disjoint doc is fully novel")
  }

  test("gopher rule flags: five docs each violating exactly one rule, one passing all") {
    import spark.implicits._
    def words(n: Int, prefix: String) = (1 to n).map(i => (prefix + i.toString).padTo(5, 'x'))
    // 58 distinct 2-char tokens from the aa..cf letter-pair range — no
    // 2-char stopword (of/to/in/is) starts with a, b, or c
    val twoChar  = (for { a <- 'a' to 'c'; b <- 'a' to 'z' } yield s"$a$b").take(58)
    val pass     = ("the a " + words(58, "p").mkString(" "))                 // 60 tok, all rules green
    val tooShort = ("the a " + words(8, "s").mkString(" "))                  // 10 tok: fail_len only
    val shortToks = ("a the " + twoChar.mkString(" "))                       // mean len 2.0: fail_meanlen only
    val lowTtr   = (Seq.fill(3)("the a " + words(18, "t").mkString(" "))).mkString(" ") // each tok 3x: ttr 1/3
    val noStops  = words(60, "n").mkString(" ")                              // fail_stopword only
    val repeated = ("the a " + Seq.fill(12)("zzzzz").mkString(" ") + " " + words(46, "r").mkString(" ")) // top frac 12/60
    val docs = Seq(
      (0L, pass), (1L, tooShort), (2L, shortToks), (3L, lowTtr), (4L, noStops), (5L, repeated)
    ).toDF("doc_id", "text")
    val flags = TextAnalysis
      .gopherFlags(docs, minMeanTokLen = 4.0, minTtr = 0.4, maxTopTokFrac = 0.125)
      .orderBy("doc_id")
      .select("fail_len", "fail_meanlen", "fail_ttr", "fail_stopword", "fail_repetition", "pass_all")
      .collect()
      .map(r => (0 to 5).map(r.getBoolean))
    assert(flags(0) === Seq(false, false, false, false, false, true), s"pass doc: ${flags(0)}")
    assert(flags(1) === Seq(true, false, false, false, false, false), s"short doc: ${flags(1)}")
    assert(flags(2) === Seq(false, true, false, false, false, false), s"short tokens: ${flags(2)}")
    assert(flags(3) === Seq(false, false, true, false, false, false), s"low ttr: ${flags(3)}")
    assert(flags(4) === Seq(false, false, false, true, false, false), s"no stopwords: ${flags(4)}")
    assert(flags(5) === Seq(false, false, false, false, true, false), s"repeated token: ${flags(5)}")
  }

  test("weighted sampling favors heavy docs and is deterministic") {
    val out1 = graft.SparkEntry.queries("q_sample_weighted")(spark, TestSpark.sfDir).collect()
    val out2 = graft.SparkEntry.queries("q_sample_weighted")(spark, TestSpark.sfDir).collect()
    assert(out1.map(_.getLong(0)).toSeq === out2.map(_.getLong(0)).toSeq, "reproducible")
    assert(out1.length === 20)
    // A-ES property: the sampled set's mean weight exceeds the corpus mean
    // (priority u^(1/w) stochastically increases with w)
    val corpusMean = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .agg(avg(col("n_chars")))
      .collect()(0)
      .getDouble(0)
    val sampleMean = out1.map(_.getLong(1)).sum.toDouble / out1.length
    assert(sampleMean > corpusMean, s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("q_pii_redact finds the planted PII and the masked text carries none") {
    val out = graft.SparkEntry.queries("q_pii_redact")(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // every doc gets exactly one planted email/phone/IP; word-soup text
      // can only add to the counts, never subtract
      assert(r.getAs[Long]("n_emails") >= 1L)
      assert(r.getAs[Long]("n_phones") >= 1L)
      assert(r.getAs[Long]("n_ips") >= 1L)
      assert(r.getAs[String]("redacted_md5").length === 32)
    }
    // end-to-end masking check on a hand-built row: redact, then re-scan
    import spark.implicits._
    val masked = Seq("write a@b.co or 555-1234 from 192.168.0.1 twice a@b.co")
      .toDF("seeded")
      .select(
        org.apache.spark.sql.functions
          .regexp_replace(
            org.apache.spark.sql.functions.regexp_replace(
              org.apache.spark.sql.functions
                .regexp_replace(col("seeded"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
              "555-[0-9]{4}",
              "<PHONE>"
            ),
            "([0-9]{1,3}\\.){3}[0-9]{1,3}",
            "<IP>"
          )
          .as("r")
      )
      .collect()(0)
      .getString(0)
    assert(masked === "write <EMAIL> or <PHONE> from <IP> twice <EMAIL>", masked)
  }

  test("q_quality_classifier: hashed-bucket weights bound the logit and keep tracks its sign") {
    val out = graft.SparkEntry.queries("q_quality_classifier")(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nTok  = r.getAs[Long]("n_tok")
      val w10   = r.getAs[Long]("w10_sum")
      val score = r.getAs[Double]("score")
      assert(nTok >= 1L)
      // per-token weight is in [-0.3, 0.3], so the mean is too
      assert(math.abs(score) <= 0.3 + 1e-12, s"score $score out of the weight envelope")
      assert(score === w10.toDouble / (10.0 * nTok))
      assert(r.getAs[Boolean]("keep") === (w10 > 0L))
    }
    // hand-check one token against the bucket formula the doc promises:
    // bucket = first 4 hex chars of md5, weight*10 = bucket % 64 % 7 - 3
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = java.lang.Long.parseLong(md5hex.take(4), 16)
    val expected = (bucket % 64 % 7) - 3
    import spark.implicits._
    val got = Seq("hello").toDF("text")
      .select(
        org.apache.spark.sql.functions.aggregate(
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.split(col("text"), " "),
            t => (org.apache.spark.sql.functions
              .conv(org.apache.spark.sql.functions.substring(org.apache.spark.sql.functions.md5(t), 1, 4), 16, 10)
              .cast("long") % 64 % 7) - 3
          ),
          org.apache.spark.sql.functions.lit(0L),
          (acc, x) => acc + x
        ).as("w")
      )
      .collect()(0)
      .getLong(0)
    assert(got === expected)
  }

  test("zipfFit: a planted power-law corpus scores slope near -1, a uniform one near 0") {
    // rank-k token appears floor(400/k) times -> ln(freq) = ln(400) - ln(rank)
    val zipfToks = (1 to 40).flatMap(k => Seq.fill(400 / k)(s"w$k"))
    val uniToks  = (1 to 40).flatMap(k => Seq.fill(10)(s"w$k"))
    def fit(toks: Seq[String]) = {
      val r = TextAnalysis
        .zipfFit(Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"))
        .collect()(0)
      (r.getDouble(0), r.getDouble(2), r.getLong(3), r.getLong(4))
    }
    val (zSlope, zR2, zVocab, zN) = fit(zipfToks)
    assert(zVocab === 40L && zN === zipfToks.size.toLong)
    assert(zSlope < -0.9 && zSlope > -1.1, s"power-law corpus must fit slope ~ -1, got $zSlope")
    assert(zR2 > 0.95, s"power-law fit must be tight, got r2=$zR2")
    val (uSlope, _, uVocab, _) = fit(uniToks)
    assert(uVocab === 40L)
    assert(math.abs(uSlope) < 0.05, s"uniform corpus must fit flat, got $uSlope")
  }

  test("heapsFit: all-fresh vocabulary fits beta ~ 1, a saturated corpus fits beta 0") {
    // 40 docs, ids spread over every mod-10 step, 10 tokens each
    def corpus(fresh: Boolean) = (1 to 40).map { k =>
      val toks =
        if (fresh) (1 to 10).map(i => s"w$k-$i") else (1 to 10).map(i => s"w$i")
      (k.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    def fit(fresh: Boolean) = {
      val r = TextAnalysis.heapsFit(corpus(fresh)).collect()(0)
      (r.getDouble(0), r.getDouble(2), r.getLong(3), r.getLong(4))
    }
    val (bFresh, r2Fresh, vFresh, nFresh) = fit(true)
    assert(vFresh === 400L && nFresh === 400L)
    assert(math.abs(bFresh - 1.0) < 1e-6 && math.abs(r2Fresh - 1.0) < 1e-6,
      s"every-token-fresh growth must fit V = n exactly: beta=$bFresh r2=$r2Fresh")
    val (bSat, _, vSat, _) = fit(false)
    assert(vSat === 10L)
    assert(math.abs(bSat) < 1e-6, s"saturated vocabulary must fit flat: beta=$bSat")
  }
}
