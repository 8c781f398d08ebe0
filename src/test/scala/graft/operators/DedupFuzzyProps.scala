package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Levenshtein, Literal}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for `q_dedup_fuzzy`'s prune equivalence
  * ([[Dedup]] `q_dedup_fuzzy`): the engine prunes candidate pairs with a
  * codegen'd `|length(a) - length(b)| <= 2` compare before running the
  * thresholded `levenshtein(a, b, 2)` DP (−1 past the threshold), while the
  * DuckDB oracle runs the unthresholded `levenshtein(a, b) <= 2`. The
  * hash-green gate proves the two agree at one scale factor; these
  * properties pin the algebra itself on adversarial inputs — multi-byte
  * unicode (precomposed latin, CJK, astral-plane emoji that are surrogate
  * PAIRS in UTF-16 but single code points in UTF-8) is exactly where
  * `length`-vs-edit-distance unit assumptions crack, so the generator leans
  * on it and on clustered mutants that sit on both sides of the threshold.
  *
  * Driver-side only: both formulations evaluate the very Catalyst
  * [[Levenshtein]] expression the query compiles to (and `numChars`, the
  * unit `length(...)` counts), so no Spark jobs per case and the full
  * scalacheck case count stays cheap.
  */
object DedupFuzzyProps extends Properties("DedupFuzzyPrune") {

  // unit alphabet mixing 1-, 2-, 3-, and 4-byte UTF-8 code points; the
  // astral-plane entries are 2 UTF-16 chars but ONE code point — the classic
  // place a char-based length and a codepoint-based distance disagree
  private val unit: Gen[String] =
    Gen.oneOf("a", "b", "c", " ", "é", "ü", "ß", "漢", "字", "日", "😀", "🚀", "𝕏")

  private val baseStr: Gen[String] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, unit)).map(_.mkString)

  private def units(s: String): Vector[String] =
    s.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** 0–4 single-codepoint edits (insert / delete / substitute) — distances
    * cluster around the threshold, so both accept and reject sides of every
    * filter see traffic.
    */
  private def mutant(base: String): Gen[String] = {
    def edit(s: Vector[String]): Gen[Vector[String]] =
      Gen.oneOf(0, 1, 2).flatMap {
        case 0 => // insert
          for { pos <- Gen.choose(0, s.size); u <- unit } yield (s.take(pos) :+ u) ++ s.drop(pos)
        case 1 if s.nonEmpty => // delete
          Gen.choose(0, s.size - 1).map(pos => s.patch(pos, Nil, 1))
        case _ if s.nonEmpty => // substitute
          for { pos <- Gen.choose(0, s.size - 1); u <- unit } yield s.updated(pos, u)
        case _ => Gen.const(s)
      }
    Gen.choose(0, 4).flatMap { n =>
      (0 until n).foldLeft(Gen.const(units(base))) { (g, _) => g.flatMap(edit) }.map(_.mkString)
    }
  }

  /** A corpus of 1–2 mutant clusters (plus the bases) — up to ~12 strings,
    * so the all-pairs reference stays trivially cheap.
    */
  private val corpus: Gen[Vector[String]] =
    Gen.choose(1, 2).flatMap { k =>
      Gen.listOfN(
        k,
        baseStr.flatMap(b => Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, mutant(b))).map(b :: _))
      ).map(_.flatten.toVector)
    }

  private def lev(a: String, b: String, threshold: Option[Int]): Int =
    Levenshtein(Literal.create(a), Literal.create(b), threshold.map(t => Literal(t)))
      .eval(null)
      .asInstanceOf[Int]

  private def numChars(s: String): Int = UTF8String.fromString(s).numChars()

  property("length-prefilter + thresholded DP == brute-force levenshtein <= 2") =
    Prop.forAll(corpus) { xs =>
      val pairs = for { i <- xs.indices; j <- i + 1 until xs.size } yield (i, j)
      val pruned = pairs.filter { case (i, j) =>
        math.abs(numChars(xs(i)) - numChars(xs(j))) <= 2 && lev(xs(i), xs(j), Some(2)) >= 0
      }.toSet
      val brute = pairs.filter { case (i, j) => lev(xs(i), xs(j), None) <= 2 }.toSet
      Prop(pruned == brute) :| s"pruned=$pruned brute=$brute corpus=$xs"
    }

  property("thresholded DP returns the exact distance inside the threshold, -1 outside") =
    Prop.forAll(baseStr.flatMap(b => mutant(b).map(m => (b, m)))) { case (a, b) =>
      val exact = lev(a, b, None)
      val thr   = lev(a, b, Some(2))
      Prop(if (exact <= 2) thr == exact else thr == -1) :| s"a=$a b=$b exact=$exact thr=$thr"
    }

  property("distance <= 2 implies codepoint-length difference <= 2 (prune soundness)") =
    Prop.forAll(baseStr.flatMap(b => mutant(b).map(m => (b, m)))) { case (a, b) =>
      lev(a, b, None) > 2 || math.abs(numChars(a) - numChars(b)) <= 2
    }
}
