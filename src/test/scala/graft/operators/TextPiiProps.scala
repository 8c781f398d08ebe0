package graft.operators

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the PII redaction transform
  * ([[TextAnalysis.redactPii]] / the injected `redact_pii`): generated word
  * soup with PLANTED email/phone/IPv4 tokens must come back with exactly the
  * planted tokens masked, every plain word byte-identical, order preserved —
  * and the output must be a fixpoint (placeholders carry no '@' or digits,
  * so no second-pass match can form). Evaluated driver-side on the very
  * Catalyst expression tree `redactPiiBuilder` compiles to, so thousands of
  * cases cost no Spark jobs.
  *
  * Deliberately NOT Prop.forAll over arbitrary strings: chained global
  * regexp replacement is not idempotent on adversarial free text (a
  * replacement boundary can expose a new match, e.g. "a@b.cd@e.fg" leaves
  * "@e.fg" adjacent to the placeholder) — the same caveat every
  * pattern-based scrubber documents. The operator's contract is
  * token-separated text, which is what the generator produces.
  */
object TextPiiProps extends Properties("PiiRedact") {

  private def redact(s: String): String =
    TextAnalysis
      .redactPiiBuilder(Seq(Literal(s)))
      .eval(null)
      .asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString

  private val word: Gen[String] =
    for { n <- Gen.choose(1, 8); cs <- Gen.listOfN(n, Gen.alphaLowerChar) } yield cs.mkString

  private val email: Gen[String] = for {
    l <- word
    d <- word
    t <- Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
  } yield s"$l@$d.${t.mkString}"

  private val phone: Gen[String] = Gen.choose(0, 9999).map(n => f"555-$n%04d")

  private val ip: Gen[String] = Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))

  /** (raw token, what it must become after redaction) */
  private val piiToken: Gen[(String, String)] = Gen.oneOf(
    email.map(_ -> "<EMAIL>"),
    phone.map(_ -> "<PHONE>"),
    ip.map(_ -> "<IP>")
  )

  private val doc: Gen[List[(String, String)]] = for {
    n    <- Gen.choose(0, 24)
    toks <- Gen.listOfN(n, Gen.frequency(3 -> word.map(w => (w, w)), 2 -> piiToken))
  } yield toks

  property("planted PII masked, plain words verbatim, order preserved") =
    Prop.forAll(doc) { toks =>
      redact(toks.map(_._1).mkString(" ")) == toks.map(_._2).mkString(" ")
    }

  property("redacted output is a fixpoint") = Prop.forAll(doc) { toks =>
    val once = redact(toks.map(_._1).mkString(" "))
    redact(once) == once
  }
}
