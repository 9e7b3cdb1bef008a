package graft

import graft.functions.{Ids, Names, Phones, Similarity, TextNorm}
import graft.sources.Channels
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure function kernels (SURVEY.md §5:
  * E.164 fallback, name parsing, label normalization, UUIDv5).
  * ScalaCheck runs under sbt's native framework support.
  */
object FunctionProps extends Properties("functions") {

  private val digits10 = Gen.listOfN(10, Gen.numChar).map(_.mkString)
  private val nameToken = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(12))
  private val freeText = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar), (2, Gen.oneOf(' ', '.', '-', ',', '\'')))).map(_.mkString.take(60))

  property("e164: any 10-digit number gets +1") = forAll(digits10) { d =>
    Phones.formatE164(d) == s"+1$d"
  }

  property("e164: 11 digits starting with 1 get +") = forAll(digits10) { d =>
    Phones.formatE164("1" + d) == s"+1$d"
  }

  property("e164 idempotent on its own output") = forAll(digits10) { d =>
    val once = Phones.formatE164(d)
    Phones.formatE164(once) == once
  }

  property("uuid5 deterministic, version 5, RFC 4122 variant") = forAll(freeText) { s =>
    val u = Ids.uuid5(s)
    u == Ids.uuid5(s) &&
      u.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")
  }

  property("norm idempotent") = forAll(freeText) { s =>
    val n = TextNorm.norm(s)
    TextNorm.norm(n) == n
  }

  property("norm output lowercase, single-spaced") = forAll(freeText) { s =>
    val n = TextNorm.norm(s)
    n == n.toLowerCase && !n.contains("  ") && n == n.trim
  }

  property("normLabel idempotent") = forAll(freeText) { s =>
    val l = TextNorm.normLabel(s)
    TextNorm.normLabel(l) == l
  }

  property("seqRatio: identity is 1, bounded [0,1]") = forAll(nameToken, nameToken) { (a, b) =>
    val r = Similarity.seqRatio(a, b)
    Similarity.seqRatio(a, a) == 1.0 && r >= 0.0 && r <= 1.0
  }

  property("seqRatio: empty-vs-nonempty is 0") = forAll(nameToken) { a =>
    Similarity.seqRatio(a, "") == 0.0 && Similarity.seqRatio("", "") == 1.0
  }

  property("nicknameEquivalent symmetric") = forAll(nameToken, nameToken) { (a, b) =>
    Similarity.nicknameEquivalent(a, b) == Similarity.nicknameEquivalent(b, a)
  }

  property("parseMultiLast: parts re-assemble from original tokens") =
    forAll(Gen.choose(1, 4), Gen.listOfN(4, nameToken)) { (n, tokens) =>
      val name = tokens.take(n).mkString(" ")
      val (first, middle, last) = Names.parseMultiLast(name)
      val out = Seq(first, middle, last).filter(_.nonEmpty).flatMap(_.split(" "))
      out.forall(name.split(" ").contains) || name.trim.isEmpty
    }

  property("stripPhoneExtension: extension is <=6 digits; no ext leaves input intact") =
    forAll(digits10, Gen.choose(1, 999999)) { (d, ext) =>
      val (_, e1) = Channels.stripPhoneExtension(s"$d;$ext")
      val (base2, e2) = Channels.stripPhoneExtension(d)
      e1 == ext.toString && e1.length <= 6 && base2 == d && e2.isEmpty
    }

  property("vcard unescape removes escaped separators") = Prop {
    Channels.unescapeVcard("""a\;b\,c\nd\\e""") == "a;b,c\nd\\e"
  }

  // q50's JIT normalization kernel must be char-identical to the
  // oracle's lower(regexp_replace(s, '[^a-zA-Z0-9]', '')) on ANY
  // input, including non-ASCII and surrogate pairs (each UTF-16 unit
  // of a pair matches the negated class individually and is dropped).
  private val anyText = Gen.listOf(Gen.frequency(
    (6, Gen.alphaNumChar), (2, Gen.oneOf(' ', '.', 'é', '中', '\ud83d', '\ude00')),
    (1, Gen.choose(Char.MinValue, Char.MaxValue)))).map(_.mkString)

  property("alnumLower == lower(regexp_replace) on arbitrary text") =
    forAll(anyText) { s =>
      queries.alnumLower(s) ==
        s.replaceAll("[^a-zA-Z0-9]", "").toLowerCase(java.util.Locale.ROOT)
    }

  property("alnumLower(keepSpace) == space-preserving regex form") =
    forAll(anyText) { s =>
      queries.alnumLower(s, keepSpace = true) ==
        s.replaceAll("[^a-zA-Z0-9 ]", "").toLowerCase(java.util.Locale.ROOT)
    }

  // q34's JIT shingle strings must equal the Catalyst
  // transform/concat_ws lambda: every position, no dedupe, same order.
  private val tokenList = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar)
    .map(_.mkString.take(8)))

  property("shingleStrings(3) == sliding-3 join on token arrays") =
    forAll(tokenList) { toks =>
      val expected =
        if (toks.length < 3) Seq.empty[String]
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      queries.shingleStrings(toks, 3) == expected
    }

  // q94's JIT char-4-gram hash kernel must be bit-identical per
  // position to the h60 expression form: md5 of the UTF-8 gram, first
  // 15 hex digits parsed base-16 (an independent reference path from
  // the kernel's byte fold), first-occurrence distinct.
  property("gram4H60 == hex-parsed h60 of sliding-4 grams, distinct") =
    forAll(anyText) { s =>
      val expected = collection.mutable.LinkedHashSet.empty[Long]
      if (s.length >= 4) s.sliding(4).foreach { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        expected.add(java.lang.Long.parseLong(hex.take(15), 16))
      }
      queries.gram4H60(s) == expected.toSeq
    }
}
