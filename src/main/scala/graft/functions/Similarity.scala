package graft.functions

import scala.collection.immutable.ListMap

/** Ratcliff–Obershelp similarity (difflib.SequenceMatcher.ratio parity)
  * and the nickname-equivalence table.
  * Reference: normalization.py:392-393, 697-735.
  */
object Similarity {

  /** Test-only observability (meaningful under local[] masters, where
    * executors share the driver JVM): counts every Ratcliff–Obershelp
    * evaluation — typed path and codegen expression both funnel
    * through [[seqRatio]]. Pins the clause-order contract that
    * junk-key candidate pairs die at the alignment gate with ZERO R-O
    * calls (PipelineSpec). LongAdder: contention-free increment,
    * negligible next to the O(|a|·|b|) matching below. */
  private[graft] val evalCount = new java.util.concurrent.atomic.LongAdder

  /** SequenceMatcher.ratio(): 2*M / (|a|+|b|) where M sums the lengths
    * of recursively-found longest matching blocks. Ties resolved like
    * difflib: lowest i, then lowest j. (Autojunk only affects sequences
    * ≥200 chars — names never hit it.) Case-folded like `seq_ratio`. */
  def seqRatio(aRaw: String, bRaw: String): Double = {
    evalCount.increment()
    val a = Option(aRaw).getOrElse("").toLowerCase
    val b = Option(bRaw).getOrElse("").toLowerCase
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    // b-side index: char -> positions (difflib's b2j)
    val b2j = scala.collection.mutable.Map.empty[Char, List[Int]]
    for (j <- b.length - 1 to 0 by -1) b2j(b(j)) = j :: b2j.getOrElse(b(j), Nil)

    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = Map.empty[Int, Int]
      for (i <- alo until ahi) {
        var newj2len = Map.empty[Int, Int]
        for (j <- b2j.getOrElse(a(i), Nil)) {
          if (j >= blo && j < bhi) {
            val k = j2len.getOrElse(j - 1, 0) + 1
            newj2len += (j -> k)
            if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
          }
        }
        j2len = newj2len
      }
      (besti, bestj, bestsize)
    }

    var matches = 0
    val queue = scala.collection.mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, j, k) = longestMatch(alo, ahi, blo, bhi)
      if (k > 0) {
        matches += k
        queue.push((alo, i, blo, j))
        queue.push((i + k, ahi, j + k, bhi))
      }
    }
    2.0 * matches / (a.length + b.length)
  }

  /** UTF8String entry point for the codegen'd Catalyst expression
    * ([[graft.plans.SeqRatio]]): generated Java calls this static
    * forwarder directly, no boxing beyond the unavoidable String
    * materialization the algorithm needs. */
  def ratioUTF8(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    seqRatio(if (a == null) "" else a.toString, if (b == null) "" else b.toString)

  /** Nickname roots (normalization.py:707-731). Later entries overwrite
    * earlier on shared variants, mirroring the reference's dict-build
    * order (e.g. "john" resolves to "jonathan", "kate" to "catherine"). */
  private val NickMap: Seq[(String, Seq[String])] = Seq(
    "william" -> Seq("william", "will", "bill", "billy", "liam"),
    "robert" -> Seq("robert", "rob", "bob", "bobby", "robby"),
    "richard" -> Seq("richard", "rich", "rick", "ricky", "dick"),
    "edward" -> Seq("edward", "ed", "eddie", "ted", "teddy", "ned"),
    "margaret" -> Seq("margaret", "meg", "maggie", "peggy"),
    "elizabeth" -> Seq("elizabeth", "liz", "beth", "lizzy", "eliza", "liza", "betsy"),
    "katherine" -> Seq("katherine", "kathy", "kate", "katie", "cathy", "cait"),
    "alexander" -> Seq("alexander", "alex", "sasha"),
    "james" -> Seq("james", "jim", "jimmy", "jamie"),
    "john" -> Seq("john", "jack", "johnny"),
    "jonathan" -> Seq("jonathan", "jon", "john"),
    "joseph" -> Seq("joseph", "joe", "joey"),
    "matthew" -> Seq("matthew", "matt"),
    "michael" -> Seq("michael", "mike", "mikey"),
    "jeffrey" -> Seq("jeffrey", "jeff"),
    "andrew" -> Seq("andrew", "andy", "drew"),
    "steven" -> Seq("steven", "steve", "stevie"),
    "christopher" -> Seq("christopher", "chris", "kit"),
    "patrick" -> Seq("patrick", "pat", "paddy"),
    "nicholas" -> Seq("nicholas", "nick", "nicky"),
    "catherine" -> Seq("catherine", "cathy", "kate", "katie"),
    "francis" -> Seq("francis", "frank", "frankie"))

  val VariantToRoot: Map[String, String] = {
    var m = ListMap.empty[String, String]
    for ((root, variants) <- NickMap; v <- variants) m += (TextNorm.norm(v) -> root)
    m
  }

  def nicknameRoot(name: String): String = {
    val n = TextNorm.norm(name)
    VariantToRoot.getOrElse(n, n)
  }

  def nicknameEquivalent(a: String, b: String): Boolean =
    a != null && b != null && a.nonEmpty && b.nonEmpty &&
      nicknameRoot(a) == nicknameRoot(b)
}
