package graft.kg

import scala.collection.mutable

import graft.model.{Doc, Span}

/** Pseudo-reference oracle (SURVEY.md §5.3): a deliberately naive,
  * single-threaded implementation of the exact KG-construction spec the
  * engine implements. No Spark. The engine must hit P/R = 1.0 against
  * this on the seeded golden corpus; when the real reference lands, its
  * outputs replace these (SURVEY.md §0.4).
  */
object NaiveOracle {

  def isWordChar(c0: Char): Boolean = {
    val c = Character.toLowerCase(c0)
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
  }

  def normalize(s: String): String = {
    val sb = new StringBuilder
    var pending = false
    s.foreach { c0 =>
      val c = Character.toLowerCase(c0)
      if (isWordChar(c)) {
        if (pending && sb.nonEmpty) sb.append(' ')
        pending = false
        sb.append(c)
      } else pending = true
    }
    sb.toString
  }

  /** All boundary-respecting case-insensitive occurrences of `pat`
    * (already lower-cased) in `text`. */
  private def occurrences(text: String, pat: String): Seq[(Int, Int)] = {
    val lower = text.map(Character.toLowerCase)
    val out = mutable.ArrayBuffer.empty[(Int, Int)]
    var from = 0
    while (from <= lower.length - pat.length) {
      val i = lower.indexOf(pat, from)
      if (i < 0) from = lower.length + 1
      else {
        val e = i + pat.length
        val bl = i == 0 || !isWordChar(text.charAt(i - 1))
        val br = e == text.length || !isWordChar(text.charAt(e))
        if (bl && br) out += ((i, e))
        from = i + 1
      }
    }
    out.toSeq
  }

  /** Longest-match-wins, non-overlapping mention matches. Mirrors
    * AcTrie.matches: candidates sorted by (begin asc, len desc, pattern
    * asc), greedy left-to-right sweep. */
  def matches(text: String, gaz: Seq[(String, String)]): Seq[(Int, Int, String, String)] = {
    val pats = {
      val seen = mutable.LinkedHashMap.empty[String, String]
      gaz.foreach { case (s, t) =>
        val k = s.toLowerCase
        if (k.nonEmpty && !seen.contains(k)) seen(k) = t
      }
      seen.toSeq
    }
    val all = pats.flatMap { case (p, t) =>
      occurrences(text, p).map { case (b, e) => (b, e, p, t) }
    }
    val sorted = all.sortBy { case (b, e, p, _) => (b, -(e - b), p) }
    val kept = mutable.ArrayBuffer.empty[(Int, Int, String, String)]
    var lastEnd = 0
    sorted.foreach { m =>
      if (m._1 >= lastEnd) { kept += m; lastEnd = m._2 }
    }
    kept.toSeq
  }

  final case class Mention(docId: String, spanIdx: Int, surface: String,
                           coarseType: String, nOcc: Long)

  def mentions(docs: Seq[Doc], gaz: Seq[(String, String)]): Seq[Mention] =
    docs.flatMap { d =>
      d.spans.zipWithIndex.collect { case (Span("text", text, _, _), idx) =>
        matches(text, gaz).map { case (b, e, _, t) =>
          ((d.doc_id, idx, normalize(text.substring(b, e)), t), 1L)
        }
      }.flatten
    }.groupMapReduce(_._1)(_._2)(_ + _)
      .map { case ((doc, idx, surf, t), n) => Mention(doc, idx, surf, t, n) }
      .toSeq

  final case class Link(docId: String, spanIdx: Int, surface: String,
                        coarseType: String, entityId: String, score: Double)

  /** anchorDict: surface → (entity, prior)*; boost mirrors the engine's
    * context hook. Tie-break: lexicographic max of (score, entity). */
  def links(ms: Seq[Mention], anchorDict: Map[String, Seq[(String, Double)]],
            boost: (String, String) => Double): Seq[Link] =
    ms.flatMap { m =>
      anchorDict.getOrElse(m.surface, Nil).map { case (ent, prior) =>
        Link(m.docId, m.spanIdx, m.surface, m.coarseType, ent,
          prior * boost(ent, m.docId) * (1.0 + m.nOcc))
      } match {
        case Nil => None
        case cands => Some(cands.maxBy(l => (l.score, l.entityId)))
      }
    }

  /** Union-find connected components; canonical = min of component. */
  def canonical(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // path-compress to the min: find() roots are already component mins
    // because union always parents the larger root under the smaller.
    nodes.map(n => n -> find(n)).toMap
  }

  /** Full naive DAG → triple set. */
  def triples(docs: Seq[Doc], gaz: Seq[(String, String)],
              anchorDict: Map[String, Seq[(String, Double)]],
              aliasEdges: Seq[(String, String)],
              boost: (String, String) => Double): Set[(String, String, String)] = {
    val canon = canonical(aliasEdges)
    val lks = links(mentions(docs, gaz), anchorDict, boost)
      .map(l => l.copy(entityId = canon.getOrElse(l.entityId, l.entityId)))
    val mentionT = lks.map(l => (l.entityId, "mentionedIn", s"doc:${l.docId}"))
    val typingT = lks.map(l => (l.entityId, "hasType", l.coarseType))
    val mediaBySpan: Map[String, Seq[(Int, String)]] = docs.map { d =>
      d.doc_id -> d.spans.zipWithIndex.collect {
        case (s, i) if s.kind != "text" => (i, s.media_ref)
      }
    }.toMap
    val mediaT = lks.flatMap { l =>
      mediaBySpan.getOrElse(l.docId, Nil).collect {
        case (mi, ref) if mi == l.spanIdx - 1 || mi == l.spanIdx + 1 =>
          (l.entityId, "depictedIn", ref)
      }
    }
    (mentionT ++ typingT ++ mediaT).toSet
  }
}
