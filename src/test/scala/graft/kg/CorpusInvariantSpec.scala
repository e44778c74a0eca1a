package graft.kg

import scala.util.Random

import graft.SparkSuite
import graft.model.{Doc, Span}

/** The contract's per-row invariant (BASELINE.json input_hint):
  * span-sequence equality on (kind, text, media_ref, order) after any
  * explode/regroup. Seeded adversarial generator (FIXTURES.md §2):
  * empty span arrays, media-only docs, duplicate surfaces, unicode,
  * out-of-order `offset` values (offsets are DATA — array order is the
  * contract; regroup must not re-sort by them).
  */
class CorpusInvariantSpec extends SparkSuite {

  private def genDocs(rnd: Random, n: Int): Seq[Doc] = {
    val texts = Seq("", "plain text", "Ünïcødé tëxt ✓", "dup dup dup",
      "a.b,c;d", "  spaces  ", "mixed CASE Words", "123 numeric 456")
    (0 until n).map { i =>
      val nSpans = rnd.nextInt(6) // includes 0: empty span arrays
      val spans = (0 until nSpans).map { j =>
        val kind = rnd.nextInt(3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "text"
        }
        Span(
          kind = if (rnd.nextInt(4) == 0) kind else "text",
          text = texts(rnd.nextInt(texts.length)),
          media_ref = if (kind == "text") "" else s"media://$i/$j",
          offset = rnd.nextInt(100)) // out-of-order offsets: preserved, not sorted
      }
      Doc(s"doc$i", spans)
    }
  }

  test("regroup(explode(docs)) preserves every doc's exact span sequence") {
    import spark.implicits._
    val rnd = new Random(20260816L)
    for (round <- 0 until 5) {
      val docs = genDocs(rnd, 50)
      val df = spark.createDataset(docs).toDF()
      val roundTripped = Corpus.regroupSpans(Corpus.explodeSpans(df))
        .as[Doc].collect().map(d => d.doc_id -> d.spans.toList).toMap
      val want = docs.filter(_.spans.nonEmpty) // explode drops empty arrays
        .map(d => d.doc_id -> d.spans.toList).toMap
      assert(roundTripped == want, s"round $round mismatch")
    }
  }

  test("explodeSpansAdj: adj_media ≡ neighbor-derived media refs on adversarial corpora") {
    import spark.implicits._
    val rnd = new Random(77L)
    val docs = genDocs(rnd, 60)
    val got = Corpus.explodeSpansAdj(spark.createDataset(docs).toDF())
      .select("doc_id", "span_idx", "adj_media")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getSeq[String](2).toList)
      .toMap
    // independent Scala derivation of the same contract: refs of the
    // directly adjacent non-text spans, nulls dropped, order prev→next
    val want = docs.flatMap { d =>
      d.spans.indices.map { i =>
        val adj = Seq(i - 1, i + 1)
          .filter(j => j >= 0 && j < d.spans.size).map(d.spans)
          .filter(s => s.kind != null && s.kind != "text")
          .map(_.media_ref).filter(_ != null)
        (d.doc_id, i) -> adj.toList
      }
    }.toMap
    assert(got == want)
    assert(got.values.exists(_.nonEmpty)) // generator produced media adjacency
  }

  test("explode preserves order witness and flattened fields") {
    import spark.implicits._
    val docs = Seq(Doc("x", Seq(
      Span("text", "first", "", 9),
      Span("image", "cap", "media://x/1", 3),
      Span("text", "last", "", 7))))
    val rows = Corpus.explodeSpans(spark.createDataset(docs).toDF())
      .orderBy("span_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(rows.map(_.getString(2)).toSeq == Seq("text", "image", "text"))
    assert(rows.map(_.getInt(5)).toSeq == Seq(9, 3, 7)) // offsets are data
  }
}
