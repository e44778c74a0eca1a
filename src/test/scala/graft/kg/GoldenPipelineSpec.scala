package graft.kg

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.{Doc, Span}

/** Golden end-to-end (SURVEY.md §5.3): seeded synthetic Wikipedia-like
  * interleaved corpus + dictionaries; the Spark engine's triples must
  * equal the single-threaded NaiveOracle's exactly (P/R = 1.0).
  */
object GoldenFixtures {
  // Overlapping, multi-word, case-noisy gazetteer — exercises
  // longest-match-wins and normalization.
  val gazetteer: Seq[(String, String)] = Seq(
    "york" -> "LOC", "new york" -> "LOC", "new york city" -> "LOC",
    "spark" -> "ORG", "apache spark" -> "ORG",
    "ada lovelace" -> "PER", "lovelace" -> "PER",
    "data" -> "MISC", "wiki" -> "MISC", "turing" -> "PER")

  val filler: Seq[String] = Seq(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "page", "article", "section", "history", "notes")

  val phrases: Seq[String] = gazetteer.map(_._1) ++ filler

  val separators: Seq[String] = Seq(" ", ", ", ". ", " - ", "; ")

  def mangleCase(s: String, rnd: Random): String =
    rnd.nextInt(4) match {
      case 0 => s.toUpperCase
      case 1 => s.capitalize
      case _ => s
    }

  def corpus(nDocs: Int, seed: Long): Seq[Doc] = {
    val rnd = new Random(seed)
    (0 until nDocs).map { i =>
      val nSpans = 1 + rnd.nextInt(5)
      val spans = (0 until nSpans).map { j =>
        if (rnd.nextInt(5) == 0)
          Span("image", s"caption ${rnd.nextInt(100)}", s"media://img/$i/$j", j)
        else {
          val nPhrases = 3 + rnd.nextInt(10)
          val body = (0 until nPhrases).map(_ =>
            mangleCase(phrases(rnd.nextInt(phrases.length)), rnd))
            .mkString(separators(rnd.nextInt(separators.length)))
          Span("text", body, "", j)
        }
      }
      Doc(s"d$i", spans)
    }
  }

  /** surface → candidate entities with priors. */
  val anchorDict: Map[String, Seq[(String, Double)]] =
    gazetteer.map { case (s, _) =>
      val key = s.replace(' ', '_')
      NaiveOracle.normalize(s) -> Seq(s"E1_$key" -> 0.6, s"E2_$key" -> 0.4)
    }.toMap

  val aliasEdges: Seq[(String, String)] = {
    val keys = gazetteer.map(_._1.replace(' ', '_'))
    keys.map(k => s"E2_$k" -> s"E1_$k") ++
      keys.filter(_.length % 2 == 0).map(k => s"E1_$k" -> s"E0_$k")
  }

  def boost(entity: String, docId: String): Double =
    if (entity.startsWith("E2_") && docId.stripPrefix("d").toLong % 3 == 0) 2.0 else 1.0
}

class GoldenPipelineSpec extends SparkSuite {
  import GoldenFixtures._

  test("engine triples == naive oracle triples (P/R = 1.0) on seeded corpus") {
    import spark.implicits._
    val docs = corpus(nDocs = 80, seed = 42L)
    val docsDf = spark.createDataset(docs).toDF()

    val anchorDf = anchorDict.toSeq
      .flatMap { case (surf, cands) => cands.map { case (e, p) => (surf, e, p) } }
      .toDF("alias_norm", "entity_id", "prior")
    val edgesDf = aliasEdges.toDF("src", "dst")

    val boostCol =
      when(col("entity_id").startsWith("E2_") &&
        regexp_replace(col("doc_id"), "d", "").cast("long") % 3 === 0, lit(2.0))
        .otherwise(lit(1.0))

    val got = Engine.run(docsDf, gazetteer, anchorDf, edgesDf, boostCol)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = NaiveOracle.triples(docs, gazetteer, anchorDict, aliasEdges, boost)

    val missing = want -- got
    val extra = got -- want
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(5)} extra=${extra.take(5)} " +
        s"(got ${got.size}, want ${want.size})")
    assert(got.nonEmpty)
  }

  test("mention stage alone matches naive oracle") {
    import spark.implicits._
    val docs = corpus(nDocs = 40, seed = 7L)
    val docsDf = spark.createDataset(docs).toDF()
    val got = Engine.mentions(Corpus.explodeSpans(docsDf), gazetteer)
      .collect()
      .map(r => NaiveOracle.Mention(r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    val want = NaiveOracle.mentions(docs, gazetteer).toSet
    assert(got == want, s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
  }

  test("in-expression mention counts ≡ occurrence-stream groupBy (r3 zero-shuffle path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => fcount, lit => flit}
    val docs = corpus(nDocs = 40, seed = 13L)
    val spans = Corpus.explodeSpans(spark.createDataset(docs).toDF())
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    val counted = m(Engine.mentions(spans, gazetteer))
    val grouped = m(Engine.mentionRows(spans, gazetteer)
      .groupBy("doc_id", "span_idx", "surface", "coarse_type")
      .agg(fcount(flit(1)).as("n_occ")))
    assert(counted == grouped && counted.nonEmpty)
    // and the counted plan is shuffle-free: scan → project/generate only
    val plan = Engine.mentions(spans, gazetteer).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1200))
  }
}
