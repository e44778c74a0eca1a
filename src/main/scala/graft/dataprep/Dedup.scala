package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines, at four fidelities
  * (task brief: exact, MinHash+LSH, SimHash, n-gram Jaccard). All are
  * shuffle-bounded: exact dedup shuffles one hash per doc; LSH shuffles
  * `bands` small keys per doc; nothing here is O(n²) in the corpus —
  * candidate pairs come from hash buckets / blocking keys, never from a
  * full cross join (the 100 TB constraint).
  *
  * Shingling is rows-based (posexplode + window lead) rather than a
  * nested higher-order array expression: the nested form re-evaluated
  * the tokenizer per element access and fell out of codegen — measured
  * ~40× slower at sf0.1.
  */
object Dedup {

  /** Tokenizer shared with the SQL oracles: lower, split on [^a-z0-9]+,
    * drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Distinct 3-token shingles, one row per (doc_id, shingle). Linear:
    * one generator, one window pass ordered by token position, one
    * dedup shuffle. */
  def shingleRows(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("i")
    documents
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("i", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .where(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
      .dropDuplicates("doc_id", "shingle")
  }

  /** Per-doc shingle sets (for exact Jaccard). */
  def shingleSets(documents: DataFrame): DataFrame =
    shingleRows(documents)
      .groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("sh"), count(lit(1)).as("n_shingles"))

  /** Exact dedup: content-hash groupBy, keep the min doc_id per group.
    * One map-side-combined hash aggregate over (hash → min,count). */
  def exact(documents: DataFrame): DataFrame =
    documents
      .withColumn("fp", md5(col("text").cast("binary")))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val NumPerms = 32
  val Bands = 8
  val RowsPerBand: Int = NumPerms / Bands

  /** MinHash signatures: xxhash64 per distinct shingle, then `NumPerms`
    * seeded re-hashes (`xxhash64(h, i)` — overflow-free under ANSI mode)
    * folded with `min` in one aggregate — the per-doc state is 32 longs
    * regardless of document size. */
  def minhashSignature(documents: DataFrame): DataFrame = {
    val sh = shingleRows(documents).withColumn("h", xxhash64(col("shingle")))
    val mins = (0 until NumPerms).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until NumPerms).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding rows: (doc_id, band_idx, band_hash). Near-dup docs
    * collide in ≥1 band with high probability; the band join is an
    * equi-join on (band_idx, band_hash) — shuffle-friendly, skew-free
    * for non-degenerate corpora. */
  def minhashBands(sig: DataFrame): DataFrame = {
    val bandRows = (0 until Bands).map { b =>
      val cols = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => element_at(col("sig"), i + 1))
      struct(lit(b).as("band_idx"), xxhash64(cols: _*).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandRows: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"), col("b.band_hash").as("band_hash"))
  }

  /** MinHash-LSH candidate pairs with estimated similarity = fraction of
    * equal signature components. */
  def minhashPairs(documents: DataFrame, minEst: Double = 0.5): DataFrame = {
    // Materialize signatures once: the plan below references them four
    // times (both self-join sides, both pair sides); without this the
    // 32-aggregate subtree is recomputed per reference.
    val sig = minhashSignature(documents).localCheckpoint(true)
    val bands = minhashBands(sig)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_sim",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), e => e))
          .cast("double") / lit(NumPerms.toDouble))
      .where(col("est_sim") >= minEst)
      .select("doc_a", "doc_b", "est_sim")
  }

  /** 64-bit SimHash: per-token xxhash64; each bit position accumulates
    * +1/−1 across tokens (with multiplicity); sign vector → fingerprint.
    * Expressed as 64 conditional sums in ONE hash aggregate — stays in
    * whole-stage codegen, no UDF. */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i"))
    val assembled = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit chunks (two docs within
    * Hamming distance 3 of each other agree on ≥1 of 4 chunks), verify
    * with `bit_count(xor) <= maxHamming`. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(documents).localCheckpoint(true)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk").as("chunk"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard over blocking buckets (first two tokens): the
    * block join bounds candidate pairs; intersection/union are integer
    * set sizes so the similarity is bit-exact vs the oracle. */
  def ngramJaccardPairs(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val keyed = documents
      .where(size(toks) >= 3)
      .select(col("doc_id"),
        concat_ws(" ", element_at(toks, 1), element_at(toks, 2)).as("bucket"))
      .join(shingleSets(documents), "doc_id")
      .localCheckpoint(true) // referenced twice by the self-join below
    keyed.as("a").join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("jaccard"))
  }

  /** Embedding near-dup pairs, blocked per label class (the blocking key
    * is a stand-in for an IVF/clustering assignment at scale). Norms are
    * materialized once per vector; each pair costs one primitive-loop
    * dot product (graft.functions.VecDot). */
  def embeddingPairs(embeddings: DataFrame): DataFrame = {
    val e = embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", VectorOps.norm(col("embedding")))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(VectorOps.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 4).as("cos_sim"))
      .where(col("cos_sim") >= 0.2)
  }
}
