package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash signatures, LSH
  * banding, exact Jaccard verification, and SimHash — the standard
  * shingle→minhash→band→bucket-join pipeline (Broder '97 / MMDS ch.3).
  *
  * Scale design: the only shuffle is the band-bucket self-join, whose
  * fan-out is bounded by bucket size (near-duplicate clusters), never
  * O(n²) over the corpus. Hash functions are md5-based so signatures are
  * engine-portable and deterministic: min over the lexicographic order
  * of fixed-width hex strings equals min over the hash integers.
  */
object Dedup {

  /** MinHash signature of a shingle array: for each seed, the minimum
    * md5 over seed-prefixed shingles, as a 32-hex-char string.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingles, x => md5(concat(lit(seed.toString), lit("_"), x))))
    }: _*)

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`
    * adjacent minhashes, each group md5-compressed to one bucket key.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r => element_at(signature, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** Candidate near-duplicate pairs (idA < idB) of `df` by MinHash-LSH
    * over character n-grams of normalized `textCol`. Documents shorter
    * than the shingle width have no signature and never pair.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 3, numHashes: Int = 16, bands: Int = 2): DataFrame = {
    val rows = numHashes / bands
    val sh = TextFunctions.distinctCharNgrams(
      TextFunctions.normalize(col(textCol)), shingle)
    val flat = df
      .select(col(idCol).as("__id"), sh.as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .select(col("__id"),
        posexplode(lshBandKeys(col("__sig"), bands, rows)).as(Seq("__b", "__key")))
    flat.as("a").join(flat.as("b"),
        col("a.__b") === col("b.__b") && col("a.__key") === col("b.__key") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.
    * The candidate join keeps the exact verification off the O(n²) path.
    */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingle: Int = 3, numHashes: Int = 16,
      bands: Int = 2): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      TextFunctions.distinctCharNgrams(
        TextFunctions.normalize(col(textCol)), shingle).as("__sh"))
    minhashCandidatePairs(df, idCol, textCol, shingle, numHashes, bands)
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sha"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__shb"), "id_b")
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 16-bit SimHash over whitespace tokens: per token take the first 4
    * hex chars of md5 as a 16-bit value; each bit votes ±1; the sketch
    * sets bits with positive vote sums. Small enough to verify in SQL,
    * same construction as the 64-bit production variant.
    */
  def simhash16(textCol: Column): Column = {
    val vals = transform(TextFunctions.tokens(textCol),
      t => conv(substring(md5(t), 1, 4), 16, 10).cast("int"))
    // bit j of v via exact double arithmetic (v < 2^16, j <= 15) — the
    // identical floor/pow form the oracle SQL uses
    def bit(v: Column, j: Column): Column =
      floor(v / pow(lit(2.0), j)).cast("int") % 2
    val bits = transform(sequence(lit(0), lit(15)), j =>
      when(lit(2) * size(filter(vals, v => bit(v, j) === 1)) > size(vals), 1)
        .otherwise(0))
    aggregate(
      sequence(lit(0), lit(15)), lit(0),
      (acc, j) => acc + element_at(bits, j + 1) * pow(lit(2.0), j).cast("int"))
  }
}
