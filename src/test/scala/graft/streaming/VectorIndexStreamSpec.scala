package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.functions.VectorIndex

/** Streaming maintenance face of the persisted IVF index — the
  * TextIndexStreamSpec twin for vectors: an embedding stream drives
  * build-then-append through foreachBatch, and the stream-final index
  * must serve BIT-identically to a one-shot batch build over the same
  * corpus.
  *
  * Centroid policy, pinned here: append REUSES the centroids the
  * initial build trained and never re-trains (VectorIndex.append
  * scaladoc — a stable assignment function is what lets appends
  * commute with serving; re-training is an explicit REBUILD during a
  * maintenance window, exactly like Catalog.compact). The equality
  * below therefore requires the first micro-batch to contain the
  * deterministic trainer's id-ordered sample — the same contract the
  * batch append spec documents — so the streamed index and the
  * one-shot index train IDENTICAL centroids and the frozen-centroid
  * policy is observable as bit-equality rather than mere similarity.
  */
class VectorIndexStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("foreachBatch build+append stream-final IVF index equals a batch build") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val srcDir = tmpDir("vidxsrc")
    // first batch covers the trainer's id-ordered 256-vector sample;
    // later batches only ever ASSIGN against the frozen centroids
    emb.filter($"vec_id" < 300).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes: file listing preserves order
    emb.filter($"vec_id" >= 300 && $"vec_id" < 400).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Thread.sleep(1100)
    emb.filter($"vec_id" >= 400).coalesce(1)
      .write.mode("append").parquet(srcDir)

    val idxDir = tmpDir("vidxstream")
    var built = false
    var centsAfterBuild: Set[(Long, Seq[Float])] = Set.empty
    val q = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!built) {
          VectorIndex.build(batch, "vec_id", "embedding", idxDir,
            numCentroids = 16, metaCols = Nil)
          built = true
          centsAfterBuild = readCents(idxDir)
        } else VectorIndex.append(batch, "vec_id", "embedding", idxDir)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // centroid stability: appends left the trained centroids untouched
    assert(readCents(idxDir) == centsAfterBuild && centsAfterBuild.size == 16)

    val fullDir = tmpDir("vidxbatch")
    VectorIndex.build(emb, "vec_id", "embedding", fullDir, numCentroids = 16)
    // identical training sample => identical centroids
    assert(readCents(idxDir) == readCents(fullDir))
    // and the stream-final top-k serves bit-identically (ranks, ids AND
    // cosines) to the one-shot build
    val queries = emb.filter($"vec_id" < 8)
    def serve(d: String) =
      VectorIndex.topK(spark, d, queries, "vec_id", "embedding", k = 3,
          nprobe = 4)
        .select($"query_id", $"neighbor_id", $"rank", $"cos")
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(serve(idxDir) == serve(fullDir) && serve(idxDir).size == 24)
  }

  private def readCents(dir: String): Set[(Long, Seq[Float])] =
    VectorIndex.centroids(spark, dir)
      .select(col("__cid").cast("long"), col("__cvec"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).toSeq))
      .toSet
}
