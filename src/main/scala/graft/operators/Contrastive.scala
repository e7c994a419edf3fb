package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-triplet generation: turn near-duplicate PAIRS into
  * (anchor, positive, negative) triplets for embedding/contrastive-loss
  * training (the sampling shape behind SimCLR/InfoNCE-style objectives —
  * positives come from a similarity oracle, negatives from the corpus at
  * large).
  *
  * Negative selection is deterministic with no stored randomness: a
  * NEGATIVE POOL of `poolSize` corpus ids (smallest portable hash — the
  * same reproducible-subset rule as the IVF codebook) is collected
  * driver-side and re-enters the plan as a literal relation; each
  * (anchor, positive) row picks the pool member with the smallest portable
  * hash of the triplet key, after excluding the anchor itself and every
  * known positive partner of the anchor. Per-row cost is `poolSize`
  * candidate rows against a broadcast literal — linear in pairs, constant
  * in corpus size; the partner-exclusion is one anti-join on
  * (anchor, candidate).
  *
  * The pool-based negative is "easy" by construction (a random-ish corpus
  * vector). Hard-negative mining — nearest non-positive — is the ANN
  * operators' job: feed [[Similarity.lshTopK]] output minus the positive
  * pairs in as `pairs` with roles swapped. */
object Contrastive {

  /** `pairs` (id_a, id_b) symmetric near-dup evidence → one triplet per
    * directed pair. Output: (anchor_id, pos_id, neg_id). Directed pairs
    * whose every pool candidate is excluded (anchor in a family covering
    * the whole pool) emit nothing — at a sane poolSize that means the
    * corpus is degenerate. */
  def triplets(pairs: DataFrame, corpus: DataFrame, idCol: String, poolSize: Int): DataFrame = {
    require(poolSize >= 2, s"poolSize must be >= 2, got $poolSize")
    val spark = corpus.sparkSession
    import spark.implicits._
    // materialize ONCE: the pairs subtree feeds both union branches AND the
    // partner-exclusion anti-join — left lazy, an expensive candidate
    // generator (the LSH stack) would be planned and executed three times
    // (measured 2× the operator's cost; same reasoning as Components' edges)
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val anchors = p.select(col("id_a").as("anchor_id"), col("id_b").as("pos_id"))
      .union(p.select(col("id_b").as("anchor_id"), col("id_a").as("pos_id")))
    // driver-collected literal pool (poolSize rows) — like the IVF codebook,
    // a subplan here would re-execute the scan+sort+limit per reference and
    // its broadcast would not satisfy the bounded-BNLJ plan lint. The pool
    // keeps the id column's NATIVE type: a cast to long would silently
    // null out (corrupt) non-numeric string ids.
    val idField = corpus.schema(idCol)
    val poolRows = corpus
      .withColumn("__h", PortableHash.hash60(col(idCol)))
      .orderBy("__h").limit(poolSize)
      .select(col(idCol).as("neg_id"))
      .collect().toSeq
    val pool = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(poolRows).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("neg_id", idField.dataType, idField.nullable))))
    val cand = anchors.join(broadcast(pool), col("neg_id") =!= col("anchor_id"))
      .join(anchors.select(col("anchor_id"), col("pos_id").as("neg_id")),
        Seq("anchor_id", "neg_id"), "left_anti")
    val byKey = Window.partitionBy(col("anchor_id"), col("pos_id"))
      .orderBy(col("__nh").asc, col("neg_id").asc)
    cand
      .withColumn("__nh", PortableHash.hash60(
        concat_ws(":", col("anchor_id"), col("pos_id"), col("neg_id"))))
      .withColumn("__rn", row_number().over(byKey))
      .filter(col("__rn") === 1)
      .select(col("anchor_id"), col("pos_id"), col("neg_id"))
  }
}
