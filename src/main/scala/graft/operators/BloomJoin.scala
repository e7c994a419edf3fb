package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned join: shrink the FACT side of a shuffle join before the
  * shuffle, using a fixed-size Bloom sketch of the dimension's join keys.
  *
  * The 100 TB scenario: the dimension is too big (or too late-filtered)
  * to broadcast, so the join must shuffle both sides — and the dominant
  * cost is shuffling fact rows that will never find a partner. Building a
  * Bloom filter over the dim keys and filtering the fact scan with
  * `might_contain` drops those rows at the scan, so the exchange carries
  * only (selectivity + ε) of the fact table. False positives are harmless:
  * the real join still runs and removes them, so results are EXACTLY those
  * of the plain join (the registered query's DuckDB oracle is the plain
  * join). Semantically sound only for inner/semi joins — pruned fact rows
  * are exactly those an inner join would drop anyway.
  *
  * This is the same design as Spark's AQE runtime bloom filter
  * (InjectRuntimeFilter) but caller-directed: AQE only injects when the
  * creation side has a selective filter it can see through; this operator
  * lets the pipeline author assert it. Uses Spark's own codegen'd Catalyst
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * internal pair InjectRuntimeFilter plants) via the graftbridge, so the
  * pruning filter stays inside whole-stage codegen. The driver holds only
  * the fixed-size sketch (like the IVF codebook — KBs to low MBs,
  * independent of data scale), never row data.
  */
object BloomJoin {

  /** Aggregate `dim`'s join key into a Bloom sketch (driver-held bytes).
    * Returns null iff `dim` has no rows with a non-null key. */
  def keyBloom(dim: DataFrame, dimKey: String, expectedItems: Long): Array[Byte] =
    dim.select(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(col(dimKey))), expectedItems)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Inner/semi join with the fact side Bloom-pruned before the shuffle.
    * `expectedItems` sizes the sketch — set it near the dim's post-filter
    * key cardinality (over-sizing costs memory, under-sizing costs FP rate,
    * never correctness). */
  def pruneJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, joinType: String = "inner",
      expectedItems: Long = 4L << 20): DataFrame = {
    require(Seq("inner", "semi", "left_semi", "leftsemi").contains(joinType),
      s"bloom pruning is sound only for inner/semi joins, got $joinType")
    val bloom = keyBloom(dim, dimKey, expectedItems)
    val pruned =
      if (bloom == null) fact.limit(0) // empty dim: inner join is empty
      else fact.filter(ColumnBridge.column(BloomFilterMightContain(
        Literal.create(bloom, BinaryType),
        ColumnBridge.expression(xxhash64(col(factKey))))))
    // dataframe-qualified refs: bare col() is ambiguous when the fact and
    // dim key columns share a name (AnalysisException on a documented use)
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }
}
