package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table ingest — the zero-shuffle co-located join path promised
  * in SCALE.md: write both fact tables bucketed (and sorted) by the join
  * key, and every subsequent equi-join on that key plans as a sort-merge
  * join with NO exchange on either side — at 100 TB that removes the
  * dominant shuffle of fact-fact joins entirely (paid once at ingest,
  * amortized over every downstream query). Verified by `BucketingSpec`,
  * which asserts the joined physical plan contains zero
  * ShuffleExchange nodes. */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. `buckets`
    * should match across tables that will be joined (co-partitioning). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
