package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone-map (min-max) data skipping — the lakehouse file-skip primitive
  * (Iceberg manifest column bounds, parquet row-group statistics) made
  * explicit as a queryable table. Rows are clustered into zones by a
  * clustering key; each zone records min/max bounds for the clustering
  * column AND for an un-clustered probe column; a range predicate is
  * then answered bounds-first: zones whose [min,max] interval misses the
  * predicate range are skipped without reading a row.
  *
  * The output carries BOTH verdicts per zone — the same predicate width
  * on the clustered column skips most zones, on the scattered column
  * skips none — which is exactly the evidence a table-layout decision
  * (cluster/z-order before write) is made from at 100 TB. One
  * aggregation over the table, nothing else: at scale this is the
  * manifest-build pass, and the skip decision itself never touches the
  * data.
  */
object ZoneMap {

  /** One row per zone: zone id (fixed value-width bucket of
    * `clusterCol`), row count, both columns' bounds, and 0/1 scan
    * verdicts for the two range predicates `[cLo,cHi]` on `clusterCol`
    * and `[pLo,pHi]` on `probeCol`. Columns are non-negative longs;
    * verdicts are ints for stable oracle hashing. */
  def skippingStats(df: DataFrame, clusterCol: String, width: Long,
                    probeCol: String, cLo: Long, cHi: Long,
                    pLo: Long, pHi: Long): DataFrame =
    df.select(expr(s"$clusterCol div ${width}L").as("zone"),
        col(clusterCol).cast("long").as("c"),
        col(probeCol).cast("long").as("p"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("c")).as("c_min"), max(col("c")).as("c_max"),
        min(col("p")).as("p_min"), max(col("p")).as("p_max"))
      .select(col("zone"), col("n_rows"),
        col("c_min"), col("c_max"), col("p_min"), col("p_max"),
        (!(col("c_max") < cLo || col("c_min") > cHi)).cast("int")
          .as("scan_clustered"),
        (!(col("p_max") < pLo || col("p_min") > pHi)).cast("int")
          .as("scan_probe"))
}
