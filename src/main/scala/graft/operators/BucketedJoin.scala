package graft.operators

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.DataFrame

/** Bucketing for co-located joins (SURVEY.md "Optimize for scale"):
  * both sides written `bucketBy` the join key join WITHOUT a shuffle
  * exchange on either side. This is the 100 TB pattern for repeated
  * fact-fact joins — pay the partitioning once at write time, reuse
  * it on every subsequent query against the bucketed tables
  * (BucketedJoinSpec asserts the Exchange-free physical plan).
  */
object BucketedJoin {

  /** Write both inputs as bucketed+sorted tables, then join the
    * bucketed tables on the key. The writes are eager (saveAsTable);
    * the returned join is lazy and shuffle-free. Existing tables of
    * the same names are overwritten, so the call is idempotent.
    *
    * Contract: table names are caller-supplied, and the write is
    * single-writer per name — two concurrent callers passing the same
    * `leftTable`/`rightTable` clobber each other mid-query, so give
    * each invocation its own namespace (e.g. suffix a job id).
    * Callers must also point `spark.sql.warehouse.dir` somewhere
    * deliberate (Bench/Verify use a temp warehouse); the default
    * litters `./spark-warehouse`. */
  def coLocatedJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String, buckets: Int,
                    leftTable: String, rightTable: String): DataFrame = {
    val spark = left.sparkSession
    left.write.bucketBy(buckets, leftKey).sortBy(leftKey)
      .mode("overwrite").saveAsTable(leftTable)
    right.write.bucketBy(buckets, rightKey).sortBy(rightKey)
      .mode("overwrite").saveAsTable(rightTable)
    // keys qualified per side: leftKey and rightKey may share a name
    // (fact-fact joins on a common key — the advertised use case)
    val lt = spark.table(leftTable)
    val rt = spark.table(rightTable)
    lt.join(rt, lt(leftKey) === rt(rightKey))
  }
}
