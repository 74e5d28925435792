package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries timestamp[ns]; read as int64 nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-join queries saveAsTable; keep their files in tmp
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm codegen/JIT infrastructure so the first timed query isn't
    // charged for JVM startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    // optional subset for local iteration: SPARK_GRAFT_ONLY=q35,q36
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // stable order + cache isolation: operators that persist
    // intermediates (LSH) must not squeeze later queries' memory.
    // clearCache runs OUTSIDE the timed window — a query must not be
    // charged for tearing down its own caches.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failing query must poison the bench output, not shrink it:
        // its time is excluded and the total goes to -1 below
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (name, dt, err)
      }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val ok = results.collect { case (n, dt, None) => (n, dt) }
    val errs = results.collect { case (n, _, Some(m)) => (n, m.take(200)) }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val total = if (errs.nonEmpty) -1.0 else ok.map(_._2).sum
    val errJson = errs.map { case (k, m) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
