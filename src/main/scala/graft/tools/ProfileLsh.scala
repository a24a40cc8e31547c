package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{DedupOps, MultimodalOps}

/** Scratch probe: mm-semantic sign-LSH bucket occupancy and candidate
  * counts across (tables, bits) parameterizations over the real
  * corpus — the data behind the round-11 banding re-parameterization
  * (dev tool, not part of the driver contract). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val feats = MultimodalOps.mediaFeatsFromDocs(
      DedupOps.docsParallel(spark, d)).select("doc_id", "vec").cache()
    val n = feats.count()
    println(s"[lsh] docs=$n")

    for ((tables, bits) <- Seq((8, 12), (8, 16), (16, 16), (24, 16), (12, 20))) {
      val planes = DedupOps.hyperplanes(tables * bits, 64)
        .map(_.map(v => if (v > 0) 1L else -1L))
      val banded = feats.as[(Long, Array[Long])].mapPartitions(_.flatMap {
        case (id, vec) =>
          (0 until tables).map { t =>
            var bv = 0L
            var k = 0
            while (k < bits) {
              val pl = planes(t * bits + k)
              var s = 0L; var j = 0
              while (j < 64) { s += vec(j) * pl(j); j += 1 }
              if (s >= 0L) bv |= 1L << k
              k += 1
            }
            (id, t, bv)
          }
      }).toDF("doc_id", "tbl", "bv")
      val occ = banded.groupBy("tbl", "bv").agg(count(lit(1)).as("m"))
        .agg(sum(col("m")).as("rows"),
          max(col("m")).as("max_bucket"),
          sum(when(col("m") > 1,
              (col("m") * (col("m") - 1) / 2).cast("long"))
            .otherwise(0L)).as("uncapped_pairs"),
          sum(when(col("m") > 1,
              least(col("m"), lit(256L)) * col("m")).otherwise(0L))
            .as("capped_pair_bound"),
          count(lit(1)).as("buckets")).head()
      println(s"[lsh] tables=$tables bits=$bits buckets=${occ.getLong(4)} " +
        s"max_bucket=${occ.getLong(1)} uncapped_pairs=${occ.getLong(2)} " +
        s"capped_bound=${occ.getLong(3)}")
    }
    spark.stop()
  }
}
