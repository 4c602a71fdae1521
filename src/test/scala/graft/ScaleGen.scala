package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: synthesize a larger scale factor from sf0.1 for the
  * scale-GROWTH spot bench (BENCH_NOTES) — NOT for correctness gates
  * (those run only on the driver-provided testdata).
  *
  * Replicas are CONTENT-DISJOINT so per-replica operator structure
  * matches the original and growth should be ~linear:
  *  - orders: keys shifted by a replica span;
  *  - documents: ids shifted, every token prefixed with a replica tag
  *    (shingle/token sets disjoint across replicas — no artificial
  *    cross-replica near-duplicates);
  *  - embeddings: ids shifted, per-replica pseudo-random sign flips
  *    per dimension (cross-replica cosines ~0).
  *
  * sbt 'Test/runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/sf1 10'
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val f = factorS.toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(table: String)(mk: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$srcDir/$table.parquet")
      (0 until f).map(i => mk(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      println(s"[scalegen] $table x$f written")
    }

    rep("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
    }
    // lineitem shifts by the SAME span, so every orders replica keeps
    // its matching lineitems — order-lineitem joins stay 10× dense,
    // not replica-0-only
    rep("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
    }
    // events: disjoint ids AND users per replica (the stream gates
    // key/window on user_id — shifted users keep per-user history
    // shapes identical to the original, just 10× many)
    rep("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }
    // dimensions pass through unscaled (replica orders reuse the same
    // custkeys — 10× orders per customer, the realistic growth shape)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scalegen] $t copied")
    }
    rep("documents") { (df, i) =>
      if (i == 0) df
      else df
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"r$i$$1"))
    }
    rep("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> x * cast(1 - 2 * pmod(xxhash64(cast(j * $i as string)), 2) as float))"))
    }
    spark.stop()
  }
}
