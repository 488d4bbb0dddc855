package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-7 optimization harness (guide §1): per-query noop-sink isolation
  * timing and formatted-plan capture for every declared SparkEntry query.
  * Separate from the FROZEN `graft.Bench` driver contract — numbers from
  * here are cited in OPTIMIZATION_r07.md, never in BENCH JSON.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra time <reps> [query...]"
  *   sbt "runMain graft.BenchExtra explain <outDir> <suffix> [query...]"
  *
  * `time` warms each query once at sf0.001 (codegen/JIT), then times
  * `reps` noop-sink runs at $SPARK_GRAFT_SF_DIR, printing one JSON line
  * with all samples and the min (the sandbox steal filter, same
  * methodology as Bench). `explain` writes
  * <outDir>/<query>_<suffix>.txt with the formatted physical plan.
  */
object BenchExtra {

  private def buildSession(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "time"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = buildSession(cpus)

    mode match {
      case "time" =>
        val reps = if (args.length > 1) args(1).toInt else 3
        val names =
          if (args.length > 2) args.drop(2).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        val out = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
        names.foreach { name =>
          SparkEntry.queries.get(name).foreach { fn =>
            spark.sparkContext.setJobDescription(s"warm $name")
            try fn(spark, "/root/testdata/sf0.001")
              .write.format("noop").mode("overwrite").save()
            catch { case t: Throwable =>
              System.err.println(s"[extra] warm $name failed: ${t.getMessage}")
            }
            val samples = (1 to reps).map { r =>
              spark.sparkContext.setJobDescription(s"$name rep $r")
              val t0 = System.nanoTime()
              try fn(spark, sfDir)
                .write.format("noop").mode("overwrite").save()
              catch { case t: Throwable =>
                System.err.println(s"[extra] $name failed: ${t.getMessage}")
              }
              (System.nanoTime() - t0) / 1e9
            }
            out(name) = samples
            System.err.println(f"[extra] $name min=${samples.min}%.3f " +
              s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
          }
        }
        val js = out.map { case (k, v) =>
          f""""$k":{"min":${v.min}%.3f,"samples":[${v.map(s => f"$s%.3f").mkString(",")}]}"""
        }.mkString("{", ",", "}")
        println(s"""{"benchextra":"time","sf":"$sfDir","queries":$js}""")

      case "explain" =>
        val outDir = args(1)
        val suffix = args(2)
        val names =
          if (args.length > 3) args.drop(3).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        new java.io.File(outDir).mkdirs()
        names.foreach { name =>
          SparkEntry.queries.get(name).foreach { fn =>
            try {
              val df = fn(spark, sfDir)
              val plan = df.queryExecution
                .explainString(ExplainMode.fromString("formatted"))
              val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
              try w.println(plan) finally w.close()
              System.err.println(s"[extra] wrote $outDir/${name}_$suffix.txt")
            } catch { case t: Throwable =>
              System.err.println(s"[extra] explain $name failed: " +
                s"${t.getMessage}")
            }
          }
        }
        println(s"""{"benchextra":"explain","dir":"$outDir"}""")
    }
    spark.stop()
  }
}
