package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization tooling (round 16): dump `.explain("formatted")` for a
  * comma-separated list of ops into a directory — the plan evidence the
  * optimization log cites (`plans/r16/<op>_before.txt` / `_after.txt`).
  *
  *   runMain graft.Plans <outDir> <suffix> <op1,op2,...> [sfDir]
  *
  * Not part of the driver contract; never invoked by Bench/Verify.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("derby.stream.error.file", s"${graft.ops.Scratch.dir}/derby.log")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation", graft.ops.Scratch.ckptDir)
      .enableHiveSupport()
      .config("spark.sql.warehouse.dir", s"${graft.ops.Scratch.dir}/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${graft.ops.Scratch.dir}/metastore_db;create=true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"[plans] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
