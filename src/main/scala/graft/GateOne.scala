package graft
import org.apache.spark.sql.SparkSession
object GateOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.get("SPARK_GRAFT_GATEONE_OUT")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      outDir match {
        case Some(d) =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$d/$name")
          println(s"$name -> written")
        case None => println(s"$name -> ${df.count()} rows")
      }
    }
    outDir.foreach { d =>
      def q(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
      val json = args.toSeq.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$d/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
