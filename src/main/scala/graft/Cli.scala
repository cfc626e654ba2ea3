package graft

import org.apache.spark.sql.SparkSession

import graft.core.{GraftService, Json}

/** Command-line transport over [[graft.core.GraftService]] — the user
  * surface replacing the reference's REST endpoints one command per
  * endpoint (reference api/ModelAPI.scala:153-193, api/DatasetAPI):
  *
  * {{{
  * graft.Cli <root> dataset add <name> <dir> <table:col,col|table:col>
  * graft.Cli <root> dataset list
  * graft.Cli <root> dataset get <id>
  * graft.Cli <root> dataset delete <id>
  * graft.Cli <root> model add <description>
  * graft.Cli <root> model list
  * graft.Cli <root> model state <id>
  * graft.Cli <root> model train <modelId> <datasetId>
  * graft.Cli <root> model predict <modelId> <datasetId>
  * graft.Cli <root> model delete <id>
  * }}}
  *
  * Output is one JSON object per line (machine-consumable, like the
  * reference's JSON responses). */
object Cli {

  private def spark(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def parseTables(s: String): Seq[(String, Seq[String])] =
    s.split("\\|").toSeq.filter(_.nonEmpty).map { part =>
      part.split(":", 2) match {
        case Array(t, cs) => t -> cs.split(",").toSeq.filter(_.nonEmpty)
        case _ =>
          System.err.println(
            s"malformed table spec '$part' (expected table:col,col|table:col)")
          sys.exit(2)
      }
    }

  def main(args: Array[String]): Unit = args.toList match {
    case root :: rest =>
      val svc = new GraftService(root)
      rest match {
        case "dataset" :: "add" :: name :: dir :: tables :: Nil =>
          val ref = svc.createDataset(name, dir, parseTables(tables))
          println(s"""{"id":${ref.id},"name":${Json.str(ref.name)}}""")
        case "dataset" :: "list" :: Nil =>
          svc.datasetKeys.flatMap(svc.getDataset).foreach(d =>
            println(s"""{"id":${d.id},"name":${Json.str(d.name)},"dir":${Json.str(d.dir)}}"""))
        case "dataset" :: "get" :: id :: Nil =>
          svc.getDataset(id.toInt) match {
            case Some(d) => println(
              s"""{"id":${d.id},"name":${Json.str(d.name)},"dir":${Json.str(d.dir)},"tables":${Json.str(d.tables.map { case (t, cs) => s"$t:${cs.mkString(",")}" }.mkString("|"))}}""")
            case None => println(s"""{"error":${Json.str(s"dataset $id not found")}}""")
          }
        case "dataset" :: "delete" :: id :: Nil =>
          println(s"""{"deleted":${svc.deleteDataset(id.toInt)}}""")
        case "model" :: "add" :: description :: Nil =>
          val ref = svc.createModel(description)
          println(s"""{"id":${ref.id},"state":"${ref.state}"}""")
        case "model" :: "list" :: Nil =>
          svc.modelKeys.flatMap(svc.getModel).foreach(m =>
            println(s"""{"id":${m.id},"state":"${m.state}"}"""))
        case "model" :: "state" :: id :: Nil =>
          svc.getModel(id.toInt) match {
            case Some(m) => println(s"""{"id":${m.id},"state":"${m.state}"}""")
            case None => println(s"""{"error":"model $id not found"}""")
          }
        case "model" :: "train" :: modelId :: datasetId :: Nil =>
          val s = spark()
          try println(s"""{"state":"${
            svc.trainModel(s, modelId.toInt, datasetId.toInt)}"}""")
          finally s.stop()
        case "model" :: "predict" :: modelId :: datasetId :: Nil =>
          val s = spark()
          try {
            val pred = svc.predictModel(s, modelId.toInt, datasetId.toInt)
            pred.columnPredictions
              .select("col_name", "predicted_label", "confidence")
              .orderBy("col_name").collect().foreach(r => println(
                s"""{"col":${Json.str(r.getString(0))},"label":${Json.str(r.getString(1))},"confidence":${r.getDouble(2)}}"""))
            pred.suggestions.zipWithIndex.foreach { case (sug, i) =>
              val triples = sug.model.triples.toSeq.sorted.map { case (a, p, b) =>
                s"""[${Json.str(a)},${Json.str(p)},${Json.str(b)}]""" }.mkString(",")
              println(s"""{"suggestion":${i + 1},"linkCost":${sug.scores.linkCost},"triples":[$triples]}""")
            }
          } finally s.stop()
        case "model" :: "delete" :: id :: Nil =>
          println(s"""{"deleted":${svc.deleteModel(id.toInt)}}""")
        case _ =>
          System.err.println("unknown command; see Cli scaladoc")
          sys.exit(2)
      }
    case _ =>
      System.err.println("usage: graft.Cli <root> <entity> <verb> [args...]")
      sys.exit(2)
  }
}
