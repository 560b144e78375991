package graft.connector

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

/** Shared scaffolding for the mini-lakehouse specs: one registered catalog
  * over a temp root per suite, plus the SQL/manifest helpers every suite
  * was re-declaring.
  */
trait LakeSpec extends SparkSpec {

  /** Per-suite catalog name (also the temp-root prefix). */
  protected def catalogName: String

  protected lazy val root: String =
    Files.createTempDirectory(s"graft-$catalogName").toString

  private lazy val init: Unit = {
    spark.conf.set(s"spark.sql.catalog.$catalogName", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalogName.root", root)
  }

  protected def sql(q: String): DataFrame = { init; spark.sql(q) }

  protected def rows(q: String): Seq[Row] = sql(q).collect().toSeq

  /** The manifest log of a table at `relPath` under the catalog root. */
  protected def log(relPath: String): TableLog =
    new TableLog(s"$root/$relPath", spark.sparkContext.hadoopConfiguration)

  protected def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString
}
