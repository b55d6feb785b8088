package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The staged-write-then-promote idiom shared by every sink that lands a
  * single object (raw ingest, report publishing, increment compaction):
  * write to `<target>.<suffix>`, then atomically-ish swap it in, checking
  * EVERY rename — an unchecked `FileSystem.rename` returns false instead
  * of throwing, and on HDFS a rename onto an existing directory nests the
  * source inside it, silently corrupting the target.
  */
private[graft] object FsOps {

  def fileSystem(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Replace `target` with `staged`, failing loudly if any step refuses.
    * On failure the staged copy is left in place for triage; the target is
    * only deleted once the staged object exists.
    */
  def promote(fs: FileSystem, staged: Path, target: Path): Unit = {
    if (!fs.exists(staged))
      throw new java.io.IOException(s"promote: staged object $staged does not exist")
    if (fs.exists(target) && !fs.delete(target, true))
      throw new java.io.IOException(s"promote: could not clear $target")
    if (!fs.rename(staged, target))
      throw new java.io.IOException(s"promote: could not rename $staged to $target")
  }
}
