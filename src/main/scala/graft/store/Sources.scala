package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 (SURVEY §2.1) — raw-source scans.
  *
  * The reference ingests each city portal CSV with every column typed as a
  * string ("all variables initially typed as strings",
  * `Baltimore-notebook.ipynb:266-274`): no inference, so nothing is lost or
  * coerced before harmonization imposes types deliberately. At 100 TB this
  * is also the scan you want — schema inference is an extra full pass over
  * the data; a fixed all-strings schema reads once.
  */
object Sources {

  /** Headered CSV scan with no schema inference — every column a string. */
  def csvAllStrings(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)

  /** S2 — raw-source ingest: stream an HTTP(S)/file URL into the store's
    * raw zone (reference: `copy_from_website_to_s3` — `curl` piped to
    * `aws s3 cp` as a notebook subprocess, `Baltimore-notebook.ipynb`
    * cell 9). Here it writes through the same Hadoop `FileSystem`
    * abstraction as every sink, so the raw zone lands wherever the
    * warehouse points (`file://`, `hdfs://`, `s3a://` — configuration,
    * not code), and the landing is staged-then-renamed so a half-fetched
    * file never looks ingested.
    *
    * Driver-side by design, like the reference: ingest is ONE raw object
    * per source URL (a city portal CSV), I/O-bound and rare — not a
    * distributed operator. A source LIST parallelizes by calling this from
    * whatever orchestrates the list; the engine's distribution starts at
    * the [[csvAllStrings]] scan of what landed.
    *
    * @return bytes copied
    */
  def fetchToRaw(
      spark: SparkSession,
      url: String,
      targetPath: String,
      connectTimeoutMs: Int = 30000,
      readTimeoutMs: Int = 300000): Long = {
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    // Only a full 200 body may land: HttpURLConnection does NOT follow
    // cross-protocol redirects (the common http→https portal case) and
    // hands back the 301/302 stub as a readable body — without this check
    // that stub (or a 204/206 partial) would be promoted as if ingested.
    conn match {
      case http: java.net.HttpURLConnection =>
        val code = http.getResponseCode
        if (code != 200)
          throw new java.io.IOException(s"ingest: $url answered HTTP $code (expected 200)")
      case _ => () // file:// and friends: no status to check
    }
    val fs = FsOps.fileSystem(spark, targetPath)
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val staged = new org.apache.hadoop.fs.Path(targetPath + "._ingesting")
    val in = conn.getInputStream
    var copied = 0L
    try {
      val out = fs.create(staged, true)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          copied += n
          n = in.read(buf)
        }
      } finally out.close()
    } finally in.close()
    FsOps.promote(fs, staged, target)
    copied
  }
}
